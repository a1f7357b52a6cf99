// Deterministic mutation fuzzer for the hand-rolled PNG decode path
// (kfnet_native.cpp). Built with ASan+UBSan (`make -C native fuzz_png`)
// and driven by tests/test_native_fuzz.py: any out-of-bounds access,
// overflow, or leak in the decoder aborts the process, which fails the
// test. The decoder's contract under corruption is "nonzero return, no
// crash, writes confined to the caller buffer sized from kfn_png_info".
//
// Usage: fuzz_png <iters> <seed.png> [<seed.png> ...]
//
// Mutations per iteration (xorshift PRNG, seeded by the iteration index
// so every run is reproducible): random truncation, 1..8 random byte
// flips, or an IHDR dimension patch (including the 2^31..2^32-1 values
// that used to wrap the pre-cap size arithmetic).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
int kfn_png_info(const uint8_t*, size_t, int*, int*, int*, int*);
int kfn_png_decode(const uint8_t*, size_t, void*);
int kfn_png_decode_rgb_f32(const uint8_t*, size_t, float*);
int kfn_depth_to_labels(const uint8_t*, size_t, const float*, const float*,
                        int, float, float, float, uint16_t, float*, uint8_t*,
                        int*, int*);
}

namespace {

uint64_t state;
uint64_t rnd() {  // xorshift64*
  state ^= state >> 12;
  state ^= state << 25;
  state ^= state >> 27;
  return state * 0x2545F4914F6CDD1DULL;
}

void be32_store(uint8_t* p, uint32_t v) {
  p[0] = uint8_t(v >> 24);
  p[1] = uint8_t(v >> 16);
  p[2] = uint8_t(v >> 8);
  p[3] = uint8_t(v);
}

bool read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  if (n <= 0) {
    std::fclose(f);
    return false;
  }
  std::fseek(f, 0, SEEK_SET);
  out.resize(size_t(n));
  size_t got = std::fread(out.data(), 1, out.size(), f);
  std::fclose(f);
  return got == out.size();
}

void exercise(const std::vector<uint8_t>& data) {
  int w = 0, h = 0, ch = 0, bits = 0;
  if (kfn_png_info(data.data(), data.size(), &w, &h, &ch, &bits) != 0) return;
  // The caller contract: buffers sized exactly from kfn_png_info. If the
  // caps let absurd dims through, the allocation below is the canary.
  if (w <= 0 || h <= 0 || w > 16384 || h > 16384) {
    std::fprintf(stderr, "kfn_png_info accepted dims %dx%d\n", w, h);
    std::abort();
  }
  size_t n = size_t(w) * size_t(h) * size_t(ch) * (bits / 8);
  std::vector<uint8_t> out(n);
  (void)kfn_png_decode(data.data(), data.size(), out.data());
  if (bits == 8) {
    std::vector<float> rgb(size_t(w) * h * 3);
    (void)kfn_png_decode_rgb_f32(data.data(), data.size(), rgb.data());
  }
  if (bits == 16 && ch == 1) {
    const int stride = 8;
    int hs = h / stride, ws = w / stride;
    std::vector<float> coords(size_t(hs) * ws * 3);
    std::vector<uint8_t> valid(size_t(hs) * ws);
    float K[9] = {525.f, 0.f, 320.f, 0.f, 525.f, 240.f, 0.f, 0.f, 1.f};
    float T[16] = {1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1};
    int oh = 0, ow = 0;
    int rc = kfn_depth_to_labels(data.data(), data.size(), K, T, stride,
                                 1e-3f, 0.05f, 20.0f, 65535, coords.data(),
                                 valid.data(), &oh, &ow);
    if (rc == 0 && (oh != hs || ow != ws)) {
      std::fprintf(stderr, "label grid %dx%d != info-derived %dx%d\n", oh, ow,
                   hs, ws);
      std::abort();
    }
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <iters> <seed.png> [...]\n", argv[0]);
    return 2;
  }
  long iters = std::atol(argv[1]);
  std::vector<std::vector<uint8_t>> seeds;
  for (int i = 2; i < argc; ++i) {
    std::vector<uint8_t> s;
    if (!read_file(argv[i], s)) {
      std::fprintf(stderr, "cannot read seed %s\n", argv[i]);
      return 2;
    }
    exercise(s);  // pristine seeds must decode without tripping ASan
    seeds.push_back(std::move(s));
  }
  for (long it = 0; it < iters; ++it) {
    state = uint64_t(it) * 0x9E3779B97F4A7C15ULL + 0xD1B54A32D192ED03ULL;
    std::vector<uint8_t> data = seeds[rnd() % seeds.size()];
    switch (rnd() % 3) {
      case 0:  // truncate
        data.resize(rnd() % (data.size() + 1));
        break;
      case 1: {  // 1..8 byte flips
        uint64_t flips = 1 + rnd() % 8;
        for (uint64_t f = 0; f < flips && !data.empty(); ++f)
          data[rnd() % data.size()] ^= uint8_t(1 + rnd() % 255);
        break;
      }
      case 2:  // IHDR dim patch — includes the size_t-wrap range
        if (data.size() >= 33) {
          uint32_t vals[] = {0u, 1u, 479u, 16384u, 16385u, 0x7FFFFFFFu,
                             0x80000000u, 0xFFFFFFFFu,
                             uint32_t(rnd())};
          be32_store(data.data() + 16, vals[rnd() % 9]);
          be32_store(data.data() + 20, vals[rnd() % 9]);
        }
        break;
    }
    exercise(data);
  }
  std::printf("ok %ld iterations over %zu seeds\n", iters, seeds.size());
  return 0;
}
