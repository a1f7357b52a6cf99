"""Robustness of the hand-rolled native PNG decoder under corrupt input.

The C++ decoder (native/kfnet_native.cpp) parses untrusted on-disk bytes
with hand-written inflate-framing and unfilter loops; its contract is
"nonzero return on any malformed file, no crash, no out-of-buffer write".
Two layers of enforcement:

  * In-process: crafted corruptions through the real ctypes surface must
    raise ValueError (a decoder crash here would kill the pytest process
    — that IS the failure signal).
  * Sanitized fuzz: `make -C native fuzz_png` builds the decoder with
    ASan+UBSan and replays thousands of deterministic mutations
    (truncation, byte flips, IHDR dimension patches including the
    pre-hardening size_t-wrap range); any OOB access aborts.
"""

import os
import struct
import subprocess

import numpy as np
import pytest

from kfnet_tpu.data import native_io

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native library not built")

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")


def _seed_pngs(tmp_path):
  from PIL import Image
  rng = np.random.default_rng(0)
  color = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
  cpath = str(tmp_path / "c.png")
  Image.fromarray(color).save(cpath)
  depth = rng.integers(300, 5000, (48, 64)).astype(np.uint16)
  dpath = str(tmp_path / "d.png")
  Image.fromarray(depth).save(dpath)
  return cpath, dpath


def _patch_dims(path, out_path, width, height):
  data = bytearray(open(path, "rb").read())
  data[16:20] = struct.pack(">I", width)
  data[20:24] = struct.pack(">I", height)
  with open(out_path, "wb") as f:
    f.write(bytes(data))


def test_truncated_file_raises_or_decodes_identically(tmp_path):
  """Any truncation must either raise cleanly or (when only trailing
  non-IDAT framing was lost, e.g. the IEND chunk) decode to exactly the
  intact file's pixels — never crash, never return garbage."""
  cpath, dpath = _seed_pngs(tmp_path)
  for src, reader in ((cpath, native_io.read_color),
                      (dpath, native_io.read_depth_raw)):
    data = open(src, "rb").read()
    full = reader(src)
    for cut in (0, 7, 16, 33, len(data) // 2, len(data) - 1):
      p = tmp_path / "t.png"
      p.write_bytes(data[:cut])
      try:
        out = reader(str(p))
      except Exception:
        continue  # clean rejection (ValueError from rc / PIL error)
      np.testing.assert_array_equal(out, full)


def test_huge_dims_header_rejected_not_crash(tmp_path):
  """Pre-hardening, 2^31..2^32-1 dims wrapped (row_bytes+1)*height and
  drove unfilter() out of bounds; now kfn_png_info must reject them."""
  cpath, _ = _seed_pngs(tmp_path)
  for w, h in ((0xFFFFFFFF, 0xFFFFFFFF), (0x80000000, 2), (2, 0x80000000),
               (16385, 48), (64, 16385), (0, 48), (64, 0)):
    bad = tmp_path / "huge.png"
    _patch_dims(cpath, str(bad), w, h)
    with pytest.raises(Exception):
      native_io.read_color(str(bad))


def test_corrupt_idat_raises_not_crash(tmp_path):
  cpath, dpath = _seed_pngs(tmp_path)
  rng = np.random.default_rng(7)
  for src, reader in ((cpath, native_io.read_color),
                      (dpath, native_io.read_depth_raw)):
    data = bytearray(open(src, "rb").read())
    ok = 0
    for trial in range(200):
      mut = bytearray(data)
      for _ in range(int(rng.integers(1, 9))):
        # flip bytes past the (already-covered) header region
        i = int(rng.integers(33, len(mut)))
        mut[i] ^= int(rng.integers(1, 256))
      p = tmp_path / "m.png"
      p.write_bytes(bytes(mut))
      try:
        reader(str(p))
        ok += 1  # flips in non-load-bearing bytes may still decode
      except Exception:
        pass
    # sanity: the loop genuinely exercised failing decodes
    assert ok < 200


def test_load_batch_reports_corrupt_file_and_kind(tmp_path):
  """kfn_load_batch's packed error code must name the failing frame AND
  whether it was the color or the depth file, for corrupt (not just
  missing) inputs."""
  import struct

  from kfnet_tpu.core import geometry as geo
  cpath, dpath = _seed_pngs(tmp_path)
  K = np.asarray(geo.make_intrinsics(*geo.SEVEN_SCENES_K))
  poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
  kw = dict(K=K, width=64, height=48, stride=8)

  bad_depth = tmp_path / "bad_d.png"
  bad_depth.write_bytes(open(dpath, "rb").read()[:40])  # truncated IDAT
  with pytest.raises(ValueError, match=r"frame 1.*depth.*bad_d"):
    native_io.load_batch([cpath, cpath], [dpath, str(bad_depth)], poses,
                         **kw)

  bad_color = tmp_path / "bad_c.png"
  _patch_dims(cpath, str(bad_color), 0xFFFFFFFF, 48)  # hostile header
  with pytest.raises(ValueError, match=r"frame 0.*color.*bad_c"):
    native_io.load_batch([str(bad_color), cpath], [dpath, dpath], poses,
                         **kw)


@pytest.mark.skipif(os.system("which g++ > /dev/null 2>&1") != 0,
                    reason="no C++ toolchain")
def test_asan_mutation_fuzz(tmp_path):
  build = subprocess.run(["make", "-C", NATIVE_DIR, "-s", "fuzz_png"],
                         capture_output=True, text=True, timeout=180)
  assert build.returncode == 0, build.stderr
  cpath, dpath = _seed_pngs(tmp_path)
  # 1500 iters ≈ 20 s standalone; the generous timeout absorbs ASan's
  # syscall-heavy profile on this one-core host under full-suite load
  # (4000 iters at timeout=300 flaked there). Deeper runs are one
  # command away: native/fuzz_png <iters> <seeds...>.
  run = subprocess.run(
      [os.path.join(NATIVE_DIR, "fuzz_png"), "1500", cpath, dpath],
      capture_output=True, text=True, timeout=900)
  assert run.returncode == 0, (run.stdout, run.stderr)
  assert "ok 1500 iterations" in run.stdout
