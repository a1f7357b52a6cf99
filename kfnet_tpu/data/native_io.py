"""ctypes bridge to the native C++ host data path (native/kfnet_native.cpp):
PNG decode + fused depth→label generation. Falls back to the PIL/numpy
path transparently when the shared library hasn't been built
(``make -C native``)."""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
  return os.path.join(
      os.path.dirname(os.path.dirname(os.path.dirname(
          os.path.abspath(__file__)))), "native", "libkfnet_native.so")


def load_library():
  """Returns the ctypes lib or None if unavailable."""
  global _LIB, _TRIED
  if _TRIED:
    return _LIB
  _TRIED = True
  path = _lib_path()
  if not os.path.exists(path):
    # try to build it once (best effort — toolchain present in CI image)
    try:
      import subprocess
      subprocess.run(["make", "-C", os.path.dirname(path), "-s"],
                     check=True, capture_output=True, timeout=120)
    except Exception:
      return None
  if not os.path.exists(path):
    return None
  lib = ctypes.CDLL(path)
  c = ctypes
  lib.kfn_png_info.restype = c.c_int
  lib.kfn_png_info.argtypes = [c.c_char_p, c.c_size_t, c.POINTER(c.c_int),
                               c.POINTER(c.c_int), c.POINTER(c.c_int),
                               c.POINTER(c.c_int)]
  lib.kfn_png_decode.restype = c.c_int
  lib.kfn_png_decode.argtypes = [c.c_char_p, c.c_size_t, c.c_void_p]
  lib.kfn_png_decode_rgb_f32.restype = c.c_int
  lib.kfn_png_decode_rgb_f32.argtypes = [c.c_char_p, c.c_size_t,
                                         c.POINTER(c.c_float)]
  lib.kfn_depth_to_labels.restype = c.c_int
  lib.kfn_depth_to_labels.argtypes = [
      c.c_char_p, c.c_size_t, c.POINTER(c.c_float), c.POINTER(c.c_float),
      c.c_int, c.c_float, c.c_float, c.c_float, c.c_uint16,
      c.POINTER(c.c_float), c.POINTER(c.c_uint8), c.POINTER(c.c_int),
      c.POINTER(c.c_int)]
  lib.kfn_load_batch.restype = c.c_int
  lib.kfn_load_batch.argtypes = [
      c.POINTER(c.c_char_p), c.POINTER(c.c_char_p), c.c_int, c.c_int,
      c.c_int, c.POINTER(c.c_float), c.POINTER(c.c_float), c.c_int,
      c.c_float, c.c_float, c.c_float, c.c_uint16, c.c_int,
      c.POINTER(c.c_float), c.POINTER(c.c_float), c.POINTER(c.c_uint8)]
  _LIB = lib
  return _LIB


def available() -> bool:
  return load_library() is not None


def _png_info(lib, data: bytes):
  w = ctypes.c_int()
  h = ctypes.c_int()
  c = ctypes.c_int()
  b = ctypes.c_int()
  rc = lib.kfn_png_info(data, len(data), ctypes.byref(w), ctypes.byref(h),
                        ctypes.byref(c), ctypes.byref(b))
  if rc != 0:
    raise ValueError("unsupported or corrupt PNG")
  return w.value, h.value, c.value, b.value


def read_color(path: str) -> np.ndarray:
  """(H, W, 3) float32 in [0,1]; native decode, PIL fallback."""
  lib = load_library()
  if lib is None:
    from kfnet_tpu.data.seven_scenes import read_color as pil_read
    return pil_read(path)
  with open(path, "rb") as f:
    data = f.read()
  w, h, c, bits = _png_info(lib, data)
  if bits != 8:
    from kfnet_tpu.data.seven_scenes import read_color as pil_read
    return pil_read(path)
  out = np.empty((h, w, 3), np.float32)
  rc = lib.kfn_png_decode_rgb_f32(
      data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
  if rc != 0:
    raise ValueError(f"native decode failed ({rc}) for {path}")
  return out


def read_depth_raw(path: str) -> np.ndarray:
  """(H, W) uint16 raw depth (native decode, PIL fallback)."""
  lib = load_library()
  if lib is None:
    from PIL import Image
    return np.asarray(Image.open(path), np.uint16)
  with open(path, "rb") as f:
    data = f.read()
  w, h, c, bits = _png_info(lib, data)
  if bits != 16 or c != 1:
    from PIL import Image
    return np.asarray(Image.open(path), np.uint16)
  out = np.empty((h, w), np.uint16)
  rc = lib.kfn_png_decode(data, len(data),
                          out.ctypes.data_as(ctypes.c_void_p))
  if rc != 0:
    raise ValueError(f"native decode failed ({rc}) for {path}")
  return out


def depth_png_to_labels(path: str, K: np.ndarray, T_wc: np.ndarray,
                        stride: int = 8, depth_scale: float = 1e-3,
                        min_depth: float = 0.05, max_depth: float = 20.0,
                        invalid_value: int = 65535):
  """Fused native path: depth PNG file → (coords (h,w,3) f32, valid (h,w)
  bool), matching labels.generate(seven_scenes.read_depth(path), ...)."""
  lib = load_library()
  if lib is None:
    import jax.numpy as jnp
    from PIL import Image
    from kfnet_tpu.data import labels
    # honor invalid_value exactly like the native kernel (raw ==
    # invalid_value or 0 → depth 0 → fails min_depth); the generic
    # seven_scenes.read_depth hardcodes 65535 and would silently diverge
    # from the native path for any other sentinel.
    raw = np.asarray(Image.open(path), np.uint16)
    d = np.where((raw == np.uint16(invalid_value)) | (raw == 0), 0.0,
                 raw.astype(np.float32) * depth_scale)
    c, v = labels.generate(jnp.asarray(d),
                           jnp.asarray(K), jnp.asarray(T_wc), stride=stride,
                           min_depth=min_depth, max_depth=max_depth)
    return np.asarray(c), np.asarray(v)
  with open(path, "rb") as f:
    data = f.read()
  w, h, _, _ = _png_info(lib, data)
  hs, ws = h // stride, w // stride
  coords = np.empty((hs, ws, 3), np.float32)
  valid = np.empty((hs, ws), np.uint8)
  oh = ctypes.c_int()
  ow = ctypes.c_int()
  Kf = np.ascontiguousarray(K, np.float32)
  Tf = np.ascontiguousarray(T_wc, np.float32)
  rc = lib.kfn_depth_to_labels(
      data, len(data),
      Kf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
      Tf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
      stride, ctypes.c_float(depth_scale), ctypes.c_float(min_depth),
      ctypes.c_float(max_depth), ctypes.c_uint16(invalid_value),
      coords.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
      valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
      ctypes.byref(oh), ctypes.byref(ow))
  if rc != 0:
    raise ValueError(f"native label generation failed ({rc}) for {path}")
  return coords, valid.astype(bool)


def load_batch(color_paths, depth_paths, poses, K,
               width: int, height: int,
               stride: int = 8, depth_scale: float = 1e-3,
               min_depth: float = 0.05, max_depth: float = 20.0,
               invalid_value: int = 65535,
               num_threads: int | None = None):
  """Native multi-threaded batch loader: N frames → one GIL-free C++ call
  (file read → PNG decode → RGB f32 + fused strided label generation,
  fanned over a std::thread pool — the executor role the reference left
  to TF's C++ queue runners, SURVEY.md §2.2 #10).

  Args:
    color_paths: list[str] of N color PNGs (width x height, 8-bit).
    depth_paths: list[str | None]; None/"" → zeros labels, valid=0.
    poses: (N, 4, 4) camera-to-world.
    K: (3, 3) shared intrinsics.

  Returns:
    dict(image (N,H,W,3) f32, coords (N,h,w,3) f32, valid (N,h,w) bool).
    Raises on decode failure; falls back to the Python path per-frame when
    the shared library is unavailable.
  """
  n = len(color_paths)
  assert len(depth_paths) == n and len(poses) == n
  lib = load_library()
  if lib is None:
    # Python fallback (PIL decode + device label gen), frame by frame —
    # same (N, H, W, 3) contract and per-frame error reporting as native.
    from kfnet_tpu.data.seven_scenes import read_color as pil_color
    frames = []
    for i, p in enumerate(color_paths):
      img = pil_color(p)
      if img.shape[:2] != (height, width):
        raise ValueError(
            f"batch load failed at frame {i} ({p}): on-disk size "
            f"{img.shape[:2]} != requested {(height, width)}")
      frames.append(img)
    imgs = np.stack(frames)
    cs, vs = [], []
    hs, ws = height // stride, width // stride
    for i, (dp, T) in enumerate(zip(depth_paths, poses)):
      if not dp:
        cs.append(np.zeros((hs, ws, 3), np.float32))
        vs.append(np.zeros((hs, ws), bool))
      else:
        c, v = depth_png_to_labels(dp, K, T, stride, depth_scale,
                                   min_depth, max_depth, invalid_value)
        if c.shape[:2] != (hs, ws):
          # same per-frame dim check as the native path (oh/ow vs hs/ws):
          # without it np.stack fails with a shapeless frameless error.
          raise ValueError(
              f"batch load failed at frame {i} (depth file {dp}): label "
              f"grid {c.shape[:2]} != {(hs, ws)} — on-disk depth size "
              f"does not match the requested {(height, width)}")
        cs.append(c)
        vs.append(v)
    return {"image": imgs, "coords": np.stack(cs), "valid": np.stack(vs)}

  if num_threads is None:
    num_threads = min(8, os.cpu_count() or 1)
  hs, ws = height // stride, width // stride
  images = np.empty((n, height, width, 3), np.float32)
  coords = np.empty((n, hs, ws, 3), np.float32)
  valid = np.empty((n, hs, ws), np.uint8)
  c_color = (ctypes.c_char_p * n)(*[p.encode() for p in color_paths])
  c_depth = (ctypes.c_char_p * n)(
      *[(p.encode() if p else None) for p in depth_paths])
  Kf = np.ascontiguousarray(K, np.float32)
  Tf = np.ascontiguousarray(np.stack(poses), np.float32)
  rc = lib.kfn_load_batch(
      c_color, c_depth, n, width, height,
      Kf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
      Tf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
      stride, ctypes.c_float(depth_scale), ctypes.c_float(min_depth),
      ctypes.c_float(max_depth), ctypes.c_uint16(invalid_value),
      num_threads,
      images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
      coords.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
      valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
  if rc != 0:
    packed = -(rc + 1)  # 2*index + which (0 = color file, 1 = depth file)
    bad, which = packed // 2, packed % 2
    paths = depth_paths if which else color_paths
    raise ValueError(
        f"native batch load failed at frame {bad} "
        f"({'depth' if which else 'color'} file "
        f"{paths[bad] if 0 <= bad < n else '?'})")
  return {"image": images, "coords": coords, "valid": valid.astype(bool)}
