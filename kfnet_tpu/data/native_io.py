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
    from kfnet_tpu.data import labels
    from kfnet_tpu.data.seven_scenes import read_depth
    c, v = labels.generate(jnp.asarray(read_depth(path, depth_scale)),
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
