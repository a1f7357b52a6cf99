"""Camera geometry: intrinsics, SE(3) poses, projection, and coordinate-map
label generation.

Reference parity: the TF1 reference generates per-pixel scene-coordinate
labels offline from depth + ground-truth pose (SURVEY.md §1 "Datasets",
§2.2 component #10) and evaluates poses by comparing against 4x4
camera-to-world matrices (7-Scenes convention). Everything here is pure
jnp / jittable; host-side label generation simply jits these fns on CPU.

Conventions
-----------
* Poses are 4x4 **camera-to-world** matrices ``T_wc`` (7-Scenes convention):
  ``X_world = R @ X_cam + t`` with ``R = T_wc[:3,:3]``, ``t = T_wc[:3,3]``.
* Intrinsics are a 3x3 ``K`` (pinhole, no distortion — 7/12-Scenes use
  rectified images; fx=fy=585, cx=320, cy=240 for 7-Scenes).
* Pixel coordinates are (u, v) = (x/col, y/row), origin at the top-left
  pixel center (so pixel (0,0) has coordinate (0.0, 0.0)).
* Coordinate maps are produced at 1/``stride`` resolution by sampling the
  pixel at the **center of each stride x stride cell**, matching the
  reference's label-generation convention for the 1/8-resolution output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_intrinsics(fx: float, fy: float, cx: float, cy: float) -> jnp.ndarray:
  """3x3 pinhole intrinsic matrix."""
  return jnp.array(
      [[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=jnp.float32)


# 7-Scenes / 12-Scenes default calibration (Kinect, 640x480).
SEVEN_SCENES_K = (585.0, 585.0, 320.0, 240.0)


def pixel_grid(height: int, width: int) -> jnp.ndarray:
  """(H, W, 2) map of dense (u, v) full-resolution pixel coordinates.

  For the full-res pixel each STRIDED map cell corresponds to, use
  :func:`cell_center_grid` — the repo-wide convention is the integer
  cell-center pixel ``(stride-1)//2 + stride*i`` (labels, native path,
  PnP all agree on it). A fractional-center variant used to live here
  and was a 0.5 px trap; it had no production caller and was removed.
  """
  vs = jnp.arange(height, dtype=jnp.float32)
  us = jnp.arange(width, dtype=jnp.float32)
  u, v = jnp.meshgrid(us, vs, indexing="xy")
  return jnp.stack([u, v], axis=-1)


def cell_center_grid(height: int, width: int, stride: int) -> jnp.ndarray:
  """(H/stride is the caller's height here) — (h, w, 2) full-res (u, v)
  coordinates of the integer pixel each strided map cell samples:
  ``off + stride*i`` with ``off = (stride-1)//2``. This is the exact
  convention of ``depth_to_world_coords``; PnP must use the same grid so
  2D-3D correspondences align sub-pixel."""
  off = (stride - 1) // 2
  vs = (jnp.arange(height) * stride + off).astype(jnp.float32)
  us = (jnp.arange(width) * stride + off).astype(jnp.float32)
  u, v = jnp.meshgrid(us, vs, indexing="xy")
  return jnp.stack([u, v], axis=-1)


def backproject(depth: jnp.ndarray, K: jnp.ndarray,
                pixels: jnp.ndarray | None = None) -> jnp.ndarray:
  """Back-project a depth map to camera-frame 3D points.

  Args:
    depth: (H, W) metric depth (z-depth along the optical axis).
    K: (3, 3) intrinsics.
    pixels: optional (H, W, 2) full-res (u, v) coordinates; defaults to the
      dense pixel grid of ``depth``'s shape.

  Returns:
    (H, W, 3) camera-frame points.
  """
  h, w = depth.shape
  if pixels is None:
    pixels = pixel_grid(h, w)
  fx, fy = K[0, 0], K[1, 1]
  cx, cy = K[0, 2], K[1, 2]
  x = (pixels[..., 0] - cx) / fx * depth
  y = (pixels[..., 1] - cy) / fy * depth
  return jnp.stack([x, y, depth], axis=-1)


def transform_points(T: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
  """Apply a 4x4 rigid transform to (..., 3) points."""
  return points @ T[:3, :3].T + T[:3, 3]


def invert_pose(T: jnp.ndarray) -> jnp.ndarray:
  """Invert a 4x4 rigid transform."""
  R = T[:3, :3]
  t = T[:3, 3]
  Ti = jnp.eye(4, dtype=T.dtype)
  Ti = Ti.at[:3, :3].set(R.T)
  Ti = Ti.at[:3, 3].set(-R.T @ t)
  return Ti


def project(points_world: jnp.ndarray, K: jnp.ndarray,
            T_wc: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
  """Project world points into the camera.

  Returns:
    pixels: (..., 2) (u, v) coordinates.
    z: (...,) camera-frame depth (positive = in front of the camera).
  """
  T_cw = invert_pose(T_wc)
  pc = transform_points(T_cw, points_world)
  z = pc[..., 2]
  zs = jnp.where(jnp.abs(z) < 1e-8, jnp.sign(z) * 1e-8 + 1e-12, z)
  u = K[0, 0] * pc[..., 0] / zs + K[0, 2]
  v = K[1, 1] * pc[..., 1] / zs + K[1, 2]
  return jnp.stack([u, v], axis=-1), z


def depth_to_world_coords(
    depth: jnp.ndarray,
    K: jnp.ndarray,
    T_wc: jnp.ndarray,
    stride: int = 1,
    min_depth: float = 1e-3,
    max_depth: float = 1e3,
) -> tuple[jnp.ndarray, jnp.ndarray]:
  """Generate a scene-coordinate label map from depth + GT pose.

  This is the offline label-generation math of the reference's ``tools/``
  step (SURVEY.md §2.2 #10). With ``stride`` > 1 the depth is sampled at
  cell centers to produce a 1/stride-resolution label (matching the model's
  1/8-res output; SURVEY.md §1).

  Args:
    depth: (H, W) metric depth, 0 / out-of-range = invalid.
    stride: output subsampling factor.

  Returns:
    coords: (H/stride, W/stride, 3) world coordinates (0 where invalid).
    valid:  (H/stride, W/stride) bool validity mask.
  """
  h, w = depth.shape
  hs, ws = h // stride, w // stride
  if stride > 1:
    off = (stride - 1) // 2
    d = depth[off::stride, off::stride][:hs, :ws]
    pixels = cell_center_grid(hs, ws, stride)
  else:
    d = depth
    pixels = pixel_grid(h, w)
  valid = (d > min_depth) & (d < max_depth) & jnp.isfinite(d)
  pc = backproject(jnp.where(valid, d, 1.0), K, pixels)
  pw = transform_points(T_wc, pc)
  coords = jnp.where(valid[..., None], pw, 0.0)
  return coords, valid


# ---------------------------------------------------------------------------
# Rotations
# ---------------------------------------------------------------------------


def hat(w: jnp.ndarray) -> jnp.ndarray:
  """Skew-symmetric matrix of a 3-vector."""
  wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
  z = jnp.zeros_like(wx)
  return jnp.stack([
      jnp.stack([z, -wz, wy], axis=-1),
      jnp.stack([wz, z, -wx], axis=-1),
      jnp.stack([-wy, wx, z], axis=-1),
  ], axis=-2)


def axis_angle_to_matrix(w: jnp.ndarray) -> jnp.ndarray:
  """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation matrix.

  Numerically safe at theta -> 0 (Taylor-expanded coefficients).
  """
  theta2 = jnp.sum(w * w, axis=-1)
  theta = jnp.sqrt(theta2 + 1e-24)
  small = theta2 < 1e-12
  # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks.
  a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
  b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
  W = hat(w)
  eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
  return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def matrix_to_axis_angle(R: jnp.ndarray) -> jnp.ndarray:
  """(..., 3, 3) rotation matrix -> (..., 3) axis-angle (log map).

  Three regimes, all branchless: the generic v·theta/(2 sin theta) form;
  a Taylor fallback at theta -> 0; and a symmetric-part reconstruction at
  theta -> pi, where the antisymmetric part v vanishes (a plain
  small-sin fallback would silently map 180-degree rotations to ~0 —
  review r2). Near pi the axis sign is recovered from the row of the
  largest axis component (globally ambiguous at exactly pi, where both
  signs give the same R)."""
  trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
  cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
  theta = jnp.arccos(cos_t)
  # Off-diagonal antisymmetric part ~ 2 sin(theta) * axis.
  v = jnp.stack([
      R[..., 2, 1] - R[..., 1, 2],
      R[..., 0, 2] - R[..., 2, 0],
      R[..., 1, 0] - R[..., 0, 1],
  ], axis=-1)
  sin_t = jnp.sin(theta)
  scale = jnp.where(sin_t < 1e-6, 0.5 + theta * theta / 12.0,
                    theta / (2.0 * sin_t + 1e-24))
  w_generic = v * scale[..., None]

  # theta ~ pi: S = (R+R^T)/2 = cos_t I + (1-cos_t) aa^T is
  # well-conditioned there (1-cos_t ~ 2). |a_i| from the diagonal; signs
  # from row k of aa^T with k = argmax |a| (a_k chosen positive).
  Sym = 0.5 * (R + jnp.swapaxes(R, -1, -2))
  one_minus = jnp.maximum(1.0 - cos_t, 1e-12)[..., None]
  diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
  a2 = jnp.clip((diag - cos_t[..., None]) / one_minus, 0.0, 1.0)
  a = jnp.sqrt(a2)
  k = jnp.argmax(a2, axis=-1)
  onehot = (jnp.arange(3) == k[..., None]).astype(R.dtype)
  row_k = jnp.einsum("...i,...ij->...j", onehot, Sym)
  sign = jnp.where(row_k >= 0, 1.0, -1.0)
  sign = jnp.where(onehot > 0, 1.0, sign)  # a_k itself is positive
  w_pi = theta[..., None] * a * sign

  near_pi = (sin_t < 1e-3) & (cos_t < 0.0)
  return jnp.where(near_pi[..., None], w_pi, w_generic)


def _inv3(M: jnp.ndarray) -> jnp.ndarray:
  """Closed-form (..., 3, 3) inverse via adjugate/det (det clamped so
  degenerate inputs stay finite — downstream RANSAC discards garbage)."""
  a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
  d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
  g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
  A = e * i - f * h
  B = f * g - d * i
  C = d * h - e * g
  det = a * A + b * B + c * C
  det = jnp.where(jnp.abs(det) < 1e-20, jnp.sign(det) * 1e-20 + 1e-30, det)
  adj = jnp.stack([
      jnp.stack([A, c * h - b * i, b * f - c * e], -1),
      jnp.stack([B, a * i - c * g, c * d - a * f], -1),
      jnp.stack([C, b * g - a * h, a * e - b * d], -1),
  ], -2)
  return adj / det[..., None, None]


def polar_rotation(M: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
  """Orthogonal polar factor of a (..., 3, 3) matrix via determinant-scaled
  Newton iteration X ← ½(γX + (γX)⁻ᵀ) — closed-form 3x3 inverses only.

  TPU rationale: batched tiny SVD/eigh are iterative QR under the hood and
  dominated the pose solvers (measured: 3x3 SVDs were most of the P3P
  path). For det(M) > 0 this is the nearest rotation (the Kabsch solution
  without the reflection branch — our call sites guarantee det > 0 for
  meaningful inputs; degenerate hypotheses return garbage-but-finite and
  are discarded by RANSAC scoring).
  """
  X = M
  for _ in range(iters):
    det = jnp.linalg.det(X)
    gamma = jnp.abs(det) ** (-1.0 / 3.0)
    gamma = jnp.clip(jnp.where(jnp.isfinite(gamma), gamma, 1.0), 1e-4, 1e4)
    Xs = X * gamma[..., None, None]
    X = 0.5 * (Xs + jnp.swapaxes(_inv3(Xs), -1, -2))
  return X


def orthonormalize_rotation(M: jnp.ndarray) -> jnp.ndarray:
  """Project a (..., 3, 3) near-rotation to a PROPER rotation (det=+1).

  Polar Newton, not SVD — see polar_rotation. The polar factor preserves
  det sign, so a det<0 input (garbage hypothesis from a degenerate
  coordinate map) would come out a reflection; flip one column first so
  the output is always in SO(3). For det<0 this is not the
  Frobenius-nearest rotation (that needs the SVD reflection fix, kept in
  orthonormalize_rotation_svd), but such inputs are RANSAC rejects — the
  contract that matters downstream is det=+1. (review r2 finding #3)"""
  det = jnp.linalg.det(M)
  flip = jnp.where(det < 0, -1.0, 1.0).astype(M.dtype)
  col_scale = jnp.stack(
      [jnp.ones_like(flip), jnp.ones_like(flip), flip], axis=-1)
  return polar_rotation(M * col_scale[..., None, :])


def orthonormalize_rotation_svd(M: jnp.ndarray) -> jnp.ndarray:
  """SVD reference implementation (handles det<0 via the Kabsch
  reflection correction); kept for numeric tests."""
  u, _, vt = jnp.linalg.svd(M)
  det = jnp.linalg.det(u @ vt)
  d = jnp.ones(M.shape[:-2] + (3,), dtype=M.dtype)
  d = d.at[..., 2].set(det)
  return (u * d[..., None, :]) @ vt


def make_pose(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
  """Assemble a 4x4 pose from (..., 3, 3) R and (..., 3) t."""
  batch = R.shape[:-2]
  T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
  T = T.at[..., :3, :3].set(R)
  T = T.at[..., :3, 3].set(t)
  T = T.at[..., 3, 3].set(1.0)
  return T


# ---------------------------------------------------------------------------
# Pose error metrics (reference tools/ pose-eval protocol; SURVEY.md §3.4)
# ---------------------------------------------------------------------------


def translation_error(T_est: jnp.ndarray, T_gt: jnp.ndarray) -> jnp.ndarray:
  """Euclidean camera-center error in meters (broadcasts over batch)."""
  return jnp.linalg.norm(T_est[..., :3, 3] - T_gt[..., :3, 3], axis=-1)


def rotation_error_deg(T_est: jnp.ndarray, T_gt: jnp.ndarray) -> jnp.ndarray:
  """Geodesic rotation error in degrees (broadcasts over batch).

  Small angles use the Frobenius identity ‖R_est − R_gt‖_F = 2√2·sin(θ/2)
  — exact and well-conditioned near identity, where the arccos-of-trace
  form quantizes at ~0.03° in f32 (acos′(1) → ∞ wipes out sub-ULP trace
  differences; the many literal-0.00° medians in early protocol reports
  were this artifact). Large angles (cos θ ≤ 0) switch to the trace form,
  which is well-conditioned exactly where arcsin is not.
  """
  R_e = T_est[..., :3, :3]
  R_g = T_gt[..., :3, :3]
  diff = R_e - R_g
  fro = jnp.sqrt(jnp.sum(diff * diff, axis=(-1, -2)))
  sin_half = jnp.clip(fro / (2.0 * jnp.sqrt(2.0)), 0.0, 1.0)
  theta_small = 2.0 * jnp.arcsin(sin_half)
  R = R_e @ jnp.swapaxes(R_g, -1, -2)
  trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
  cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
  return jnp.degrees(jnp.where(cos_t > 0.0, theta_small, jnp.arccos(cos_t)))
