"""Batched differentiable-shape PnP: normalized weighted DLT + damped
Gauss-Newton (LM) refinement, all fixed-shape / vmappable.

The reference delegates pose solving to OpenCV's C++ ``solvePnPRansac``
(SURVEY.md §2.2 #12, §3.4). On TPU, dynamic data-dependent iteration is
recast as: (a) a closed-form weighted DLT solve per hypothesis (SVD of a
12x12 normal matrix — vmaps over thousands of hypotheses), and (b) a
fixed-iteration LM polish on the full weighted correspondence set.
``ransac.py`` builds the fixed-budget RANSAC loop on top.

Internally poses are world→camera (R, t): x_cam = R·X + t; the public
eval surface converts to the dataset's camera-to-world convention.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from kfnet_tpu.core import geometry as geo


def project_w2c(X: jnp.ndarray, K: jnp.ndarray, R: jnp.ndarray,
                t: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
  """Project world points with a world→camera pose. Returns (uv, z)."""
  pc = X @ R.T + t
  z = pc[..., 2]
  zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
  u = K[0, 0] * pc[..., 0] / zs + K[0, 2]
  v = K[1, 1] * pc[..., 1] / zs + K[1, 2]
  return jnp.stack([u, v], axis=-1), z


def _normalize_2d(uv, w):
  wsum = jnp.maximum(jnp.sum(w), 1e-8)
  mean = jnp.sum(uv * w[:, None], axis=0) / wsum
  d = jnp.sqrt(jnp.sum((uv - mean) ** 2, axis=-1))
  scale = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d * w) / wsum, 1e-8)
  T = jnp.array([[1.0, 0.0, -mean[0]], [0.0, 1.0, -mean[1]],
                 [0.0, 0.0, 1.0]]) * jnp.array([[scale], [scale], [1.0]])
  return (uv - mean) * scale, T


def _normalize_3d(X, w):
  wsum = jnp.maximum(jnp.sum(w), 1e-8)
  mean = jnp.sum(X * w[:, None], axis=0) / wsum
  d = jnp.sqrt(jnp.sum((X - mean) ** 2, axis=-1))
  scale = jnp.sqrt(3.0) / jnp.maximum(jnp.sum(d * w) / wsum, 1e-8)
  U = jnp.zeros((4, 4)).at[0, 0].set(scale).at[1, 1].set(scale) \
      .at[2, 2].set(scale).at[:3, 3].set(-mean * scale).at[3, 3].set(1.0)
  return (X - mean) * scale, U


def _smallest_eigvec_12(M: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
  """Eigenvector of the smallest eigenvalue of a 12x12 PSD matrix via
  shifted inverse iteration: one Cholesky + ``iters`` triangular solves.

  jnp.linalg.eigh on tiny matrices is iterative (QR/Jacobi) and dominated
  the whole PnP-RANSAC solve on TPU (measured 6.1 of 6.5 ms/frame for
  256 hypotheses); inverse iteration is a fixed handful of batched
  128-padded solves instead. M's null direction (the DLT solution) makes
  M + εI nearly singular along exactly that direction, so each solve
  amplifies it by ~(λ₂+ε)/(λ_min+ε) ≫ 1 — a few iterations reach f32
  accuracy from any non-orthogonal start. Degenerate samples give a
  garbage-but-finite vector, which RANSAC scoring discards.
  """
  eps = 1e-7 * jnp.trace(M) / 12.0 + 1e-30
  A = M + eps * jnp.eye(12, dtype=M.dtype)
  chol = jax.scipy.linalg.cho_factor(A)
  v = jnp.full((12,), 1.0 / jnp.sqrt(12.0), M.dtype)

  def body(_, v):
    v = jax.scipy.linalg.cho_solve(chol, v)
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-30)

  return jax.lax.fori_loop(0, iters, body, v)


def dlt_pnp(uv: jnp.ndarray, X: jnp.ndarray, K: jnp.ndarray,
            weights: jnp.ndarray | None = None
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Weighted DLT PnP from n ≥ 6 correspondences (fixed shape, vmappable).

  Args:
    uv: (n, 2) pixel coordinates; X: (n, 3) world points; K: (3, 3).
    weights: (n,) nonnegative weights (0 disables a correspondence).

  Returns:
    (R, t) world→camera. Degenerate inputs yield a garbage-but-finite pose
    (RANSAC scoring discards it).
  """
  n = uv.shape[0]
  w = jnp.ones((n,)) if weights is None else weights
  # Work in normalized image coordinates (K removed) + Hartley scaling.
  Kinv = jnp.linalg.inv(K)
  xn = (jnp.concatenate([uv, jnp.ones((n, 1))], -1) @ Kinv.T)[:, :2]
  xn, T2 = _normalize_2d(xn, w)
  Xn, T3 = _normalize_3d(X, w)
  Xh = jnp.concatenate([Xn, jnp.ones((n, 1))], -1)
  zeros = jnp.zeros((n, 4))
  # rows: [X 0 -u X] and [0 X -v X]
  r1 = jnp.concatenate([Xh, zeros, -xn[:, 0:1] * Xh], -1)
  r2 = jnp.concatenate([zeros, Xh, -xn[:, 1:2] * Xh], -1)
  A = jnp.concatenate([r1, r2], 0) * jnp.concatenate([w, w])[:, None]
  # Smallest eigenvector of AᵀA (12x12) — inverse iteration, not eigh
  # (see _smallest_eigvec_12: eigh was 94% of the RANSAC solve on TPU).
  M = A.T @ A
  p = _smallest_eigvec_12(M)
  P = p.reshape(3, 4)
  # Undo normalizations: P_metric = T2⁻¹ P T3  (in K-normalized coords).
  P = jnp.linalg.inv(T2) @ P @ T3
  # Fix scale & sign: ||third rotation row|| = 1, median depth positive.
  Rraw = P[:, :3]
  scale = jnp.linalg.norm(Rraw[2])
  P = P / jnp.maximum(scale, 1e-12)
  z = X @ P[2, :3] + P[2, 3]
  sign = jnp.where(jnp.sum(jnp.sign(z) * w) >= 0, 1.0, -1.0)
  P = P * sign
  R = geo.orthonormalize_rotation(P[:, :3])
  t = P[:, 3]
  return R, t


def reprojection_errors(uv, X, K, R, t, max_err: float = 1e6):
  """Per-point reprojection error (pixels), clamped; behind-camera points
  get max_err."""
  proj, z = project_w2c(X, K, R, t)
  err = jnp.linalg.norm(proj - uv, axis=-1)
  err = jnp.where(z > 1e-6, err, max_err)
  return jnp.minimum(err, max_err)


def _se3_apply(dw, dt, R, t):
  dR = geo.axis_angle_to_matrix(dw)
  return dR @ R, dR @ t + dt


def refine_pnp_lm(uv: jnp.ndarray, X: jnp.ndarray, K: jnp.ndarray,
                  R0: jnp.ndarray, t0: jnp.ndarray,
                  weights: jnp.ndarray, iters: int = 10,
                  damping: float = 1e-3):
  """Fixed-iteration Levenberg–Marquardt polish of (R, t) minimizing the
  weighted reprojection error. Replaces OpenCV's iterative refinement.

  Runs ``iters`` LM steps via fori_loop; each step solves a 6x6 system.
  """
  fx, fy = K[0, 0], K[1, 1]

  def residuals(R, t):
    pc = X @ R.T + t  # (n, 3)
    z = jnp.maximum(pc[..., 2], 1e-6)
    u = fx * pc[..., 0] / z + K[0, 2]
    v = fy * pc[..., 1] / z + K[1, 2]
    r = jnp.stack([u - uv[:, 0], v - uv[:, 1]], -1)  # (n, 2)
    return r, pc, z

  def residuals_jac(R, t):
    r, pc, z = residuals(R, t)
    # d(proj)/d(pc)
    zinv = 1.0 / z
    du = jnp.stack([fx * zinv, jnp.zeros_like(z),
                    -fx * pc[..., 0] * zinv * zinv], -1)
    dv = jnp.stack([jnp.zeros_like(z), fy * zinv,
                    -fy * pc[..., 1] * zinv * zinv], -1)
    Jp = jnp.stack([du, dv], -2)  # (n, 2, 3)
    # left-multiplied se(3): d(pc)/d(dw) = -[pc]x ; d(pc)/d(dt) = I
    Jw = -Jp @ geo.hat(pc)  # (n, 2, 3)
    Jt = Jp
    J = jnp.concatenate([Jw, Jt], -1)  # (n, 2, 6)
    return r, J

  def cost_of(r):
    return jnp.sum(weights * jnp.sum(r * r, -1))

  def step(_, state):
    # cost is carried in the state (and the trial point evaluates
    # residuals only, no Jacobian) — the per-frame pose-solve hot path
    # previously re-derived both incumbent and trial costs from scratch
    # each iteration (3x residual evaluations per step).
    R, t, lam, c = state
    r, J = residuals_jac(R, t)
    wts = weights[:, None]
    JTJ = jnp.einsum("nik,ni,nij->kj", J, wts * jnp.ones_like(r), J)
    JTr = jnp.einsum("nik,ni->k", J, wts * r)
    H = JTJ + lam * jnp.eye(6) * jnp.maximum(jnp.trace(JTJ) / 6.0, 1e-8)
    delta = -jnp.linalg.solve(H, JTr)
    R_new, t_new = _se3_apply(delta[:3], delta[3:], R, t)
    # accept if weighted cost decreased, else raise damping (LM).
    c_new = cost_of(residuals(R_new, t_new)[0])
    improved = c_new < c
    R = jnp.where(improved, R_new, R)
    t = jnp.where(improved, t_new, t)
    c = jnp.where(improved, c_new, c)
    lam = jnp.where(improved, lam * 0.5, lam * 4.0)
    return R, t, lam, c

  c0 = cost_of(residuals(R0, t0)[0])
  R, t, _, _ = jax.lax.fori_loop(
      0, iters, step, (R0, t0, jnp.float32(damping), c0))
  return R, t
