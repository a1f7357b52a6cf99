"""P3P minimal solver (Grunert's solution, Haralick et al. 1994 form) —
fully vectorized/vmappable, no data-dependent control flow.

Why: RANSAC with 6-point DLT needs all-inlier samples with probability
w⁶; P3P needs w³ — at 30% inliers that is 2.7% vs 0.07% per draw, the
difference between a working and a failing solver on hard frames. This is
also what OpenCV's `solvePnPRansac` uses internally (SURVEY.md §2.2 #12).

TPU recast of the classical algebra:
  * the Grunert quartic is solved with fixed-iteration Durand–Kerner in
    complex64 (jnp.linalg.eigvals — the usual companion-matrix route — is
    unsupported on TPU);
  * each of the 4 roots yields camera-frame distances; absolute
    orientation (3-point Kabsch, 3x3 SVD) gives a candidate pose;
  * invalid roots produce finite garbage poses that RANSAC scoring
    discards — no branching.

Returns 4 candidate (R, t) per minimal set (world→camera).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kfnet_tpu.core import geometry as geo


def durand_kerner_quartic(coeffs: jnp.ndarray, iters: int = 40):
  """Roots of a quartic given coeffs (5,) [A4..A0], highest first.

  Returns (4,) complex64 roots. Degenerate leading coefficients are
  guarded with a tiny epsilon (callers filter bad roots by geometry)."""
  A4 = coeffs[0]
  safe = jnp.where(jnp.abs(A4) < 1e-12, 1e-12, A4)
  c = coeffs / safe  # monic: z^4 + c1 z^3 + c2 z^2 + c3 z + c4
  c = c.astype(jnp.complex64)

  def poly(z):
    return (((z + c[1]) * z + c[2]) * z + c[3]) * z + c[4]

  # standard DK init: powers of (0.4 + 0.9i)
  base = jnp.complex64(0.4 + 0.9j)
  z0 = base ** jnp.arange(1, 5)

  def step(_, z):
    # z_i <- z_i - p(z_i) / prod_{j != i} (z_i - z_j)
    diff = z[:, None] - z[None, :]
    diff = diff + jnp.eye(4, dtype=jnp.complex64)  # avoid 0 on diagonal
    denom = jnp.prod(diff, axis=1)
    return z - poly(z) / denom

  return jax.lax.fori_loop(0, iters, step, z0)


def _triad(P: jnp.ndarray) -> jnp.ndarray:
  """Orthonormal basis (columns) from 3 points: u1 along P1-P0, u3 the
  plane normal, u2 = u3 x u1. Collinear points give garbage-but-finite."""
  a = P[1] - P[0]
  b = P[2] - P[0]
  u1 = a / jnp.maximum(jnp.linalg.norm(a), 1e-12)
  n = jnp.cross(a, b)
  u3 = n / jnp.maximum(jnp.linalg.norm(n), 1e-12)
  u2 = jnp.cross(u3, u1)
  return jnp.stack([u1, u2, u3], axis=-1)


def _kabsch_w2c(Xw: jnp.ndarray, Pc: jnp.ndarray):
  """Rigid transform with Pc ≈ R·Xw + t from 3 correspondences.

  Triad construction (R = B_c·B_wᵀ from matched orthonormal frames) —
  exact for rigid 3-point correspondences and pure closed-form vector
  math. The earlier 3x3 SVD route was the P3P path's dominant cost on
  TPU (batched tiny SVDs are iterative QR), and a Newton polar iteration
  can't replace it here because centered 3-point H is always rank-2."""
  R = _triad(Pc) @ _triad(Xw).T
  t = jnp.mean(Pc, axis=0) - R @ jnp.mean(Xw, axis=0)
  return R, t


def p3p_grunert(uv: jnp.ndarray, X: jnp.ndarray, K: jnp.ndarray):
  """Solve P3P for one minimal set.

  Args:
    uv: (3, 2) pixels; X: (3, 3) world points; K: (3, 3).

  Returns:
    Rs (4, 3, 3), ts (4, 3) — up to 4 world→camera candidates (invalid
    roots give finite garbage, to be rejected by scoring).
  """
  Kinv = jnp.linalg.inv(K)
  rays = jnp.concatenate([uv, jnp.ones((3, 1))], -1) @ Kinv.T
  f = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)  # (3,3) bearings

  a2 = jnp.sum((X[1] - X[2]) ** 2)
  b2 = jnp.sum((X[0] - X[2]) ** 2)
  c2 = jnp.sum((X[0] - X[1]) ** 2)
  ca = jnp.dot(f[1], f[2])  # cos alpha (between rays 2,3)
  cb = jnp.dot(f[0], f[2])  # cos beta  (rays 1,3)
  cg = jnp.dot(f[0], f[1])  # cos gamma (rays 1,2)

  b2s = jnp.where(jnp.abs(b2) < 1e-12, 1e-12, b2)
  q1 = (a2 - c2) / b2s
  q2 = (a2 + c2) / b2s

  A4 = (q1 - 1.0) ** 2 - 4.0 * (c2 / b2s) * ca ** 2
  A3 = 4.0 * (q1 * (1.0 - q1) * cb - (1.0 - q2) * ca * cg
              + 2.0 * (c2 / b2s) * ca ** 2 * cb)
  A2 = 2.0 * (q1 ** 2 - 1.0 + 2.0 * q1 ** 2 * cb ** 2
              + 2.0 * ((b2 - c2) / b2s) * ca ** 2
              - 4.0 * q2 * ca * cb * cg
              + 2.0 * ((b2 - a2) / b2s) * cg ** 2)
  A1 = 4.0 * (-q1 * (1.0 + q1) * cb + 2.0 * (a2 / b2s) * cg ** 2 * cb
              - (1.0 - q2) * ca * cg)
  A0 = (1.0 + q1) ** 2 - 4.0 * (a2 / b2s) * cg ** 2

  roots = durand_kerner_quartic(jnp.stack([A4, A3, A2, A1, A0]))
  v = jnp.real(roots)
  bad = (jnp.abs(jnp.imag(roots)) > 1e-3) | (v <= 1e-6)

  denom_u = 2.0 * (cg - v * ca)
  denom_u = jnp.where(jnp.abs(denom_u) < 1e-9, 1e-9, denom_u)
  u = ((-1.0 + q1) * v ** 2 - 2.0 * q1 * cb * v + 1.0 + q1) / denom_u

  s1sq = b2 / jnp.maximum(1.0 + v ** 2 - 2.0 * v * cb, 1e-9)
  s1 = jnp.sqrt(jnp.maximum(s1sq, 1e-12))
  s2 = u * s1
  s3 = v * s1
  bad = bad | (s2 <= 1e-6) | (s3 <= 1e-6)
  # collapse invalid roots to s=1 (gives a finite garbage pose)
  s1 = jnp.where(bad, 1.0, s1)
  s2 = jnp.where(bad, 1.0, s2)
  s3 = jnp.where(bad, 1.0, s3)

  def solve_root(s123):
    Pc = f * s123[:, None]
    return _kabsch_w2c(X, Pc)

  Rs, ts = jax.vmap(solve_root)(jnp.stack([s1, s2, s3], axis=-1))
  return Rs, ts
