"""Per-pixel scalar-covariance Kalman update + consistency examination.

The filtering system of KFNet (paper §3.3–3.4; SURVEY.md §2.2 #9): each
pixel carries a 3-vector state x (scene coordinate) with isotropic scalar
covariance P. The measurement z comes from SCoordNet with noise V; the
prior (x⁻, P⁻) comes from OFlowNet-warped previous posterior plus process
noise W. All fns are pure, shape-polymorphic over leading dims, and fuse
cleanly under jit; the Pallas kernel in ``kernels/fused_filter.py``
reimplements warp∘gain∘update as one VMEM-resident kernel and is tested
against these fns.

Shapes: x-like tensors are (..., 3); covariances are (..., 1) (or (...,)
broadcastable). dtype float32 throughout (covariances must stay fp32 —
bf16 gains lose too much precision near K≈0/1).
"""

from __future__ import annotations

import jax.numpy as jnp

# chi-square(3 dof) upper-tail critical values for the consistency test.
CHI2_3DOF_P05 = 7.814728  # p = 0.05 (the paper's gate)
CHI2_3DOF_P01 = 11.344867  # p = 0.01
CHI2_3DOF_P50 = 2.365974  # p = 0.50 (median) — the calibrated serving
# gate: across 24 scene-conditions (2 seeds x clean/stressed x 6 scenes,
# 480 paired frames each) the stricter gate with w_scale=16 turned every
# catastrophic clean-stream filtering harm into a win or a CI-neutral
# delta while keeping all stressed/outdoor wins (docs/CALIBRATION.md).


def kalman_gain(P_prior: jnp.ndarray, V: jnp.ndarray) -> jnp.ndarray:
  """K = P⁻ / (P⁻ + V), elementwise scalar gain (paper §3.3)."""
  return P_prior / (P_prior + V)


def mahalanobis_sq(innovation: jnp.ndarray, P_prior: jnp.ndarray,
                   V: jnp.ndarray) -> jnp.ndarray:
  """Squared Mahalanobis distance of the innovation under S = (P⁻+V)·I₃.

  innovation: (..., 3); P_prior, V: (..., 1). Returns (..., 1).
  """
  return jnp.sum(innovation * innovation, axis=-1, keepdims=True) / (
      P_prior + V)


def consistency_mask(innovation: jnp.ndarray, P_prior: jnp.ndarray,
                     V: jnp.ndarray,
                     threshold: float = CHI2_3DOF_P05) -> jnp.ndarray:
  """True where the prior is CONSISTENT with the measurement (χ² test,
  3 dof; paper §3.4). False → reset to measurement-only (K→1).
  """
  return mahalanobis_sq(innovation, P_prior, V) <= threshold


def kalman_update(
    x_prior: jnp.ndarray,
    P_prior: jnp.ndarray,
    z: jnp.ndarray,
    V: jnp.ndarray,
    threshold: float = CHI2_3DOF_P05,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
  """Fused gain + innovation + posterior update + consistency reset.

  Args:
    x_prior: (..., 3) prior state.
    P_prior: (..., 1) prior covariance.
    z: (..., 3) measurement.
    V: (..., 1) measurement noise.
    threshold: χ²(3) critical value; pixels whose innovation fails the test
      fall back to (z, V) — equivalently K=1 (paper §3.4).

  Returns:
    x_post: (..., 3); P_post: (..., 1); consistent: (..., 1) bool.
  """
  innovation = z - x_prior
  consistent = consistency_mask(innovation, P_prior, V, threshold)
  K = kalman_gain(P_prior, V)
  x_post = x_prior + K * innovation
  # (1-K)·P⁻ cancels catastrophically in f32 when P⁻ ≫ V (K rounds to 1,
  # e.g. at the warp's invalid-covariance sentinel); the algebraically
  # equal product form P⁻V/(P⁻+V) stays exact there.
  P_post = (P_prior * V) / (P_prior + V)
  x_post = jnp.where(consistent, x_post, z)
  P_post = jnp.where(consistent, P_post, V)
  return x_post, P_post, consistent


def fuse_information_form(x_prior, P_prior, z, V):
  """Information-form fusion (numerically symmetric alternative):
  P = (P⁻·V)/(P⁻+V);  x = P·(x⁻/P⁻ + z/V).

  Algebraically identical to ``kalman_update`` without the consistency
  branch; kept for the numeric test suite (SURVEY.md §4 "Numeric").
  """
  P = (P_prior * V) / (P_prior + V)
  x = P * (x_prior / P_prior + z / V)
  return x, P
