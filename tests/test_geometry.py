import jax.numpy as jnp
import numpy as np

from kfnet_tpu.core import geometry as geo


def random_pose(rng):
  w = rng.normal(size=3) * 0.5
  R = np.asarray(geo.axis_angle_to_matrix(jnp.asarray(w, jnp.float32)))
  t = rng.normal(size=3).astype(np.float32)
  return np.asarray(geo.make_pose(jnp.asarray(R), jnp.asarray(t)))


def test_backproject_project_roundtrip():
  rng = np.random.default_rng(0)
  K = geo.make_intrinsics(*geo.SEVEN_SCENES_K)
  T = jnp.asarray(random_pose(rng))
  depth = jnp.asarray(rng.uniform(0.5, 4.0, size=(12, 16)).astype(np.float32))
  coords, valid = geo.depth_to_world_coords(depth, K, T)
  assert bool(valid.all())
  pix, z = geo.project(coords, K, T)
  grid = geo.pixel_grid(12, 16)
  np.testing.assert_allclose(np.asarray(pix), np.asarray(grid), atol=1e-3)
  np.testing.assert_allclose(np.asarray(z), np.asarray(depth), rtol=1e-5)


def test_depth_to_world_strided_matches_dense():
  rng = np.random.default_rng(1)
  K = geo.make_intrinsics(*geo.SEVEN_SCENES_K)
  T = jnp.asarray(random_pose(rng))
  depth = jnp.asarray(rng.uniform(0.5, 4.0, size=(16, 24)).astype(np.float32))
  dense, _ = geo.depth_to_world_coords(depth, K, T)
  strided, valid = geo.depth_to_world_coords(depth, K, T, stride=8)
  assert strided.shape == (2, 3, 3)
  # strided entry (i,j) equals the dense entry at the sampled pixel.
  off = (8 - 1) // 2
  np.testing.assert_allclose(
      np.asarray(strided), np.asarray(dense[off::8, off::8][:2, :3]),
      rtol=1e-5)
  assert bool(valid.all())


def test_invalid_depth_masked():
  K = geo.make_intrinsics(*geo.SEVEN_SCENES_K)
  T = jnp.eye(4)
  depth = jnp.ones((4, 4)).at[1, 2].set(0.0).at[3, 3].set(jnp.inf)
  coords, valid = geo.depth_to_world_coords(depth, K, T)
  assert not bool(valid[1, 2]) and not bool(valid[3, 3])
  np.testing.assert_array_equal(np.asarray(coords[1, 2]), 0.0)


def test_axis_angle_roundtrip():
  rng = np.random.default_rng(2)
  w = rng.normal(size=(32, 3)).astype(np.float32)
  # log map is only unique for theta < pi; scale into that range.
  w = jnp.asarray(w / np.linalg.norm(w, axis=-1, keepdims=True)
                  * rng.uniform(1e-3, np.pi - 0.05, size=(32, 1)))
  R = geo.axis_angle_to_matrix(w)
  # Orthonormal, det +1
  eye = jnp.einsum("bij,bkj->bik", R, R)
  np.testing.assert_allclose(
      np.asarray(eye), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
  w2 = geo.matrix_to_axis_angle(R)
  np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)
  # Beyond pi the vector wraps but the rotation must still match.
  w_big = jnp.asarray([[0.0, 0.0, 4.0]], jnp.float32)
  R_big = geo.axis_angle_to_matrix(w_big)
  R_rt = geo.axis_angle_to_matrix(geo.matrix_to_axis_angle(R_big))
  np.testing.assert_allclose(np.asarray(R_rt), np.asarray(R_big), atol=1e-4)


def test_axis_angle_small_angle_stable():
  w = jnp.asarray([[1e-9, -1e-9, 1e-10], [0.0, 0.0, 0.0]], jnp.float32)
  R = geo.axis_angle_to_matrix(w)
  np.testing.assert_allclose(
      np.asarray(R), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)


def test_pose_errors():
  rng = np.random.default_rng(3)
  T = jnp.asarray(random_pose(rng))
  # 5 degrees about z, 10cm translation offset
  ang = np.deg2rad(5.0)
  dR = geo.axis_angle_to_matrix(jnp.asarray([0, 0, ang], jnp.float32))
  T2 = geo.make_pose(dR @ T[:3, :3], T[:3, 3] + jnp.asarray([0.1, 0, 0]))
  np.testing.assert_allclose(float(geo.translation_error(T2, T)), 0.1,
                             rtol=1e-4)
  np.testing.assert_allclose(float(geo.rotation_error_deg(T2, T)), 5.0,
                             rtol=1e-3)


def test_rotation_error_resolves_millidegrees():
  """The arcsin/Frobenius geodesic form must resolve 0.001° (the old
  f32 arccos-of-trace form quantized at ~0.03°, so every sub-threshold
  comparison in the protocol reports collapsed to exact 0.00°)."""
  from kfnet_tpu.pose import metrics as pose_metrics
  rng = np.random.default_rng(11)
  T = jnp.asarray(random_pose(rng))
  for want_deg in (0.001, 0.002, 0.01, 0.5):
    ang = np.deg2rad(want_deg)
    axis = np.asarray([0.3, -0.5, 0.8], np.float32)
    axis /= np.linalg.norm(axis)
    dR = geo.axis_angle_to_matrix(jnp.asarray(axis * ang, jnp.float32))
    T2 = geo.make_pose(dR @ T[:3, :3], T[:3, 3])
    got = float(geo.rotation_error_deg(T2, T))
    assert abs(got - want_deg) < 0.05 * want_deg, (want_deg, got)
    # host-side f64 metric path resolves it too (reports use this)
    _, r = pose_metrics.pose_errors(np.asarray(T2)[None], np.asarray(T)[None])
    assert abs(float(r[0]) - want_deg) < 0.05 * want_deg
  # 0.001 and 0.002 are distinct measurements, not a shared quantum
  assert float(geo.rotation_error_deg(T, T)) < 1e-4
  # large angles still use the well-conditioned trace form
  dR = geo.axis_angle_to_matrix(jnp.asarray([0.0, 0.0, np.pi * 0.9],
                                            jnp.float32))
  T3 = geo.make_pose(dR @ T[:3, :3], T[:3, 3])
  np.testing.assert_allclose(float(geo.rotation_error_deg(T3, T)), 162.0,
                             rtol=1e-3)


def test_invert_pose():
  rng = np.random.default_rng(4)
  T = jnp.asarray(random_pose(rng))
  np.testing.assert_allclose(
      np.asarray(T @ geo.invert_pose(T)), np.eye(4), atol=1e-5)


def test_polar_rotation_matches_svd_reference():
  """Newton polar iteration == SVD projection for det>0 near-rotations
  (the regime our solvers feed it); exact rotations are fixed points."""
  rng = np.random.default_rng(7)
  for _ in range(20):
    w = rng.normal(size=3).astype(np.float32)
    R = np.asarray(geo.axis_angle_to_matrix(jnp.asarray(w)))
    M = R + rng.normal(size=(3, 3)).astype(np.float32) * 0.05
    if np.linalg.det(M) <= 0.05:
      continue
    got = np.asarray(geo.polar_rotation(jnp.asarray(M)))
    ref = np.asarray(geo.orthonormalize_rotation_svd(jnp.asarray(M)))
    np.testing.assert_allclose(got, ref, atol=2e-5)
    np.testing.assert_allclose(got @ got.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(got) > 0.99


def test_polar_rotation_degenerate_stays_finite():
  out = np.asarray(geo.polar_rotation(jnp.zeros((3, 3))))
  assert np.isfinite(out).all()


def test_orthonormalize_rotation_fixes_reflections():
  """det<0 inputs (garbage hypotheses) must still come out PROPER
  rotations — the polar factor alone would preserve the reflection
  (review r2)."""
  from kfnet_tpu.core import geometry

  rng = np.random.default_rng(3)
  # near-rotations with a reflection: R @ diag(1,1,-1) + noise
  R = np.asarray(geometry.orthonormalize_rotation_svd(
      jnp.asarray(rng.normal(size=(16, 3, 3)).astype(np.float32))))
  M = R * np.asarray([1.0, 1.0, -1.0], np.float32)[None, None, :]
  M = M + 0.05 * rng.normal(size=M.shape).astype(np.float32)
  out = np.asarray(geometry.orthonormalize_rotation(jnp.asarray(M)))
  dets = np.linalg.det(out)
  np.testing.assert_allclose(dets, 1.0, atol=1e-4)
  eye = np.einsum("bij,bkj->bik", out, out)
  np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                             atol=1e-4)
  # det>0 inputs are untouched by the flip: still the nearest rotation
  Mp = R + 0.05 * rng.normal(size=R.shape).astype(np.float32)
  outp = np.asarray(geometry.orthonormalize_rotation(jnp.asarray(Mp)))
  np.testing.assert_allclose(np.linalg.det(outp), 1.0, atol=1e-4)


def test_axis_angle_roundtrip_near_pi():
  """180-degree rotations: the antisymmetric part vanishes, so the log
  map must reconstruct the axis from the symmetric part (review r2 — the
  old small-sin fallback silently returned ~0 here)."""
  rng = np.random.default_rng(7)
  axes = rng.normal(size=(12, 3)).astype(np.float32)
  axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
  for theta in (np.pi, np.pi - 1e-5, np.pi - 5e-4):
    w = (theta * axes).astype(np.float32)
    R = geo.axis_angle_to_matrix(jnp.asarray(w))
    w2 = np.asarray(geo.matrix_to_axis_angle(R))
    # angle magnitude must be preserved...
    np.testing.assert_allclose(np.linalg.norm(w2, axis=-1), theta,
                               atol=2e-3)
    # ...and the round-tripped matrix must match (axis sign is ambiguous
    # at exactly pi, so compare in SO(3), not in the tangent space)
    R2 = geo.axis_angle_to_matrix(jnp.asarray(w2))
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=2e-3)
