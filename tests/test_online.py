import jax
import numpy as np

from kfnet_tpu.eval.online import OnlineRelocalizer
from kfnet_tpu.filter import sequence
from kfnet_tpu.models import kfnet
from kfnet_tpu.pose import ransac
from tests import tiny_configs as tc


def test_online_matches_offline_filter_state():
  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(5), cfg, tc.IMG)
  imgs = tc.random_images(4, seed=6)
  xs, Ps, _ = sequence.run_filter(params, cfg, imgs)

  K = np.asarray([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
  reloc = OnlineRelocalizer(params, cfg, K, solve_pose=False)
  for t in range(4):
    pose, info = reloc.process(np.asarray(imgs[t]))
    assert pose is None
    x, P, _ = reloc.state
    # per-frame jit vs scanned compile fuse differently: last-ulp tolerance
    np.testing.assert_allclose(np.asarray(x), np.asarray(xs[t]),
                               rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(P), np.asarray(Ps[t]),
                               rtol=1e-5, atol=2e-5)
  assert info["frame"] == 3


def test_online_pose_and_reset():
  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(7), cfg, tc.IMG)
  imgs = tc.random_images(2, seed=8)
  K = np.asarray([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
  reloc = OnlineRelocalizer(
      params, cfg, K, solve_pose=True,
      ransac_config=ransac.RansacConfig(num_hypotheses=16, top_k=32))
  pose, info = reloc.process(np.asarray(imgs[0]))
  assert pose.shape == (4, 4)
  assert "inlier_ratio" in info
  reloc.reset()
  pose2, info2 = reloc.process(np.asarray(imgs[1]))
  assert info2["consistent_frac"] == 0.0  # measurement-only after reset


def test_fleet_matches_independent_streams():
  """FleetRelocalizer (B slots in lockstep) must track B independent
  single-stream filters exactly, including a mid-stream per-slot reset."""
  from kfnet_tpu.eval.online import FleetRelocalizer

  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(9), cfg, tc.IMG)
  streams = [tc.random_images(4, seed=30 + b) for b in range(3)]

  fleet = FleetRelocalizer(params, cfg, np.eye(3, dtype=np.float32),
                           batch_size=3, solve_pose=False)
  for t in range(4):
    tick = np.stack([np.asarray(s[t]) for s in streams])
    # slot 2 restarts its session at frame 2
    reset = np.array([False, False, t == 2])
    _, info = fleet.process(tick, reset=reset)
  x, P, _ = fleet.state

  # slots 0/1: plain filtered streams
  for b in range(2):
    xs, Ps, _ = sequence.run_filter(params, cfg, streams[b])
    np.testing.assert_allclose(np.asarray(x[b]), np.asarray(xs[-1]),
                               rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(P[b]), np.asarray(Ps[-1]),
                               rtol=1e-5, atol=2e-5)
  # slot 2: a fresh sequence starting at its frame 2
  xs2, Ps2, _ = sequence.run_filter(params, cfg, streams[2][2:])
  np.testing.assert_allclose(np.asarray(x[2]), np.asarray(xs2[-1]),
                             rtol=1e-5, atol=2e-5)
  np.testing.assert_allclose(np.asarray(P[2]), np.asarray(Ps2[-1]),
                             rtol=1e-5, atol=2e-5)
  assert info["consistent_frac"].shape == (3,)


def test_fleet_pose_solve_and_mesh():
  """Pose solving returns per-slot poses; with a mesh the slot axis
  shards over the devices (zero-collective DP serving)."""
  from kfnet_tpu.eval.online import FleetRelocalizer
  from kfnet_tpu.parallel import mesh as mesh_lib

  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(11), cfg, tc.IMG)
  K = np.asarray([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
  mesh = mesh_lib.make_mesh(8)
  fleet = FleetRelocalizer(
      params, cfg, K, batch_size=8, mesh=mesh,
      ransac_config=ransac.RansacConfig(num_hypotheses=16, top_k=32))
  imgs = np.stack([np.asarray(tc.random_images(1, seed=40 + b)[0])
                   for b in range(8)])
  poses, info = fleet.process(imgs)
  poses, info = fleet.process(imgs)
  assert poses.shape == (8, 4, 4)
  assert np.isfinite(poses).all()
  assert info["inlier_ratio"].shape == (8,)
  x, _, _ = fleet.state
  assert len(x.addressable_shards) == 8


def test_fleet_pipelined_matches_sync_shifted():
  """pipeline_depth=1: identical per-tick results, delivered one call
  late; flush() drains the tail; reset() discards in-flight results."""
  from kfnet_tpu.eval.online import FleetRelocalizer
  from kfnet_tpu.pose import smoothing

  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(9), cfg, tc.IMG)
  streams = [tc.random_images(5, seed=70 + b) for b in range(2)]
  K = np.asarray([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
  rcfg = ransac.RansacConfig(num_hypotheses=16, top_k=32)
  scfg = smoothing.SmootherConfig(beta=0.4)
  resets = [None, None, np.array([False, True]), None, None]

  def run(depth):
    fleet = FleetRelocalizer(params, cfg, K, batch_size=2, seed=11,
                             ransac_config=rcfg, smoother=scfg,
                             pipeline_depth=depth)
    out = []
    for t in range(5):
      tick = np.stack([np.asarray(s[t]) for s in streams])
      poses, info = fleet.process(tick, reset=resets[t])
      if poses is None:
        assert info["pending"] and info["lag"] == depth
      else:
        out.append((info["tick"], poses, info))
    for poses, info in fleet.flush():
      out.append((info["tick"], poses, info))
    return out

  sync_out = run(0)
  pipe_out = run(1)
  assert len(sync_out) == len(pipe_out) == 5
  for (ts, ps, infs), (tp, pp, infp) in zip(sync_out, pipe_out):
    assert ts == tp
    np.testing.assert_allclose(pp, ps, atol=1e-9)
    np.testing.assert_allclose(infp["consistent_frac"],
                               infs["consistent_frac"], atol=1e-7)

  # reset() discards pending results
  fleet = FleetRelocalizer(params, cfg, K, batch_size=2, seed=11,
                           ransac_config=rcfg, pipeline_depth=1)
  tick = np.stack([np.asarray(s[0]) for s in streams])
  poses, info = fleet.process(tick)
  assert poses is None and info["pending"]
  fleet.reset()
  assert fleet.flush() == []
  poses, info = fleet.process(tick)  # fresh session, pipeline refills
  assert poses is None and info["tick"] == 1


def test_online_smoother_reduces_scatter_and_resets():
  """OnlineRelocalizer(smoother=...): identical filter state, smoothed
  output trajectory; reset() drops the smoother history too."""
  from kfnet_tpu.pose import smoothing

  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(7), cfg, tc.IMG)
  imgs = tc.random_images(5, seed=8)
  K = np.asarray([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
  rcfg = ransac.RansacConfig(num_hypotheses=16, top_k=32)
  raw = OnlineRelocalizer(params, cfg, K, ransac_config=rcfg)
  smo = OnlineRelocalizer(
      params, cfg, K, ransac_config=rcfg,
      smoother=smoothing.SmootherConfig(beta=0.4))
  raw_poses, smo_poses = [], []
  for t in range(5):
    raw_poses.append(raw.process(np.asarray(imgs[t]))[0])
    smo_poses.append(smo.process(np.asarray(imgs[t]))[0])
  # same solver, same rng stream: frame 0 identical, later frames blend
  np.testing.assert_allclose(smo_poses[0], raw_poses[0], atol=1e-12)
  # offline smoothing of the raw trajectory == the streaming outputs
  off = smoothing.smooth_trajectory(np.stack(raw_poses),
                                    smoothing.SmootherConfig(beta=0.4))
  np.testing.assert_allclose(np.stack(smo_poses), off, atol=1e-9)
  smo.reset()
  pose, info = smo.process(np.asarray(imgs[0]))
  assert info["consistent_frac"] == 0.0
  assert pose.shape == (4, 4)


def test_fleet_smoother_per_slot_reset():
  """FleetRelocalizer per-slot smoothing: a reset slot's smoother
  restarts (its post-reset poses match a fresh single stream's)."""
  from kfnet_tpu.eval.online import FleetRelocalizer
  from kfnet_tpu.pose import smoothing

  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(9), cfg, tc.IMG)
  streams = [tc.random_images(4, seed=60 + b) for b in range(2)]
  K = np.asarray([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
  rcfg = ransac.RansacConfig(num_hypotheses=16, top_k=32)
  scfg = smoothing.SmootherConfig(beta=0.4)

  fleet = FleetRelocalizer(params, cfg, K, batch_size=2,
                           ransac_config=rcfg, smoother=scfg, seed=11)
  ticks = []
  for t in range(4):
    tick = np.stack([np.asarray(s[t]) for s in streams])
    reset = np.array([False, t == 2])  # slot 1 restarts at frame 2
    poses, _ = fleet.process(tick, reset=reset)
    ticks.append(poses)
  # replay without smoothing to get the raw per-slot trajectories
  raw_fleet = FleetRelocalizer(params, cfg, K, batch_size=2,
                               ransac_config=rcfg, seed=11)
  raw = []
  for t in range(4):
    tick = np.stack([np.asarray(s[t]) for s in streams])
    poses, _ = raw_fleet.process(tick, reset=np.array([False, t == 2]))
    raw.append(poses)
  raw = np.stack(raw)      # (T, B, 4, 4)
  got = np.stack(ticks)
  # slot 0: plain streaming smoothing of its raw trajectory
  off0 = smoothing.smooth_trajectory(raw[:, 0], scfg)
  np.testing.assert_allclose(got[:, 0], off0, atol=1e-9)
  # slot 1: smoother history restarts at the reset frame
  reset_mask = np.array([False, False, True, False])
  off1 = smoothing.smooth_trajectory(raw[:, 1], scfg, reset=reset_mask)
  np.testing.assert_allclose(got[:, 1], off1, atol=1e-9)
