"""Flagship inference path: recursive filtering of a test sequence + per
frame PnP pose solve + per-scene median report (reference: ``KFNet/eval.py``
+ ``tools/`` pose eval, SURVEY.md §3.3/§3.4 — rebuilt as device-resident
scan + batched RANSAC, no per-frame host round trips).
"""

from __future__ import annotations

import dataclasses
import json
import time
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from kfnet_tpu.filter import sequence
from kfnet_tpu.models import kfnet
from kfnet_tpu.pose import metrics as pose_metrics
from kfnet_tpu.pose import ransac


def make_pose_solver(K, stride: int = 8,
                     config: ransac.RansacConfig = ransac.RansacConfig()):
  """One jitted, vmapped per-frame PnP-RANSAC over stacked maps —
  (coords (T,h,w,3), covariance (T,h,w,1), keys (T,)) → ransac output
  dict. THE shared pose-solve entry for batch/streaming/measurement eval,
  the benchmark, and the offline dump tool (validity is all-ones: map
  cells are weighted by covariance inside the solver).

  Cached per (K, stride, config): eval drivers call this once per test
  SEQUENCE, and a fresh jit wrapper each time would recompile the whole
  vmapped RANSAC even for identical shapes (minutes per sequence under
  the remote-compile TPU backend)."""
  K_flat = tuple(float(v) for v in np.asarray(K).reshape(-1))
  return _pose_solver_cached(K_flat, stride, config)


@lru_cache(maxsize=None)
def _pose_solver_cached(K_flat: tuple, stride: int,
                        config: ransac.RansacConfig):
  K = jnp.asarray(K_flat, jnp.float32).reshape(3, 3)
  return jax.jit(jax.vmap(
      lambda c, P, k: ransac.solve_pnp_from_maps(
          c, P, jnp.ones_like(P, bool), K, k, stride=stride,
          config=config)))


@lru_cache(maxsize=None)
def _filter_run_jit(config: kfnet.KFNetConfig):
  """Per-config cached jit of the filter scan (same rationale as
  _pose_solver_cached — one compile serves every same-shape sequence)."""
  return jax.jit(lambda p, im: sequence.run_filter(p, config, im)[:2])


@lru_cache(maxsize=None)
def _measure_chunk_jit(config: kfnet.KFNetConfig):
  return jax.jit(
      lambda p, im: jax.vmap(lambda i: kfnet.measure(p, config, i))(im))


def measure_chunked(params, config: kfnet.KFNetConfig, images,
                    chunk_size: int = 64):
  """SCoordNet over a (T, H, W, 3) stack in fixed-size chunks.

  vmapping the whole sequence at once materializes a batch-T conv
  forward — tens of GB of activations for a real 1000-frame 640x480
  test sequence. Chunking bounds activation memory at O(chunk) while a
  single compiled (chunk, H, W, 3) executable serves every chunk (the
  tail is padded, then trimmed). ``images`` may be a host (numpy) stack
  — chunks transfer one at a time, so this is also the memory-bounded
  streaming form for measurement-only eval.
  """
  T = images.shape[0]
  chunk = max(1, min(int(chunk_size), T))
  measure = _measure_chunk_jit(config)
  zs, Vs = [], []
  for s in range(0, T, chunk):
    sl = jnp.asarray(images[s:s + chunk])
    n = sl.shape[0]
    if n < chunk:  # pad the ragged tail to keep ONE compiled shape
      sl = jnp.concatenate([sl, jnp.repeat(sl[-1:], chunk - n, axis=0)])
    z, V = measure(params, sl)
    zs.append(z[:n])
    Vs.append(V[:n])
  if len(zs) == 1:
    return zs[0], Vs[0]
  return jnp.concatenate(zs), jnp.concatenate(Vs)


@dataclasses.dataclass
class EvalResult:
  poses: np.ndarray          # (T, 4, 4) estimated camera-to-world
  coords: np.ndarray         # (T, h, w, 3) fused coordinate maps
  covariance: np.ndarray     # (T, h, w, 1)
  frames_per_sec: float
  report: dict | None = None


def evaluate_sequence(params, config: kfnet.KFNetConfig,
                      images: jnp.ndarray, K: jnp.ndarray,
                      gt_poses: np.ndarray | None = None,
                      scene: str = "",
                      ransac_config: ransac.RansacConfig = ransac.RansacConfig(),
                      stride: int = 8,
                      rng: jax.Array | None = None,
                      timing_reps: int = 3) -> EvalResult:
  """Filter a (T, H, W, 3) sequence and solve a pose per frame.

  The filter scan and the vmapped PnP solve are two jit regions; fused
  maps stay on device between them. fps is median-of-``timing_reps``
  after one warmup (same protocol as bench.py — single-rep numbers on
  this sandbox's tunnel jitter by ~5%).
  """
  rng = rng if rng is not None else jax.random.key(0)

  run = _filter_run_jit(config)
  solve = make_pose_solver(K, stride=stride, config=ransac_config)

  from kfnet_tpu.utils.timing import sync

  # warmup compile of BOTH stages (excluded from timing)
  keys = jax.random.split(rng, images.shape[0])
  xs, Ps = run(params, images)
  out = solve(xs, Ps, keys)
  sync(out["T_wc"])
  dts = []
  for _ in range(max(1, timing_reps)):
    t0 = time.perf_counter()
    xs, Ps = run(params, images)
    out = solve(xs, Ps, keys)
    sync(out["T_wc"])
    dts.append(time.perf_counter() - t0)
  fps = images.shape[0] / float(np.median(dts))

  poses = np.asarray(out["T_wc"])
  result = EvalResult(
      poses=poses, coords=np.asarray(xs), covariance=np.asarray(Ps),
      frames_per_sec=fps)
  if gt_poses is not None:
    result.report = pose_metrics.report(scene, poses, np.asarray(gt_poses))
    result.report["frames_per_sec"] = fps
  return result


def evaluate_measurement_only(params, config: kfnet.KFNetConfig,
                              images: jnp.ndarray, K: jnp.ndarray,
                              gt_poses: np.ndarray | None = None,
                              scene: str = "",
                              ransac_config=ransac.RansacConfig(),
                              stride: int = 8,
                              rng: jax.Array | None = None,
                              timing_reps: int = 3,
                              chunk_size: int = 64) -> EvalResult:
  """SCoordNet-only ablation (no temporal filter) — the reference's
  single-frame baseline row (SURVEY.md §6). fps is median-of-
  ``timing_reps`` after one warmup, matching ``evaluate_sequence``.

  The measurement pass is CHUNKED (see measure_chunked): real test
  sequences run ~1000 frames, and a whole-sequence vmap would OOM on
  conv activations alone. ``images`` may therefore also be a host-
  resident numpy stack (the streaming form)."""
  rng = rng if rng is not None else jax.random.key(0)
  solve = make_pose_solver(K, stride=stride, config=ransac_config)
  from kfnet_tpu.utils.timing import sync

  keys = jax.random.split(rng, images.shape[0])
  zs, Vs = measure_chunked(params, config, images, chunk_size=chunk_size)
  out = solve(zs, Vs, keys)
  sync(out["T_wc"])
  dts = []
  for _ in range(max(1, timing_reps)):
    t0 = time.perf_counter()
    zs, Vs = measure_chunked(params, config, images,
                             chunk_size=chunk_size)
    out = solve(zs, Vs, keys)
    sync(out["T_wc"])
    dts.append(time.perf_counter() - t0)
  fps = images.shape[0] / float(np.median(dts))
  poses = np.asarray(out["T_wc"])
  result = EvalResult(poses=poses, coords=np.asarray(zs),
                      covariance=np.asarray(Vs), frames_per_sec=fps)
  if gt_poses is not None:
    result.report = pose_metrics.report(scene, poses, np.asarray(gt_poses))
    result.report["frames_per_sec"] = fps
  return result


def evaluate_sequence_streaming(params, config: kfnet.KFNetConfig,
                                frame_source, K: jnp.ndarray,
                                gt_poses: np.ndarray | None = None,
                                scene: str = "",
                                ransac_config=ransac.RansacConfig(),
                                stride: int = 8,
                                chunk_size: int = 32,
                                rng: jax.Array | None = None) -> EvalResult:
  """Memory-bounded eval for arbitrarily long sequences: frames stream
  from the host through the chunked scan (O(chunk) HBM — SURVEY.md §5
  long-context row); poses solve per chunk. Timing includes host
  transfer, so fps here is a streaming number, not the kernel number.
  """
  rng = rng if rng is not None else jax.random.key(0)
  solve = make_pose_solver(K, stride=stride, config=ransac_config)
  xs_all, Ps_all, poses = [], [], []
  t0 = time.perf_counter()

  from kfnet_tpu.filter import sequence as seq_lib
  # whole-chunk consumption: maps stay on device between the filter and
  # the PnP solve; no per-frame slicing (≈2 dispatches/frame saved).
  for xs, Ps in seq_lib.run_filter_chunked_arrays(
      params, config, frame_source, chunk_size=chunk_size):
    keys = jax.random.split(jax.random.fold_in(rng, len(poses)),
                            xs.shape[0])
    out = solve(xs, Ps, keys)
    poses.extend(np.asarray(out["T_wc"]))
    xs_all.append(np.asarray(xs))
    Ps_all.append(np.asarray(Ps))
  dt = time.perf_counter() - t0
  poses = np.stack(poses)
  result = EvalResult(
      poses=poses, coords=np.concatenate(xs_all),
      covariance=np.concatenate(Ps_all),
      frames_per_sec=poses.shape[0] / dt)
  if gt_poses is not None:
    result.report = pose_metrics.report(scene, poses, np.asarray(gt_poses))
    result.report["frames_per_sec"] = result.frames_per_sec
  return result


def coord_accuracy_report(coords: np.ndarray, gt_coords: np.ndarray,
                          valid: np.ndarray,
                          thresholds_m=(0.02, 0.05, 0.10)) -> dict:
  """Per-sequence coordinate-map accuracy stats — the reference's
  ``SCoordNet/eval.py`` per-image accuracy output (SURVEY.md §2.2 #5).

  Args:
    coords/gt_coords: (T, h, w, 3); valid: (T, h, w) bool.
  """
  err = np.linalg.norm(np.asarray(coords) - np.asarray(gt_coords), axis=-1)
  v = np.asarray(valid).astype(bool)
  errs = err[v]
  out = {
      "valid_pixels": int(v.sum()),
      "mean_coord_err_m": float(errs.mean()) if errs.size else float("nan"),
      "median_coord_err_m":
          float(np.median(errs)) if errs.size else float("nan"),
  }
  for t in thresholds_m:
    out[f"frac_within_{int(t*100)}cm"] = (
        float((errs <= t).mean()) if errs.size else 0.0)
  return out


def write_report(path: str, reports: list[dict]):
  with open(path, "w") as f:
    json.dump({"scenes": reports}, f, indent=2)
