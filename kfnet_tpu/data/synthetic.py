"""Procedural multi-view-consistent synthetic scenes.

The reference verifies itself only against real 7-Scenes data (SURVEY.md
§4: it has no tests). This generator gives the rebuild a fully controlled
stand-in: an analytic sphere-field + back wall raycast from any camera pose
produces pixel-exact (RGB, depth, pose) triplets, so the whole ladder —
label generation → SCoordNet/OFlowNet training → recursive filtering →
PnP — can be exercised end-to-end (and benchmarked) without dataset files.
Geometry is intentionally non-coplanar (sphere field), keeping DLT-based
PnP well-conditioned.

Everything is pure jnp and jittable; rendering vmaps over frames.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from kfnet_tpu.core import geometry as geo


@dataclasses.dataclass
class SyntheticScene:
  centers: jnp.ndarray   # (S, 3)
  radii: jnp.ndarray     # (S,)
  tex_freq: jnp.ndarray  # (3, 3) texture frequency matrix
  tex_phase: jnp.ndarray  # (3,)
  wall_z: float = 3.0    # back wall (world plane z = wall_z)


def make_scene(seed: int = 0, num_spheres: int = 48,
               scale: float = 1.0) -> SyntheticScene:
  """``scale`` stretches all world geometry uniformly: scale≈20 gives a
  Cambridge-like outdoor depth range (tens of meters — BASELINE config 4's
  uncertainty-scaling stress case) while keeping the same image content
  when the trajectory is scaled with it (texture frequencies divide by
  scale so appearance stays resolution-matched)."""
  rng = np.random.default_rng(seed)
  centers = np.stack([
      rng.uniform(-2.0, 2.0, num_spheres),
      rng.uniform(-1.5, 1.5, num_spheres),
      rng.uniform(1.2, 2.8, num_spheres),
  ], -1).astype(np.float32) * scale
  radii = rng.uniform(0.15, 0.45, num_spheres).astype(np.float32) * scale
  tex_freq = rng.uniform(3.0, 9.0, (3, 3)).astype(np.float32) / scale
  tex_phase = rng.uniform(0, 2 * np.pi, 3).astype(np.float32)
  return SyntheticScene(
      jnp.asarray(centers), jnp.asarray(radii), jnp.asarray(tex_freq),
      jnp.asarray(tex_phase), wall_z=3.0 * scale)


def _texture(scene: SyntheticScene, pw: jnp.ndarray) -> jnp.ndarray:
  """Procedural RGB texture of world position (locally discriminative)."""
  phase = pw @ scene.tex_freq.T + scene.tex_phase
  base = 0.5 + 0.35 * jnp.sin(phase) + 0.15 * jnp.sin(3.1 * phase + 1.7)
  return jnp.clip(base, 0.0, 1.0)


def render(scene: SyntheticScene, T_wc: jnp.ndarray, K: jnp.ndarray,
           height: int, width: int):
  """Raycast one frame.

  Returns:
    rgb: (H, W, 3) in [0, 1]; depth: (H, W) camera z-depth (wall where no
    sphere is hit — depth is dense and always valid).
  """
  grid = geo.pixel_grid(height, width)
  # camera-frame ray directions (z = 1 plane)
  dx = (grid[..., 0] - K[0, 2]) / K[0, 0]
  dy = (grid[..., 1] - K[1, 2]) / K[1, 1]
  dirs_c = jnp.stack([dx, dy, jnp.ones_like(dx)], -1)  # (H, W, 3)
  R = T_wc[:3, :3]
  o = T_wc[:3, 3]
  dirs_w = dirs_c @ R.T  # world-frame, unnormalized (t == camera z-depth)

  # sphere intersections: solve |o + t d - c|^2 = r^2 for each sphere.
  oc = o - scene.centers  # (S, 3)
  d2 = jnp.sum(dirs_w * dirs_w, -1)[..., None]                 # (H, W, 1)
  b = jnp.einsum("hwk,sk->hws", dirs_w, oc)                    # (H, W, S)
  c = jnp.sum(oc * oc, -1) - scene.radii ** 2                  # (S,)
  disc = b * b - d2 * c
  sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
  t_hit = (-b - sqrt_disc) / d2
  t_hit = jnp.where((disc > 0) & (t_hit > 1e-3), t_hit, jnp.inf)
  t_sphere = jnp.min(t_hit, axis=-1)

  # back wall: plane z = wall_z in world.
  denom = dirs_w[..., 2]
  t_wall = (scene.wall_z - o[2]) / jnp.where(
      jnp.abs(denom) < 1e-6, 1e-6, denom)
  t_wall = jnp.where(t_wall > 1e-3, t_wall, jnp.inf)

  t = jnp.minimum(t_sphere, t_wall)
  t = jnp.where(jnp.isfinite(t), t, 10.0)
  pw = o + t[..., None] * dirs_w
  rgb = _texture(scene, pw)
  # camera z-depth (not ray length): dirs_w has camera-z component 1 by
  # construction in camera frame, so depth = t.
  return rgb, t


def orbit_trajectory(num_frames: int, seed: int = 1,
                     radius: float = 1.2,
                     scale: float = 1.0,
                     duration: float = 1.0) -> jnp.ndarray:
  """Smooth camera trajectory: slow orbit in front of the scene, looking
  at the scene center, with small smooth jitter. Returns (T, 4, 4) T_wc.
  ``scale`` must match make_scene's (positions stretch with the world).

  ``duration`` stretches the time parameter: num_frames=480,duration=10
  has the SAME per-frame motion as num_frames=48,duration=1 (the orbit
  terms are periodic in s, the jitter harmonics are not, so long runs
  keep exploring fresh poses) — extending a test sequence for statistical
  power must NOT shrink inter-frame flow, or the filtering problem gets
  easier as it gets longer."""
  rng = np.random.default_rng(seed)
  ts = np.linspace(0, duration, num_frames)
  look_at = np.array([0.0, 0.0, 2.0], np.float32) * scale
  jitter = rng.normal(size=(3, 3)).astype(np.float32) * 0.05 * scale
  poses = []
  for i, s in enumerate(ts):
    ang = 0.6 * np.sin(2 * np.pi * s)
    pos = np.array([radius * np.sin(ang),
                    0.3 * np.sin(4 * np.pi * s),
                    -1.0 + 0.2 * np.cos(2 * np.pi * s)], np.float32) * scale
    pos = pos + (jitter @ np.array([np.sin(7 * s), np.cos(11 * s),
                                    np.sin(13 * s)], np.float32))
    fwd = look_at - pos
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0], np.float32)
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    # camera axes: x=right, y=down (image v), z=forward
    R = np.stack([right, down, fwd], -1).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = pos
    poses.append(T)
  return jnp.asarray(np.stack(poses))


def make_sequence(num_frames: int, height: int = 48, width: int = 64,
                  seed: int = 0, fov_scale: float = 1.0,
                  scale: float = 1.0, traj_seed: int | None = None,
                  duration: float = 1.0, K: jnp.ndarray | None = None):
  """Render a full sequence: dict(images (T,H,W,3), depths (T,H,W),
  poses (T,4,4), K (3,3)). ``scale`` > 1 gives an outdoor-scale world;
  ``duration`` > 1 extends the trajectory at constant per-frame motion
  (see orbit_trajectory). Pass ``K`` to render under an exact camera
  (e.g. the on-disk 7-Scenes preset for fixtures) instead of the default
  resolution-scaled one."""
  scene = make_scene(seed, scale=scale)
  if K is None:
    # scale 7-Scenes intrinsics to the requested resolution.
    sx, sy = width / 640.0, height / 480.0
    K = jnp.asarray([[585.0 * sx * fov_scale, 0.0, width / 2.0 - 0.5],
                     [0.0, 585.0 * sy * fov_scale, height / 2.0 - 0.5],
                     [0.0, 0.0, 1.0]], jnp.float32)
  else:
    K = jnp.asarray(K, jnp.float32)
  poses = orbit_trajectory(
      num_frames, seed=(seed + 1 if traj_seed is None else traj_seed),
      scale=scale, duration=duration)
  # Render in fixed-size chunks: the raycaster's (H, W, S) sphere-
  # intersection intermediate is ~60 MB/frame at 640x480, so one vmap
  # over a 480-frame statistical-power sequence would need ~28 GB of
  # HBM. Chunking bounds peak memory at chunk x 60 MB with ONE compile
  # (poses pad to a chunk multiple; padded outputs are dropped).
  chunk = min(48, num_frames)
  vrender = jax.jit(jax.vmap(lambda T: render(scene, T, K, height, width)))
  pad = (-num_frames) % chunk
  padded = (jnp.concatenate([poses, jnp.repeat(poses[-1:], pad, 0)])
            if pad else poses)
  rgb_chunks, depth_chunks = [], []
  for i in range(0, padded.shape[0], chunk):
    r, d = vrender(padded[i:i + chunk])
    rgb_chunks.append(r)
    depth_chunks.append(d)
  rgbs = jnp.concatenate(rgb_chunks)[:num_frames]
  depths = jnp.concatenate(depth_chunks)[:num_frames]
  return {"images": rgbs, "depths": depths, "poses": poses, "K": K}
