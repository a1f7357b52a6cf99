"""Self-contained end-to-end demo — no dataset files needed.

Trains a small SCoordNet on a procedural synthetic scene
(data/synthetic.py), then runs the full recursive filter + PnP over a
held-out camera trajectory and prints a JSON report (median pose error,
fps). Finishes in ~2 minutes on a TPU chip, ~10 on CPU.

    python -m kfnet_tpu.tools.demo [--steps 1500] [--height 96] [--width 128]
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np

from kfnet_tpu.data import labels, synthetic
from kfnet_tpu.eval import eval_sequence
from kfnet_tpu.models import kfnet, oflownet, scoordnet
from kfnet_tpu.pose import ransac
from kfnet_tpu.train import objectives, trainer


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument("--steps", type=int, default=1500)
  p.add_argument("--oflownet_steps", type=int, default=1000)
  p.add_argument("--height", type=int, default=96)
  p.add_argument("--width", type=int, default=128)
  p.add_argument("--train_frames", type=int, default=48)
  p.add_argument("--test_frames", type=int, default=48)
  p.add_argument("--learning_rate", type=float, default=2e-3)
  p.add_argument("--save", default="", help="save trained params here")
  args = p.parse_args(argv)
  H, W = args.height, args.width

  scene = synthetic.make_scene(0)
  train = synthetic.make_sequence(args.train_frames, height=H, width=W,
                                  seed=0)
  K = train["K"]
  test_poses = synthetic.orbit_trajectory(args.test_frames, seed=99)
  render = jax.jit(lambda T: synthetic.render(scene, T, K, H, W))
  test_imgs, test_depths = jax.vmap(render)(test_poses)
  test_coords, test_valid = jax.vmap(
      lambda d, T: labels.generate(d, K, T, stride=8))(
          test_depths, test_poses)

  coords, valid = jax.vmap(
      lambda d, T: labels.generate(d, K, T, stride=8))(
          train["depths"], train["poses"])
  mean, std = labels.scene_statistics([np.asarray(coords)],
                                      [np.asarray(valid)])
  sc_cfg = scoordnet.SCoordNetConfig(
      channels=(16, 16, 32, 32, 64, 64), strides=(1, 2, 1, 2, 1, 2),
      head_channels=64, compute_dtype="float32",
      coord_offset=tuple(map(float, mean)), coord_scale=float(std))
  params_sc = scoordnet.init(jax.random.key(0), sc_cfg, (H, W, 3))
  loss_fn = objectives.scoordnet_objective(sc_cfg)
  opt = trainer.make_optimizer(
      trainer.OptimizerConfig(learning_rate=args.learning_rate))
  step_fn = trainer.make_train_step(loss_fn, opt)
  state = trainer.create_state(params_sc, opt)
  rng = np.random.default_rng(0)
  batch_all = {"image": train["images"], "coords": coords, "valid": valid}
  for step in range(1, args.steps + 1):
    idx = rng.integers(0, args.train_frames, size=8)
    state, m = step_fn(state, {k: v[idx] for k, v in batch_all.items()})
    if step % 500 == 0:
      print(f"step {step}: coord_err={float(m['coord_err_m']):.4f} m")

  of_cfg = oflownet.OFlowNetConfig(
      encoder_channels=(16, 16, 32), encoder_strides=(2, 2, 2),
      search_radius=2, unet_channels=(16, 16, 32), compute_dtype="float32")
  of_params = oflownet.init(jax.random.key(1), of_cfg, (H, W, 3))

  if args.oflownet_steps > 0:
    # stage 2: process system on consecutive pairs of the training video
    of_loss = objectives.oflownet_objective(of_cfg, flow_reg_weight=0.01)
    of_opt = trainer.make_optimizer(
        trainer.OptimizerConfig(learning_rate=args.learning_rate))
    of_step = trainer.make_train_step(of_loss, of_opt)
    of_state = trainer.create_state(of_params, of_opt)
    pair_all = {
        "image_prev": train["images"][:-1], "image": train["images"][1:],
        "coords_prev": coords[:-1], "valid_prev": valid[:-1],
        "coords": coords[1:], "valid": valid[1:]}
    for step in range(1, args.oflownet_steps + 1):
      idx = rng.integers(0, args.train_frames - 1, size=8)
      of_state, m = of_step(of_state,
                            {k: v[idx] for k, v in pair_all.items()})
      if step % 500 == 0:
        print(f"oflownet step {step}: warp_err="
              f"{float(m['warp_err_m']):.4f} m "
              f"supervised={float(m['supervised_frac']):.2f}")
    of_params = of_state.params

  cfg = kfnet.KFNetConfig(scoordnet=sc_cfg, oflownet=of_cfg)
  params = {"scoordnet": state.params, "oflownet": of_params}

  rcfg = ransac.RansacConfig(num_hypotheses=256, top_k=512)
  res_m = eval_sequence.evaluate_measurement_only(
      params, cfg, test_imgs, K, gt_poses=np.asarray(test_poses),
      scene="synthetic(measurement-only)", ransac_config=rcfg)
  res_f = eval_sequence.evaluate_sequence(
      params, cfg, test_imgs, K, gt_poses=np.asarray(test_poses),
      scene="synthetic(filtered)", ransac_config=rcfg)
  for res in (res_m, res_f):
    res.report.update(eval_sequence.coord_accuracy_report(
        res.coords, np.asarray(test_coords), np.asarray(test_valid)))
    print(json.dumps(res.report, indent=2))
  if args.save:
    from kfnet_tpu.utils import checkpoint as ckpt_lib
    ckpt_lib.save_params(args.save, params)
    print("saved params to", args.save)


if __name__ == "__main__":
  main()
