"""Export a protocol-trained stage as a compact release artifact
(SURVEY.md §2.2 #13: the reference publishes loadable checkpoints; the
full-size stages are ~95 MB f32 each, so the shipped form is bf16 — half
the bytes, and the models compute in bf16 anyway so serving behavior is
unchanged up to one rounding of the stored weights).

    python -m kfnet_tpu.tools.export_release \
        --src .protocol_cache/full --stage stage3_sceneA \
        --out artifacts/pretrained_full/stage3_sceneA

The export is self-describing: the stage's meta.json is carried over
plus ``params_dtype`` so ``kfnet_tpu.pretrained.load`` knows to restore
template-free and cast back to the config's parameter dtypes.

Host-only: forces the CPU backend (never touches a busy TPU) and casts
in numpy (ml_dtypes).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
  import jax
  jax.config.update("jax_platforms", "cpu")  # host-side tool, always

  import ml_dtypes
  import numpy as np

  from kfnet_tpu.utils import checkpoint as ckpt_lib

  p = argparse.ArgumentParser()
  p.add_argument("--src", required=True, help="protocol --work_dir cache")
  p.add_argument("--stage", required=True, help="e.g. stage3_sceneA")
  p.add_argument("--out", required=True)
  p.add_argument("--dtype", default="bfloat16",
                 choices=("bfloat16", "float32"))
  p.add_argument("--serving_w_scale", type=float, default=None,
                 help="calibrated serving w_scale for these weights when "
                      "it differs from the KFNetConfig default (e.g. 2.0 "
                      "for norm='none' trunks — CALIBRATION.md §7); "
                      "pretrained.load applies it automatically")
  p.add_argument("--serving_chi2_threshold", type=float, default=None,
                 help="calibrated serving chi2 gate, same contract")
  args = p.parse_args(argv)

  src = os.path.join(args.src, args.stage)
  meta = ckpt_lib.load_meta(src)
  if not meta:
    raise FileNotFoundError(f"{src}: no meta.json (not a protocol export)")
  params = ckpt_lib.load_params_values(src)  # as-saved values, host-side
  if args.dtype == "bfloat16":
    cast = lambda x: np.asarray(x).astype(ml_dtypes.bfloat16)  # noqa: E731
    params = jax.tree_util.tree_map(cast, params)
  n_bytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(params))
  meta = {**meta, "params_dtype": args.dtype,
          "release_source_stage": args.stage}
  if args.serving_w_scale is not None:
    meta["serving_w_scale"] = args.serving_w_scale
  if args.serving_chi2_threshold is not None:
    meta["serving_chi2_threshold"] = args.serving_chi2_threshold
  ckpt_lib.export_params(os.path.abspath(args.out), params, meta=meta)
  print(f"exported {args.stage} -> {args.out} "
        f"({args.dtype}, {n_bytes/1e6:.1f} MB of params)")


if __name__ == "__main__":
  main()
