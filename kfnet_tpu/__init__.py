"""kfnet_tpu — a TPU-native (JAX/XLA/Pallas) framework for temporal camera
relocalization with the capabilities of zlthinker/KFNet (CVPR 2020,
arXiv:2003.10629).

Design (see SURVEY.md §7): one pure-functional core —
  * models are parameter pytrees + apply fns (``kfnet_tpu.nn`` toolkit),
  * the recursive Kalman filter is a ``lax.scan`` step (``kfnet_tpu.filter``),
  * the hot warp+gain+update inner step is a fused Pallas kernel
    (``kfnet_tpu.kernels.fused_filter``),
  * PnP-RANSAC pose solving is a batched, vmapped JAX routine
    (``kfnet_tpu.pose``),
  * training is jit-compiled update fns sharded with pjit/GSPMD
    (``kfnet_tpu.train``, ``kfnet_tpu.parallel``).

The reference is a single-GPU TF1 research codebase (SURVEY.md §2); this is a
ground-up TPU-first redesign, not a translation.
"""

__version__ = "0.1.0"
