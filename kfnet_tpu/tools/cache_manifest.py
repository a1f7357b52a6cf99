"""Checksum manifest of a protocol stage cache (round-3 verdict item 4).

The full-size protocol caches back every headline accuracy artifact, but
they are hours of TPU training and live outside git. This tool makes the
link auditable both ways:

  * ``write``  — walk a ``tools/protocol.py --work_dir`` cache and emit a
    manifest: per stage, a content hash over every file of the orbax
    export (params + meta.json), plus sizes. Committed next to the
    artifacts (docs/CACHE_MANIFEST_*.json), it records exactly WHICH
    weights produced them.
  * ``verify`` — re-walk a cache and compare against a manifest: a
    regenerated or restored cache either reproduces the recorded hashes
    (same weights → the artifacts remain valid) or fails loudly (the
    artifacts must be regenerated — ``.protocol_cache/queue``-style).

Regeneration itself is one command per seed (CLAUDE.md):
``python -m kfnet_tpu.tools.protocol --full_size --work_dir <dir>
[--seed_offset 1000]``; tests/test_cache_manifest.py proves the
train→export→manifest path is bit-deterministic at CI scale on a fixed
host, which is what makes verification meaningful.

    python -m kfnet_tpu.tools.cache_manifest write .protocol_cache/full \
        --out docs/CACHE_MANIFEST_S1.json
    python -m kfnet_tpu.tools.cache_manifest verify .protocol_cache/full \
        --manifest docs/CACHE_MANIFEST_S1.json

Hashes are over the restored PARAMETER VALUES (leaf paths + raw bytes,
path-ordered) plus the stage's meta.json — NOT the checkpoint files:
orbax/OCDBT embeds per-write UUIDs and timestamps, so two identical
exports never match at the byte level. Forces the CPU backend (hashing
must not touch a busy TPU).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os


def _stage_hash(stage_dir: str):
  """Value hash of one stage export. Returns (hexdigest, n_leaves,
  total_param_bytes)."""
  import jax
  import numpy as np

  from kfnet_tpu.utils import checkpoint as ckpt_lib

  params = ckpt_lib.load_params_values(stage_dir)
  h = hashlib.sha256()
  total = 0
  leaves = jax.tree_util.tree_leaves_with_path(params)
  for path, leaf in leaves:
    arr = np.ascontiguousarray(np.asarray(leaf))
    h.update(jax.tree_util.keystr(path).encode())
    h.update(str(arr.dtype).encode())
    h.update(str(arr.shape).encode())
    h.update(arr.tobytes())
    total += arr.nbytes
  meta = ckpt_lib.load_meta(stage_dir)
  if meta is not None:
    h.update(json.dumps(meta, sort_keys=True).encode())
  return h.hexdigest(), len(leaves), total


def build_manifest(work_dir: str) -> dict:
  stages = {}
  for name in sorted(os.listdir(work_dir)):
    d = os.path.join(work_dir, name)
    if os.path.isdir(d) and os.path.isdir(os.path.join(d, "params")):
      digest, n, size = _stage_hash(d)
      stages[name] = {"sha256": digest, "leaves": n, "param_bytes": size}
  if not stages:
    raise FileNotFoundError(f"no stage exports under {work_dir!r}")
  return {"work_dir_basename": os.path.basename(os.path.abspath(work_dir)),
          "stages": stages}


def verify_manifest(work_dir: str, manifest: dict) -> list[str]:
  """Returns mismatch descriptions (empty = cache matches manifest)."""
  problems = []
  for name, want in manifest["stages"].items():
    d = os.path.join(work_dir, name)
    if not os.path.isdir(os.path.join(d, "params")):
      problems.append(f"{name}: missing from cache")
      continue
    try:
      digest, n, size = _stage_hash(d)
    except Exception as e:  # corrupt export: orbax raises all sorts
      problems.append(f"{name}: unreadable ({type(e).__name__}: {e})")
      continue
    if digest != want["sha256"]:
      problems.append(f"{name}: hash mismatch ({digest[:12]}… != "
                      f"{want['sha256'][:12]}…)")
  return problems


def main(argv=None):
  import jax
  jax.config.update("jax_platforms", "cpu")  # host-side tool, always

  p = argparse.ArgumentParser()
  p.add_argument("mode", choices=("write", "verify"))
  p.add_argument("work_dir")
  p.add_argument("--out", default="", help="write: manifest output path")
  p.add_argument("--manifest", default="", help="verify: manifest to check")
  args = p.parse_args(argv)
  if args.mode == "verify" and not args.manifest:
    p.error("verify requires --manifest <manifest.json> "
            "(e.g. docs/CACHE_MANIFEST_S1.json)")
  if args.mode == "write":
    m = build_manifest(args.work_dir)
    text = json.dumps(m, indent=2)
    if args.out:
      with open(args.out, "w") as f:
        f.write(text + "\n")
    print(text)
    return 0
  with open(args.manifest) as f:
    m = json.load(f)
  problems = verify_manifest(args.work_dir, m)
  for pr in problems:
    print(pr)
  print("OK" if not problems else f"{len(problems)} mismatches")
  return 0 if not problems else 1


if __name__ == "__main__":
  raise SystemExit(main())
