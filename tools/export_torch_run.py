#!/usr/bin/env python3
"""Export a run directory's checkpoints to reference-layout torch .pt files.

Inverse of the torch->jax import shim: lets a user validate weights trained in
this framework inside the PyTorch reference (its solvers/inference load
model_coarse.pt / model_fine.pt / model_warp_field.pt state_dicts — reference
utils.py save_run contract). Migration works in both directions.

Usage:
  python tools/export_torch_run.py --run_dir runs/<run>[/best] --out /tmp/torch_run
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smpl_nerf_tpu._platform import apply_platform_env

apply_platform_env()

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from smpl_nerf_tpu.training.checkpoints import export_torch_run
    written = export_torch_run(args.run_dir, args.out)
    if not written:
        sys.exit(f"no exportable model_*.msgpack checkpoints in {args.run_dir}")
    for name, path in written.items():
        print(f"{name} -> {path}")


if __name__ == "__main__":
    main()
