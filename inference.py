#!/usr/bin/env python3
"""CLI shim: python inference.py --inf_run_dir=runs/... --inf_ground_truth_dir=data/val"""
from smpl_nerf_tpu.cli.inference import inference

if __name__ == "__main__":
    inference()
