#!/usr/bin/env python3
"""CLI shim: python train.py --model_type=... --config=configs/config.txt"""
from smpl_nerf_tpu.cli.train import train

if __name__ == "__main__":
    train()
