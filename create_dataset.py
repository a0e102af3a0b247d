#!/usr/bin/env python3
"""CLI shim: python create_dataset.py --dataset_type=smpl_nerf --save_dir=data ...

Same flag surface as the reference's create_dataset.py.
"""
from smpl_nerf_tpu._platform import apply_platform_env

apply_platform_env()  # honor JAX_PLATFORMS=cpu despite the axon plugin

from smpl_nerf_tpu.config import dataset_config_parser
from smpl_nerf_tpu.data.generate import create_dataset

if __name__ == "__main__":
    parser = dataset_config_parser()
    args = parser.parse_args()
    create_dataset(args, parser)
