"""Console entry point for dataset generation (mirrors top-level create_dataset.py).

Same flag surface as the reference's create_dataset.py
(/root/reference/create_dataset.py:1-60); installed as `smplnerf-create-dataset`.
"""
from smpl_nerf_tpu._platform import apply_platform_env

apply_platform_env()  # honor JAX_PLATFORMS=cpu despite the axon plugin


def main(argv=None):
    from smpl_nerf_tpu.config import dataset_config_parser
    from smpl_nerf_tpu.data.generate import create_dataset

    parser = dataset_config_parser()
    args = parser.parse_args(argv)
    create_dataset(args, parser)


if __name__ == "__main__":
    main()
