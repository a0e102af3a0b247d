from smpl_nerf_tpu.data.datasets import RayData, load_dataset  # noqa: F401
