from smpl_nerf_tpu.core import cameras, encoding, gmm, integrate, rays, sampling  # noqa: F401
