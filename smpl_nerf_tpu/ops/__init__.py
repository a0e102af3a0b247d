from smpl_nerf_tpu.ops import raymesh, vertex_attention  # noqa: F401
