from smpl_nerf_tpu.parallel.mesh import (make_mesh, replicate_sharding,  # noqa: F401
                                         data_sharding, shard_batch)
