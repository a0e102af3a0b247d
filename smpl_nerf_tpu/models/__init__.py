from smpl_nerf_tpu.models.render_ray_net import RenderRayNet, SirenRenderRayNet  # noqa: F401
from smpl_nerf_tpu.models.warp_field_net import WarpFieldNet  # noqa: F401
from smpl_nerf_tpu.models.append_vertices_net import AppendVerticesNet  # noqa: F401
from smpl_nerf_tpu.models.smpl_estimator import SmplEstimator  # noqa: F401
from smpl_nerf_tpu.models.dummy_estimators import (  # noqa: F401
    DummyImageWiseEstimator, DummySmplEstimatorModel)
