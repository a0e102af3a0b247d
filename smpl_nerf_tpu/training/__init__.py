from smpl_nerf_tpu.training.factory import build_models_and_params  # noqa: F401
from smpl_nerf_tpu.training.solver import Solver  # noqa: F401
