from smpl_nerf_tpu.render.raytrace import render_scene, get_warp  # noqa: F401
