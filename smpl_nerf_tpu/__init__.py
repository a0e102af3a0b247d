"""smpl_nerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for SMPL-conditioned NeRF.

Brand-new implementation of the capabilities of HannesStark/SMPL-NeRF
(reference mounted read-only at /root/reference): training and rendering neural
radiance fields of a human that generalize over both camera viewpoint and SMPL
body pose.

Architecture (TPU-first, not a port):
  core/       pure-jnp ray math: cameras, rays, positional encoding, coarse &
              hierarchical sampling, alpha-composite volume integration.
  ops/        hot ops: fused Pallas inverse-CDF sampler (replaces the
              reference's torchsearchsorted CUDA extension), batched
              ray-mesh intersection (replaces trimesh's RayMeshIntersector),
              vertex-distance attention kernel.
  models/     flax modules: RenderRayNet / SIREN variant / WarpFieldNet /
              SmplEstimator CNN / dummy estimators, and a differentiable
              JAX SMPL body model (LBS) replacing the smplx dependency.
  render/     JAX ray-traced mesh renderer replacing pyrender for synthetic
              dataset generation (runs on TPU), incl. ground-truth warps.
  data/       dataset generation + loading; rays live device-resident, batches
              are gathers — no per-batch host->device copies.
  training/   jitted train_step factories per model family + epoch driver +
              checkpointing (run-dir contract matches the reference).
  parallel/   jax.sharding Mesh / NamedSharding layer: ray-megabatch data
              parallelism, optional model axis.
  evaluation/ PSNR / SSIM / LPIPS scores.
  config.py   configargparse-compatible flag surface (same flag names as
              /root/reference/config_parser.py).
"""

__version__ = "0.1.0"
