"""Make the JAX_PLATFORMS env var reliable.

The axon TPU plugin in this image ignores the JAX_PLATFORMS environment
variable; routing it through jax.config (before backends initialize) restores
the standard behaviour. CLI entry points call apply_platform_env() first.
"""
import os


def apply_platform_env():
    platforms = os.environ.get("JAX_PLATFORMS", "").strip()
    if not platforms:
        return
    import jax
    try:
        jax.config.update("jax_platforms", platforms)
    except RuntimeError:
        pass  # backends already initialized; too late to change
