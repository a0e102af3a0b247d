#!/usr/bin/env python3
"""searchsorted micro-benchmark: numpy vs C++ ext vs jnp vs Pallas fused.

Mirrors the reference's torchsearchsorted/examples/benchmark.py harness
(B=5000, A=300, V=100, best-of-20).
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/native/", 1)[0])

B, A, V = 5000, 300, 100
REPS = 20


def best_of(fn):
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    rng = np.random.RandomState(0)
    a = np.sort(rng.randn(B, A).astype(np.float32), -1)
    v = rng.randn(B, V).astype(np.float32)

    t_np = best_of(lambda: np.stack([np.searchsorted(a[i], v[i], side="right")
                                     for i in range(B)]))
    print(f"numpy loop:      {t_np:8.2f} ms")

    from smpl_nerf_tpu.ops import searchsorted_cpu
    if searchsorted_cpu.load_library() is not None:
        t_cpp = best_of(lambda: searchsorted_cpu.searchsorted(a, v, "right"))
        print(f"C++ ext (OpenMP): {t_cpp:7.2f} ms   ({t_np / t_cpp:.1f}x numpy)")

    import jax
    import jax.numpy as jnp
    from smpl_nerf_tpu.core.sampling import searchsorted_right
    aj, vj = jnp.asarray(a), jnp.asarray(v)
    f = jax.jit(searchsorted_right)
    np.asarray(f(aj, vj))
    t_jnp = best_of(lambda: np.asarray(f(aj, vj)))
    print(f"jnp branchless:  {t_jnp:8.2f} ms   ({t_np / t_jnp:.1f}x numpy, "
          f"backend={jax.default_backend()})")


if __name__ == "__main__":
    main()
