"""Native CPU searchsorted vs the numpy oracle.

Same test matrix as the reference's extension tests
(torchsearchsorted/test/test_searchsorted.py:27-44): row-broadcast shape grid x
side in {left, right}, exact equality against numpy.
"""
import numpy as np
import pytest

from smpl_nerf_tpu.ops import searchsorted_cpu


@pytest.fixture(scope="module")
def lib():
    lib = searchsorted_cpu.load_library()
    if lib is None:
        pytest.skip("no C++ toolchain to build the extension")
    return lib


def _oracle(a, v, side):
    rows = max(a.shape[0], v.shape[0])
    out = np.empty((rows, v.shape[1]), np.int64)
    for r in range(rows):
        ar = a[0] if a.shape[0] == 1 else a[r]
        vr = v[0] if v.shape[0] == 1 else v[r]
        out[r] = np.searchsorted(ar, vr, side=side)
    return out


@pytest.mark.parametrize("ba,bv", [(1, 1), (1, 30), (30, 1), (30, 30)])
@pytest.mark.parametrize("a_cols,v_cols", [(1, 1), (50, 12), (500, 120)])
@pytest.mark.parametrize("side", ["left", "right"])
def test_matches_numpy(lib, ba, bv, a_cols, v_cols, side, rng):
    a = np.sort(rng.randn(ba, a_cols).astype(np.float32), -1)
    v = rng.randn(bv, v_cols).astype(np.float32)
    got = searchsorted_cpu.searchsorted(a, v, side)
    np.testing.assert_array_equal(got, _oracle(a, v, side))


def test_duplicate_values_left_right(lib):
    a = np.array([[0.0, 1.0, 1.0, 1.0, 2.0]], np.float32)
    v = np.array([[1.0]], np.float32)
    assert searchsorted_cpu.searchsorted(a, v, "left")[0, 0] == 1
    assert searchsorted_cpu.searchsorted(a, v, "right")[0, 0] == 4


def test_f64_path(lib, rng):
    a = np.sort(rng.randn(4, 64), -1)
    v = rng.randn(4, 16)
    got = searchsorted_cpu.searchsorted(a, v, "right")
    np.testing.assert_array_equal(got, _oracle(a, v, "right"))
