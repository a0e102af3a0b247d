"""Tests for the custom ops: Pallas sample_pdf, ray-mesh, vertex attention."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smpl_nerf_tpu.core import sampling
from smpl_nerf_tpu.core.gmm import modified_softmax
from smpl_nerf_tpu.ops import raymesh
from smpl_nerf_tpu.ops.sample_pdf_pallas import sample_pdf_fused
from smpl_nerf_tpu.ops.vertex_attention import (relu_attention_warp,
                                                vertex_attention_warp)
from smpl_nerf_tpu.ops.vertex_sphere import sample_warps_by_vertex_sphere


# -------------------------------------------------------- pallas sample_pdf

@pytest.mark.parametrize("R,K,F", [(7, 63, 128), (300, 63, 128), (5, 15, 16)])
def test_sample_pdf_fused_matches_jnp_oracle(R, K, F, rng):
    bins = np.sort(rng.uniform(1, 4, (R, K)).astype(np.float32), -1)
    weights = rng.uniform(0, 1, (R, K - 1)).astype(np.float32)
    want = np.asarray(sampling.sample_pdf(jnp.asarray(bins), jnp.asarray(weights), F))
    got = np.asarray(sample_pdf_fused(jnp.asarray(bins), jnp.asarray(weights), F))
    # the kernel's matmul-cumsum rounds differently from jnp.cumsum; a bin-edge
    # index can flip where u == cdf to float precision — bounded by bin width
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_sample_pdf_fused_concentrated_weights(rng):
    # all mass in one bin -> samples concentrate there
    R, K, F = 4, 63, 64
    bins = np.tile(np.linspace(1, 4, K, dtype=np.float32), (R, 1))
    weights = np.full((R, K - 1), 1e-8, np.float32)
    weights[:, 30] = 1.0
    got = np.asarray(sample_pdf_fused(jnp.asarray(bins), jnp.asarray(weights), F))
    mid = bins[0, 30:32].mean()
    assert np.abs(np.median(got) - mid) < 0.2


# --------------------------------------------------------------- ray-mesh

def _tri_mesh():
    # unit square made of two triangles in the z=0 plane
    vertices = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return vertices, faces


def test_raymesh_hit_and_miss():
    vertices, faces = _tri_mesh()
    origins = jnp.asarray([[0.25, 0.25, 1.0], [2.0, 2.0, 1.0], [0.75, 0.75, 2.0]],
                          jnp.float32)
    dirs = jnp.asarray([[0, 0, -1.0]] * 3, jnp.float32)
    hits = raymesh.intersect_rays(origins, dirs, jnp.asarray(vertices),
                                  jnp.asarray(faces), chunk_size=2)
    assert bool(hits.hit[0]) and not bool(hits.hit[1]) and bool(hits.hit[2])
    np.testing.assert_allclose(float(hits.t[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(hits.t[2]), 2.0, atol=1e-6)


def test_raymesh_closest_of_multiple_hits():
    # two parallel squares at z=0 and z=-1: closest hit should be z=0 plane
    v0, f0 = _tri_mesh()
    v1 = v0 + np.array([0, 0, -1], np.float32)
    vertices = np.concatenate([v0, v1])
    faces = np.concatenate([f0, f0 + 4]).astype(np.int32)
    origins = jnp.asarray([[0.5, 0.5, 1.0]], jnp.float32)
    dirs = jnp.asarray([[0, 0, -1.0]], jnp.float32)
    hits = raymesh.intersect_rays(origins, dirs, jnp.asarray(vertices),
                                  jnp.asarray(faces), chunk_size=1)
    np.testing.assert_allclose(float(hits.t[0]), 1.0, atol=1e-6)
    assert int(hits.face_idx[0]) in (0, 1)


def test_barycentric_transfer_identity():
    vertices, faces = _tri_mesh()
    origins = jnp.asarray([[0.3, 0.2, 1.0]], jnp.float32)
    dirs = jnp.asarray([[0, 0, -1.0]], jnp.float32)
    hits = raymesh.intersect_rays(origins, dirs, jnp.asarray(vertices),
                                  jnp.asarray(faces), chunk_size=1)
    # transfer onto the SAME mesh must reproduce the hit point
    pts = raymesh.barycentric_transfer(hits, jnp.asarray(faces), jnp.asarray(vertices))
    np.testing.assert_allclose(np.asarray(pts)[0], [0.3, 0.2, 0.0], atol=1e-5)


def test_barycentric_transfer_to_shifted_mesh():
    vertices, faces = _tri_mesh()
    shifted = vertices + np.array([0.5, -0.25, 2.0], np.float32)
    origins = jnp.asarray([[0.3, 0.2, 1.0]], jnp.float32)
    dirs = jnp.asarray([[0, 0, -1.0]], jnp.float32)
    hits = raymesh.intersect_rays(origins, dirs, jnp.asarray(vertices),
                                  jnp.asarray(faces), chunk_size=1)
    pts = raymesh.barycentric_transfer(hits, jnp.asarray(faces), jnp.asarray(shifted))
    np.testing.assert_allclose(np.asarray(pts)[0], [0.8, -0.05, 2.0], atol=1e-5)


def test_intersect_rays_multi_two_planes():
    """Two stacked squares: both hits found, nearest first, inf padding."""
    v0, f0 = _tri_mesh()
    v1 = v0 + np.array([0, 0, -1], np.float32)
    vertices = np.concatenate([v0, v1])
    faces = np.concatenate([f0, f0 + 4]).astype(np.int32)
    origins = jnp.asarray([[0.5, 0.5, 1.0], [5.0, 5.0, 1.0]], jnp.float32)
    dirs = jnp.asarray([[0, 0, -1.0]] * 2, jnp.float32)
    t, hit = raymesh.intersect_rays_multi(origins, dirs, jnp.asarray(vertices),
                                          jnp.asarray(faces), max_hits=3)
    t, hit = np.asarray(t), np.asarray(hit)
    assert hit[0, 0] and hit[0, 1] and not hit[0, 2]
    np.testing.assert_allclose(t[0, 0], 1.0, atol=1e-3)
    np.testing.assert_allclose(t[0, 1], 2.0, atol=1e-3)
    assert not hit[1].any()
    assert np.isinf(t[1]).all()


def test_dependent_pixels_identity_pose():
    """Same mesh for canonical+goal: a centered camera ray maps near itself."""
    from smpl_nerf_tpu.core import cameras, rays as rays_mod
    vertices, faces = _tri_mesh()
    vertices = vertices - np.array([0.5, 0.5, 0.0], np.float32)  # center at origin
    cam = cameras.get_sphere_pose(0.0, 0.0, 2.0).astype(np.float32)
    h = w = 16
    focal = 16.0
    o, d = rays_mod.get_rays(h, w, focal, cam)
    o = jnp.reshape(o, (-1, 3))
    d = jnp.reshape(d, (-1, 3))
    px, hit = raymesh.dependent_pixels(o, d, jnp.asarray(vertices),
                                       jnp.asarray(vertices), jnp.asarray(faces),
                                       cam, h, w, focal)
    hit = np.asarray(hit)
    assert hit.any()
    px = np.asarray(px)
    iy, ix = np.divmod(np.where(hit)[0], w)
    # identity pose: each hitting ray maps back to (about) its own pixel
    np.testing.assert_allclose(px[hit][:, 0], ix, atol=1.0)
    np.testing.assert_allclose(px[hit][:, 1], iy, atol=1.0)


# ------------------------------------------------------- vertex attention

def _attention_oracle(samples, verts, warps, radius, temp):
    """Dense numpy oracle of reference dynamic_pipeline.py:53-66."""
    dist = np.linalg.norm(samples[:, :, None, :] - verts[:, None, :, :], axis=-1)
    att = np.maximum(radius - dist, 0.0) * temp
    x = att
    m = x.max()
    exp = np.exp(x - m)
    w = (exp - np.exp(-m)) / exp.sum(-1, keepdims=True)
    return (w[..., None] * warps[:, None, :, :]).sum(-2)


def test_vertex_attention_matches_dense_oracle(rng):
    R, S, V = 3, 5, 700
    verts = rng.uniform(-1, 1, (R, V, 3)).astype(np.float32)
    samples = (verts[:, :S] + 0.005 * rng.randn(R, S, 3)).astype(np.float32)
    warps = rng.randn(R, V, 3).astype(np.float32) * 0.1
    radius, temp = 0.05, 100.0
    want = _attention_oracle(samples, verts, warps, radius, temp)
    got = np.asarray(vertex_attention_warp(jnp.asarray(samples), jnp.asarray(verts),
                                           jnp.asarray(warps), radius, temp,
                                           chunk_size=128))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_vertex_attention_zero_outside_radius(rng):
    R, S, V = 2, 3, 50
    verts = rng.uniform(10, 11, (R, V, 3)).astype(np.float32)  # far away
    samples = np.zeros((R, S, 3), np.float32)
    warps = rng.randn(R, V, 3).astype(np.float32)
    got = np.asarray(vertex_attention_warp(jnp.asarray(samples), jnp.asarray(verts),
                                           jnp.asarray(warps), 0.01, 1000.0))
    # modified softmax maps zero activation to zero weight -> zero warp
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_relu_attention_matches_dense_oracle(rng):
    R, S, V = 3, 4, 300
    verts = rng.uniform(-0.5, 0.5, (V, 3)).astype(np.float32)
    samples = rng.uniform(-0.5, 0.5, (R, S, 3)).astype(np.float32)
    warps = rng.randn(V, 3).astype(np.float32)
    radius = 0.3
    dist = np.linalg.norm(samples[:, :, None, :] - verts[None, None], axis=-1)
    att = np.maximum(radius - dist, 0.0)
    w = att / (att.sum(-1, keepdims=True) + 1e-5)
    want = (w[..., None] * warps[None, None]).sum(-2)
    got = np.asarray(relu_attention_warp(jnp.asarray(samples), jnp.asarray(verts),
                                         jnp.asarray(warps), radius, chunk_size=64))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_relu_attention_gradient_flows_to_vertices(rng):
    samples = jnp.zeros((1, 2, 3))
    verts = jnp.asarray(rng.uniform(-0.1, 0.1, (20, 3)).astype(np.float32))
    warps = jnp.asarray(rng.randn(20, 3).astype(np.float32))

    def loss(v):
        return jnp.sum(relu_attention_warp(samples, v, warps, 0.5) ** 2)

    g = jax.grad(loss)(verts)
    assert np.abs(np.asarray(g)).max() > 0


# ------------------------------------------------------- vertex sphere warp

def test_vertex_sphere_nearest_assignment(rng):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    warps = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    samples = np.array([[[0.005, 0, 0], [0.99, 0.005, 0], [5, 5, 5]]], np.float32)
    got = np.asarray(sample_warps_by_vertex_sphere(
        jnp.asarray(samples), jnp.asarray(verts), jnp.asarray(warps), 0.05,
        chunk_size=2))
    np.testing.assert_allclose(got[0, 0], [1, 0, 0], atol=1e-6)   # nearest v0
    np.testing.assert_allclose(got[0, 1], [0, 1, 0], atol=1e-6)   # nearest v1
    np.testing.assert_allclose(got[0, 2], 0.0, atol=1e-6)         # outside radius


def test_vertex_sphere_mean_assignment(rng):
    verts = np.array([[0, 0, 0], [0.01, 0, 0], [9, 9, 9]], np.float32)
    warps = np.array([[1, 0, 0], [0, 1, 0], [5, 5, 5]], np.float32)
    samples = np.array([[[0.005, 0, 0]]], np.float32)
    got = np.asarray(sample_warps_by_vertex_sphere(
        jnp.asarray(samples), jnp.asarray(verts), jnp.asarray(warps), 0.05,
        by_mean=True, chunk_size=2))
    np.testing.assert_allclose(got[0, 0], [0.5, 0.5, 0.0], atol=1e-4)


@pytest.mark.parametrize("by_mean", [False, True])
def test_vertex_sphere_per_ray_matches_shared(by_mean, rng):
    """The in-step per-ray op == the dataset-level op when every ray carries
    the same goal mesh, and respects per-ray meshes when they differ."""
    from smpl_nerf_tpu.ops.vertex_sphere import sample_warps_by_vertex_sphere_rays

    R, S, V = 5, 4, 37
    verts = rng.randn(V, 3).astype(np.float32)
    warps = rng.randn(V, 3).astype(np.float32)
    samples = (verts[rng.randint(0, V, (R, S))]
               + 0.02 * rng.randn(R, S, 3)).astype(np.float32)
    radius = 0.08
    want = np.asarray(sample_warps_by_vertex_sphere(
        jnp.asarray(samples), jnp.asarray(verts), jnp.asarray(warps), radius,
        by_mean=by_mean, chunk_size=16))
    got = np.asarray(sample_warps_by_vertex_sphere_rays(
        jnp.asarray(samples),
        jnp.broadcast_to(verts, (R, V, 3)),
        jnp.broadcast_to(warps, (R, V, 3)), radius,
        by_mean=by_mean, chunk_size=16))
    np.testing.assert_allclose(got, want, atol=2e-5)

    # per-ray meshes: shift ray 0's mesh far away -> its warps become zero
    verts_r = np.broadcast_to(verts, (R, V, 3)).copy()
    verts_r[0] += 100.0
    got2 = np.asarray(sample_warps_by_vertex_sphere_rays(
        jnp.asarray(samples), jnp.asarray(verts_r),
        jnp.broadcast_to(warps, (R, V, 3)), radius,
        by_mean=by_mean, chunk_size=16))
    np.testing.assert_allclose(got2[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(got2[1:], want[1:], atol=2e-5)
