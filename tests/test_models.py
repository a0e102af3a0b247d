"""Tests for the flax network modules: topology, shapes, torch import parity."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from smpl_nerf_tpu.models import (AppendVerticesNet, DummyImageWiseEstimator,
                                  DummySmplEstimatorModel, RenderRayNet,
                                  SirenRenderRayNet, SmplEstimator, WarpFieldNet)
from smpl_nerf_tpu.models import render_ray_net as rrn_mod
from smpl_nerf_tpu.models import warp_field_net as wfn_mod


def _torch_render_ray_net(n_layers, width, positions_dim, directions_dim,
                          additional_input_dim, skips, use_directional_input):
    """Torch oracle with the reference topology (models/render_ray_net.py:6-61)."""
    import torch.nn as tnn
    import torch.nn.functional as F

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.positions_pose_input = tnn.Linear(positions_dim + additional_input_dim, width)
            self.positional_net = tnn.ModuleList()
            for i in range(n_layers - 1):
                if i in skips:
                    self.positional_net.append(tnn.Linear(width + positions_dim + additional_input_dim, width))
                else:
                    self.positional_net.append(tnn.Linear(width, width))
            self.additional_linear_layer = tnn.Linear(width, width)
            self.sigma_out_layer = tnn.Linear(width, 1)
            dw = width // 2
            if use_directional_input:
                self.directional_input = tnn.Linear(width + directions_dim, dw)
            else:
                self.directional_input = tnn.Linear(width, dw)
            self.directional_net = tnn.ModuleList([tnn.Linear(dw, dw)])
            self.rgb_out_layer = tnn.Linear(dw, 3)

        def forward(self, x):
            positions_pose = x[..., :positions_dim + additional_input_dim]
            directions = x[..., -directions_dim:]
            o = F.relu(self.positions_pose_input(positions_pose))
            for i, layer in enumerate(self.positional_net):
                if i in skips:
                    o = F.relu(layer(torch.cat([o, positions_pose], -1)))
                else:
                    o = F.relu(layer(o))
            o = self.additional_linear_layer(o)
            sigma = self.sigma_out_layer(o)
            if use_directional_input:
                o = self.directional_input(torch.cat([o, directions], -1))
            else:
                o = self.directional_input(o)
            for layer in self.directional_net:
                o = F.relu(layer(o))
            rgb = self.rgb_out_layer(o)
            return torch.cat([rgb, sigma], -1)

    return Net()


@pytest.mark.parametrize("use_dir,add_dim,skips", [(1, 0, (4,)), (0, 0, (4,)), (1, 40, (2, 5))])
def test_render_ray_net_matches_torch_reference(use_dir, add_dim, skips, rng):
    """Import a torch state_dict and check bit-level forward parity."""
    n_layers, width, pos_dim, dir_dim = 4, 32, 12, 6
    tnet = _torch_render_ray_net(n_layers, width, pos_dim, dir_dim, add_dim,
                                 list(skips), use_dir)
    x = rng.randn(17, pos_dim + add_dim + dir_dim).astype(np.float32)
    want = tnet(torch.from_numpy(x)).detach().numpy()

    jnet = RenderRayNet(n_layers=n_layers, width=width, positions_dim=pos_dim,
                        directions_dim=dir_dim, additional_input_dim=add_dim,
                        skips=skips, use_directional_input=bool(use_dir))
    params = rrn_mod.import_torch_state_dict(
        {k: v.numpy() for k, v in tnet.state_dict().items()}, n_layers=n_layers)
    got = np.asarray(jnet.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_render_ray_net_init_and_shapes(rng):
    net = RenderRayNet(positions_dim=60, directions_dim=24)
    x = jnp.asarray(rng.randn(5, 84).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (5, 4)


def test_render_ray_net_bfloat16_close_to_f32(rng):
    x = jnp.asarray(rng.randn(8, 84).astype(np.float32))
    net32 = RenderRayNet()
    params = net32.init(jax.random.PRNGKey(0), x)
    netbf = RenderRayNet(dtype=jnp.bfloat16)
    out32 = np.asarray(net32.apply(params, x))
    outbf = np.asarray(netbf.apply(params, x))
    assert outbf.dtype == np.float32
    np.testing.assert_allclose(out32, outbf, atol=0.15)


def test_siren_net_runs(rng):
    net = SirenRenderRayNet(n_layers=4, width=32, positions_dim=12, directions_dim=6)
    x = jnp.asarray(rng.randn(5, 18).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (5, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_warp_field_net_matches_torch(rng):
    import torch.nn as tnn
    import torch.nn.functional as F
    lin1, lin2 = tnn.Linear(84, 64), tnn.Linear(64, 3)
    x = rng.randn(9, 84).astype(np.float32)
    want = lin2(F.relu(lin1(torch.from_numpy(x)))).detach().numpy()
    net = WarpFieldNet(width=64, positions_dim=60, pose_dim=24)
    params = wfn_mod.import_torch_state_dict({
        "linear1.weight": lin1.weight.detach().numpy(),
        "linear1.bias": lin1.bias.detach().numpy(),
        "linear2.weight": lin2.weight.detach().numpy(),
        "linear2.bias": lin2.bias.detach().numpy(),
    })
    got = np.asarray(net.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_append_vertices_net_uses_vertices(rng):
    """The vertex embedding must influence the output (reference bug fixed)."""
    net = AppendVerticesNet(n_layers=3, width=32, positions_dim=12, directions_dim=6,
                            vertices_dim=30, skips=())
    x = rng.randn(4, 12 + 30 + 6).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out1 = np.asarray(net.apply(params, jnp.asarray(x)))
    x2 = x.copy()
    x2[:, 12:42] += 1.0  # perturb vertices block only
    out2 = np.asarray(net.apply(params, jnp.asarray(x2)))
    assert not np.allclose(out1, out2)


def test_smpl_estimator_shapes(rng):
    net = SmplEstimator(human_size=2)
    x = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out.shape == (2, 2)
    out_t, _ = net.apply(variables, x, train=True,
                         rngs={"dropout": jax.random.PRNGKey(1)},
                         mutable=["batch_stats"])
    assert out_t.shape == (2, 2)


def test_dummy_smpl_estimator_lookup(rng):
    poses = rng.randn(7, 69).astype(np.float32)
    net = DummySmplEstimatorModel(goal_poses=poses, betas=np.zeros(10, np.float32))
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray([0]))
    got = np.asarray(net.apply(variables, jnp.asarray([3, 5])))
    np.testing.assert_allclose(got, poses[[3, 5]], atol=0)


def test_dummy_image_wise_estimator_trainable_angles():
    canonical = np.zeros(69, np.float32)
    gt = np.zeros(69, np.float32)
    gt[41], gt[38] = 0.5, -0.25
    net = DummyImageWiseEstimator(canonical_pose=canonical,
                                  initial_arm_angle_l=0.1, initial_arm_angle_r=0.1)
    params = net.init(jax.random.PRNGKey(0))
    pose = np.asarray(net.apply(params))
    assert pose.shape == (1, 69)
    np.testing.assert_allclose(pose[0, 41], 0.1)

    # gradient flows to the two scalars only
    def loss(p):
        out = net.apply(p)
        return jnp.sum((out[0] - jnp.asarray(gt)) ** 2)

    g = jax.grad(loss)(params)
    assert abs(float(g["params"]["arm_angle_l"][0])) > 0
    err = DummyImageWiseEstimator.pose_error(params, gt)
    assert err == pytest.approx(abs(0.1 - 0.5) + abs(0.1 + 0.25), abs=1e-6)
