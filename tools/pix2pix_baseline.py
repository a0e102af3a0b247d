#!/usr/bin/env python3
"""Depth→RGB conv-regressor baseline — in-repo stand-in for the Pix2Pix row.

The reference's Table-1 baseline is a depth-conditioned Pix2Pix trained on
(RGB, depth) pairs from `create_dataset.py --dataset=pix2pix`
(/root/reference/README.md:48-65); the GAN itself lives in an external clone
(junyanz/pytorch-CycleGAN-and-pix2pix) there too. This trains a compact
U-Net depth→RGB regressor (L1 loss, no GAN — an honest, slightly weaker
stand-in) in JAX on the same pix2pix-format pairs ([rgb | depth] PNGs), then
renders + scores the val split. Like Pix2Pix, it sees the GROUND-TRUTH depth
of each val view — information the NeRF variants must infer — so it is a
strong image-translation baseline, yet it cannot hallucinate view-consistent
detail; that is the gap Table 1 quantifies.

Usage:
  python create_dataset.py --dataset_type=pix2pix --save_dir=data/walking_256_p2p \
      --resolution=256 ... (same cameras/motion as the NeRF dataset)
  python tools/pix2pix_baseline.py --dataset_dir data/walking_256_p2p \
      --epochs 60 --out runs/baseline_p2p_walking
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smpl_nerf_tpu._platform import apply_platform_env

apply_platform_env()

import argparse
import glob
import json
import time

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")


def load_pairs(directory: str):
    """[N,h,w,3] rgb in [0,1] + [N,h,w,1] depth in [0,1] from [rgb|depth] PNGs."""
    import cv2
    paths = sorted(glob.glob(os.path.join(directory, "*.png")))
    if not paths:
        raise FileNotFoundError(f"no PNGs in {directory}")
    rgbs, depths = [], []
    for p in paths:
        img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        w = img.shape[1] // 2
        rgbs.append(img[:, :w])
        depths.append(img[:, w:, :1])
    return np.stack(rgbs), np.stack(depths)


class UNet(nn.Module):
    """Compact encoder-decoder with skip connections (pix2pix-G-lite)."""
    base: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = self.base
        enc = []
        h = x.astype(self.dtype)
        for i, ch in enumerate((c, 2 * c, 4 * c, 8 * c)):
            h = nn.Conv(ch, (4, 4), strides=2, padding="SAME",
                        dtype=self.dtype, name=f"down{i}")(h)
            h = nn.leaky_relu(h, 0.2)
            enc.append(h)
        h = nn.Conv(8 * c, (4, 4), strides=2, padding="SAME",
                    dtype=self.dtype, name="bottleneck")(h)
        h = nn.relu(h)
        for i, (ch, skip) in enumerate(zip((8 * c, 4 * c, 2 * c, c),
                                           reversed(enc))):
            h = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding="SAME",
                                 dtype=self.dtype, name=f"up{i}")(h)
            h = nn.relu(h)
            h = jnp.concatenate([h, skip], -1)
        h = nn.ConvTranspose(c, (4, 4), strides=(2, 2), padding="SAME",
                             dtype=self.dtype, name="up_last")(h)
        h = nn.relu(h)
        h = nn.Conv(3, (3, 3), padding="SAME", dtype=self.dtype, name="rgb")(h)
        return nn.sigmoid(h.astype(jnp.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_dir", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--fg_weight", type=float, default=15.0)
    ap.add_argument("--lrate", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rgb_tr, dep_tr = load_pairs(os.path.join(args.dataset_dir, "train"))
    rgb_va, dep_va = load_pairs(os.path.join(args.dataset_dir, "val"))
    print(f"train {rgb_tr.shape} val {rgb_va.shape}")

    model = UNet()
    params = model.init(jax.random.PRNGKey(args.seed), jnp.zeros(
        (1,) + dep_tr.shape[1:]))
    tx = optax.adam(args.lrate)
    opt_state = tx.init(params)
    dep_tr_d, rgb_tr_d = jnp.asarray(dep_tr), jnp.asarray(rgb_tr)

    @jax.jit
    def train_step(params, opt_state, idx):
        d = jnp.take(dep_tr_d, idx, axis=0)
        t = jnp.take(rgb_tr_d, idx, axis=0)

        def loss_fn(p):
            # plain L1 on a ~95%-white human scene collapses to the all-white
            # fixed point (sigmoid saturation kills the gradients; same
            # hazard as NeRF's transparent-scene dead-relu, RESULTS.md) —
            # upweight foreground pixels (any channel below white)
            err = jnp.abs(model.apply(p, d) - t)
            fg = (t.min(-1, keepdims=True) < 0.98).astype(jnp.float32)
            w = 1.0 + args.fg_weight * fg
            return (err * w).sum() / (w.sum() * 3.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n = len(rgb_tr)
    steps = max(1, n // args.batch)
    rng = np.random.RandomState(args.seed)
    for epoch in range(args.epochs):
        t0 = time.time()
        perm = rng.permutation(n)
        losses = []
        for s in range(steps):
            idx = perm[s * args.batch:(s + 1) * args.batch]
            if len(idx) < args.batch:
                idx = np.concatenate([idx, perm[:args.batch - len(idx)]])
            params, opt_state, loss = train_step(params, opt_state,
                                                 jnp.asarray(idx))
            # keep the DEVICE array: float() here would sync every step and
            # serialize dispatch over the tunnel; convert at the epoch print
            losses.append(loss)
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            print(f"[epoch {epoch}] L1 {np.mean([float(l) for l in losses]):.5f} "
                  f"({time.time()-t0:.1f}s)")

    apply_jit = jax.jit(model.apply)
    renders = np.concatenate(
        [np.asarray(apply_jit(params, jnp.asarray(dep_va[i:i + 8])))
         for i in range(0, len(dep_va), 8)])

    from smpl_nerf_tpu.evaluation import print_scores
    scores = print_scores(renders, rgb_va)
    if args.out:
        # save_rerenders expects the pipeline's BGR contract; ours is RGB here
        import imageio
        os.makedirs(args.out, exist_ok=True)
        for i, img in enumerate(renders):
            imageio.imwrite(os.path.join(args.out, f"img_{i:03d}.png"),
                            (np.clip(img, 0, 1) * 255).astype(np.uint8))
        with open(os.path.join(args.out, "scores.json"), "w") as fh:
            json.dump(scores, fh, indent=1)
        print("pix2pix-standin renders + scores ->", args.out)


if __name__ == "__main__":
    main()
