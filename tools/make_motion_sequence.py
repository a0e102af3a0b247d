#!/usr/bin/env python3
"""Synthesize AMASS-format pose sequences for the paper's three motions.

The reference's experiments (paper §3 "Data", BASELINE.md Table 1) use three
AMASS motion sequences — waving / arms swinging / walking — rendered from
circular camera trajectories (/root/reference/util/smpl_sequence_loading.py:7-60).
AMASS data is licensed and not shipped; this synthesizes kinematically
plausible cycles for all three motions in the same npz format ('poses'
[n_frames, 156] SMPL-H axis-angle; dims 0:3 root orient, 3:66 the 21 body
joints) so `create_dataset.py --smpl_sequence_file=...` exercises the
identical loading + generation path at the reference's scale.

Body-pose dim for joint j (1..23), axis a: 3*(j-1)+a, stored at poses[:, 3+...].
Joints: 1/2 = L/R hip, 4/5 = L/R knee, 3/6/9 = spine, 13/14 = L/R collar,
16/17 = L/R shoulder, 18/19 = L/R elbow, 12 = neck.

Walking reuses tools/make_walking_sequence.walking_poses (the round-2
sequence) so data/walking_24.npz stays reproducible bit-for-bit.
"""
from __future__ import annotations

import argparse

import numpy as np

from make_walking_sequence import walking_poses


def _body_to_poses(body: np.ndarray) -> np.ndarray:
    poses = np.zeros((body.shape[0], 156), np.float32)
    poses[:, 3:66] = body[:, :63]
    return poses


def waving_poses(n_frames: int, cycles: float = 2.0) -> np.ndarray:
    """[n_frames, 156] — left arm at the side, right arm raised and waving."""
    t = 2.0 * np.pi * cycles * np.arange(n_frames) / n_frames
    body = np.zeros((n_frames, 69), np.float32)

    def set_j(joint: int, axis: int, values):
        body[:, 3 * (joint - 1) + axis] = values

    wave = np.sin(t)
    # left arm lowered to the side (T-pose -> down via shoulder z)
    set_j(16, 2, -1.05 * np.ones_like(t))
    set_j(18, 2, -0.25 * np.ones_like(t))
    # right arm raised overhead (opposite z sense raises it from the T-pose)
    set_j(17, 2, (-0.55 + 0.10 * wave))
    # the wave itself: forearm oscillates side to side at the elbow, with a
    # slight wrist-like counterphase on the collar
    set_j(19, 2, -0.35 + 0.45 * wave)
    set_j(14, 0, 0.08 * np.sin(t + 0.6))
    # gentle weight shift + head follow
    set_j(3, 2, 0.04 * np.sin(t * 0.5))
    set_j(12, 1, 0.06 * wave)
    return _body_to_poses(body)


def arms_swinging_poses(n_frames: int, cycles: float = 2.0) -> np.ndarray:
    """[n_frames, 156] — both arms swinging forward/back, legs planted."""
    t = 2.0 * np.pi * cycles * np.arange(n_frames) / n_frames
    body = np.zeros((n_frames, 69), np.float32)

    def set_j(joint: int, axis: int, values):
        body[:, 3 * (joint - 1) + axis] = values

    swing = np.sin(t)
    # arms lowered from the T-pose, then swung about x in antiphase
    set_j(16, 2, -0.95 * np.ones_like(t))
    set_j(17, 2, 0.95 * np.ones_like(t))
    set_j(13, 0, -0.55 * swing)            # L collar forward/back
    set_j(14, 0, 0.55 * swing)             # R collar antiphase
    set_j(16, 0, -0.25 * swing)            # shoulders amplify the swing
    set_j(17, 0, 0.25 * swing)
    # elbows flex when the arm swings back
    set_j(18, 2, -0.30 - 0.15 * np.clip(swing, 0, None))
    set_j(19, 2, 0.30 + 0.15 * np.clip(-swing, 0, None))
    # counter-rotation of the torso, stable legs with a light knee give
    set_j(3, 1, 0.10 * swing)
    set_j(9, 1, -0.06 * swing)
    set_j(4, 0, 0.06 + 0.04 * np.sin(2 * t))
    set_j(5, 0, 0.06 - 0.04 * np.sin(2 * t))
    set_j(12, 1, -0.04 * swing)
    return _body_to_poses(body)


MOTIONS = {
    "walking": walking_poses,
    "waving": waving_poses,
    "arms_swinging": arms_swinging_poses,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--motion", choices=sorted(MOTIONS), default="walking")
    ap.add_argument("--out", default=None)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--cycles", type=float, default=1.0)
    args = ap.parse_args()
    out = args.out or f"data/{args.motion}_{args.frames}.npz"
    poses = MOTIONS[args.motion](args.frames, args.cycles)
    np.savez(out, poses=poses,
             betas=np.zeros(16, np.float32),
             gender="female", mocap_framerate=30.0)
    print(f"wrote {out}: poses {poses.shape} ({args.motion})")


if __name__ == "__main__":
    main()
