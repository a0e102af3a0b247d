#!/usr/bin/env python3
"""Synthesize an AMASS-format walking pose sequence (.npz).

The reference's experimental setup trains on AMASS motion sequences
(/root/reference/util/smpl_sequence_loading.py:7-60; paper §3 "Data": walking /
waving / arm-swinging sequences, ~225 images each). AMASS data is licensed and
not shipped; this generates a kinematically-plausible walking cycle in the SAME
npz format ('poses' [n_frames, 156] SMPL-H axis-angle, dims 0:3 root orient,
3:66 the 21 body joints) so `create_dataset.py --smpl_sequence_file=...`
exercises the identical loading + generation path at the reference's scale.

Body-pose dim for joint j (1..23), axis a: 3*(j-1)+a, stored at poses[:, 3+...].
Joints: 1/2 = L/R hip, 4/5 = L/R knee, 3/6/9 = spine, 16/17 = L/R shoulder,
18/19 = L/R elbow, 12 = neck.
"""
from __future__ import annotations

import argparse

import numpy as np


def walking_poses(n_frames: int, cycles: float = 2.0) -> np.ndarray:
    """[n_frames, 156] SMPL-H 'poses' of a smooth walking cycle."""
    t = 2.0 * np.pi * cycles * np.arange(n_frames) / n_frames
    body = np.zeros((n_frames, 69), np.float32)

    def set_j(joint: int, axis: int, values):
        body[:, 3 * (joint - 1) + axis] = values

    swing = np.sin(t)
    # legs: hips swing about x (forward/back), knees bend when the leg trails
    set_j(1, 0, 0.45 * swing)             # L hip
    set_j(2, 0, -0.45 * swing)            # R hip
    set_j(4, 0, 0.50 * np.clip(np.sin(t - 1.2), 0, None))   # L knee
    set_j(5, 0, 0.50 * np.clip(np.sin(t + np.pi - 1.2), 0, None))  # R knee
    # arms: rest pose is a T-pose, so first LOWER the arms with shoulder
    # z-rotations (the same dims the reference's "arm angles" drive on the
    # collars, 38/41), then counter-swing them to the legs via collar x
    set_j(16, 2, -1.05 * np.ones_like(t))  # L shoulder down
    set_j(17, 2, 1.05 * np.ones_like(t))   # R shoulder down
    set_j(13, 0, -0.30 * swing)            # L collar swing
    set_j(14, 0, 0.30 * swing)             # R collar swing
    set_j(18, 2, -0.35 + 0.1 * np.sin(t + 0.5))   # L elbow flexion
    set_j(19, 2, 0.35 - 0.1 * np.sin(t + 0.5))    # R elbow flexion
    # torso counter-rotation + gentle lateral sway, head stabilization
    set_j(3, 1, 0.08 * swing)             # spine1 yaw
    set_j(6, 2, 0.04 * np.sin(2 * t))     # spine2 roll
    set_j(9, 1, -0.05 * swing)            # spine3 counter-yaw
    set_j(12, 1, -0.03 * swing)           # neck

    poses = np.zeros((n_frames, 156), np.float32)
    poses[:, 3:66] = body[:, :63]
    return poses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/walking_sequence.npz")
    ap.add_argument("--frames", type=int, default=72)
    ap.add_argument("--cycles", type=float, default=2.0)
    args = ap.parse_args()
    poses = walking_poses(args.frames, args.cycles)
    np.savez(args.out, poses=poses,
             betas=np.zeros(16, np.float32),
             gender="female", mocap_framerate=30.0)
    print(f"wrote {args.out}: poses {poses.shape}")


if __name__ == "__main__":
    main()
