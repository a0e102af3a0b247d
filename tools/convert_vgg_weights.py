#!/usr/bin/env python3
"""Convert torchvision VGG16 (+ optional LPIPS linear heads) to our npz format.

Run on a machine WITH the weights available (this image has no egress):

    python tools/convert_vgg_weights.py vgg16.pth [lpips_lin.pth] \
        smpl_nerf_tpu/evaluation/lpips_vgg16.npz

Torch conv weights are [out, in, kh, kw]; ours are HWIO [kh, kw, in, out].
"""
import sys

import numpy as np
import torch


def main():
    vgg_path = sys.argv[1]
    lin_path = sys.argv[2] if len(sys.argv) > 3 else None
    out_path = sys.argv[-1]
    sd = torch.load(vgg_path, map_location="cpu")
    out = {}
    conv_i = 0
    for key in sorted((k for k in sd if k.startswith("features") and k.endswith("weight")),
                      key=lambda k: int(k.split(".")[1])):
        idx = key.rsplit(".", 1)[0]
        w = sd[f"{idx}.weight"].numpy()
        b = sd[f"{idx}.bias"].numpy()
        if w.ndim != 4:
            continue
        out[f"conv{conv_i}_kernel"] = np.transpose(w, (2, 3, 1, 0))
        out[f"conv{conv_i}_bias"] = b
        conv_i += 1
    if lin_path:
        lin = torch.load(lin_path, map_location="cpu")
        for j in range(5):
            key = f"lin{j}.model.1.weight"
            if key in lin:
                out[f"lin{j}_weight"] = lin[key].numpy().reshape(-1)
    np.savez(out_path, **out)
    print(f"wrote {out_path} with {conv_i} conv layers")


if __name__ == "__main__":
    main()
