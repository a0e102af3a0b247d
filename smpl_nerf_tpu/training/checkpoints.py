"""Checkpointing: run directories with params + resolved config.

Keeps the reference's run-dir contract (utils.py:267-289): a directory holding
one weights file per model, the fully-resolved config.txt, and a copy of the
dataset's create_dataset_config.txt — re-saved every epoch so runs are always
resumable and self-describing. Weights are flax msgpack (model_<name>.msgpack)
instead of torch .pt; `import_torch_run` converts a reference run directory for
PSNR-parity checks.
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import jax
from flax import serialization


def save_run(save_dir: str, params: Dict[str, Any], args=None,
             parser=None, dataset_dir: Optional[str] = None):
    os.makedirs(save_dir, exist_ok=True)
    for name, p in params.items():
        path = os.path.join(save_dir, f"model_{name}.msgpack")
        with open(path, "wb") as fh:
            fh.write(serialization.to_bytes(jax.device_get(p)))
    if parser is not None and args is not None:
        parser.write_config_file(args, [os.path.join(save_dir, "config.txt")])
    ds_dir = dataset_dir or (getattr(args, "dataset_dir", None) if args else None)
    if ds_dir:
        src = os.path.join(ds_dir, "create_dataset_config.txt")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(save_dir, "create_dataset_config.txt"))


def load_run(save_dir: str, params_template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore params into the same pytree structure as params_template."""
    out = {}
    for name, template in params_template.items():
        path = os.path.join(save_dir, f"model_{name}.msgpack")
        with open(path, "rb") as fh:
            out[name] = serialization.from_bytes(jax.device_get(template), fh.read())
    return out


def import_torch_run(run_dir: str, n_layers: int = 8,
                     n_layers_fine: int = 8) -> Dict[str, Any]:
    """Convert a reference torch run dir (model_*.pt state_dicts) to our params."""
    import torch

    from smpl_nerf_tpu.models import render_ray_net, warp_field_net
    params: Dict[str, Any] = {}
    coarse_path = os.path.join(run_dir, "model_coarse.pt")
    if os.path.exists(coarse_path):
        sd = torch.load(coarse_path, map_location="cpu")
        params["model_coarse"] = render_ray_net.import_torch_state_dict(
            {k: v.numpy() for k, v in sd.items()}, n_layers)
    fine_path = os.path.join(run_dir, "model_fine.pt")
    if os.path.exists(fine_path):
        sd = torch.load(fine_path, map_location="cpu")
        params["model_fine"] = render_ray_net.import_torch_state_dict(
            {k: v.numpy() for k, v in sd.items()}, n_layers_fine)
    warp_path = os.path.join(run_dir, "model_warp_field.pt")
    if os.path.exists(warp_path):
        sd = torch.load(warp_path, map_location="cpu")
        params["model_warp_field"] = warp_field_net.import_torch_state_dict(
            {k: v.numpy() for k, v in sd.items()})
    return params
