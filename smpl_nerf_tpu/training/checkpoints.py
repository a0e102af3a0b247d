"""Checkpointing: run directories with params + resolved config.

Keeps the reference's run-dir contract (utils.py:267-289): a directory holding
one weights file per model, the fully-resolved config.txt, and a copy of the
dataset's create_dataset_config.txt — re-saved every epoch so runs are always
resumable and self-describing. Weights are flax msgpack (model_<name>.msgpack)
instead of torch .pt; `import_torch_run` converts a reference run directory for
PSNR-parity checks.
"""
from __future__ import annotations

import glob
import os
import shutil
from typing import Any, Dict, Optional

import jax
from flax import serialization


def _host_tree(tree):
    """Bring a (possibly multi-host-sharded) pytree fully to this host.

    jax.device_get raises on arrays spanning non-addressable devices (e.g.
    width-sharded params under --multihost --tensor_parallel); those need a
    cross-process allgather. NOTE: the allgather is a COLLECTIVE — callers
    must invoke the save functions from EVERY process (the process-0 guard
    lives inside, after gathering)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if any(getattr(l, "is_fully_addressable", True) is False for l in leaves):
        from jax.experimental import multihost_utils
        return multihost_utils.process_allgather(tree, tiled=True)
    return jax.device_get(tree)


def save_run(save_dir: str, params: Dict[str, Any], args=None,
             parser=None, dataset_dir: Optional[str] = None):
    host_params = {name: _host_tree(p) for name, p in params.items()}
    if jax.process_index() != 0:
        return
    os.makedirs(save_dir, exist_ok=True)
    for name, p in host_params.items():
        path = os.path.join(save_dir, f"model_{name}.msgpack")
        with open(path, "wb") as fh:
            fh.write(serialization.to_bytes(p))
    if parser is not None and args is not None:
        parser.write_config_file(args, [os.path.join(save_dir, "config.txt")])
    ds_dir = dataset_dir or (getattr(args, "dataset_dir", None) if args else None)
    if ds_dir:
        src = os.path.join(ds_dir, "create_dataset_config.txt")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(save_dir, "create_dataset_config.txt"))


def save_train_state(save_dir: str, opt_state, ema_params=None,
                     epoch: Optional[int] = None, raw_params=None,
                     best_val: Optional[float] = None):
    """Full-fidelity resume state: optimizer moments (+ EMA shadow + RAW
    weights + epoch).

    The reference (and save_run above, its contract) persists weights only, so
    a crash mid-run restarts Adam's moments cold. train_state.npz stores the
    flattened opt-state leaves (structure comes from a freshly initialized
    opt_state at load time). When --param_ema is on, save_run stores the EMA
    shadow as the run's weights, so the RAW training weights the moments
    belong to must be persisted here too — else a resume would apply the
    restored moments to the lagged EMA weights.
    """
    import numpy as np
    blob = {}
    for prefix, tree in (("opt", opt_state), ("ema", ema_params),
                         ("raw", raw_params)):
        if tree is None:
            continue
        host = _host_tree(tree)
        for i, l in enumerate(jax.tree_util.tree_leaves(host)):
            blob[f"{prefix}_{i}"] = np.asarray(l)
    if jax.process_index() != 0:
        return
    if epoch is not None:
        blob["epoch"] = np.asarray(epoch)
    if best_val is not None and np.isfinite(best_val):
        blob["best_val"] = np.asarray(best_val)
    os.makedirs(save_dir, exist_ok=True)
    np.savez(os.path.join(save_dir, "train_state.npz"), **blob)


def broadcast_file(path: str):
    """Multihost: read `path` on process 0 and broadcast its bytes to all.

    Without a shared filesystem only process 0 may see train_state.npz; if
    each process checked os.path.exists locally, process 0 would enter the
    collective restore path while the others skipped it — a deadlock. Every
    process therefore learns existence AND content from process 0. Returns
    the file bytes on every process, or None when process 0 has no file.
    """
    import numpy as np
    from jax.experimental import multihost_utils
    if jax.process_index() == 0 and os.path.exists(path):
        with open(path, "rb") as fh:
            data = np.frombuffer(fh.read(), np.uint8)
    else:
        data = np.zeros(0, np.uint8)
    n = int(multihost_utils.broadcast_one_to_all(np.asarray(len(data))))
    if n == 0:
        return None
    buf = np.zeros(n, np.uint8)
    if jax.process_index() == 0:
        buf[:] = data
    return multihost_utils.broadcast_one_to_all(buf).tobytes()


def load_train_state(save_dir: str, opt_state_template, ema_template=None,
                     raw_template=None, data: Optional[bytes] = None):
    """Returns (opt_state, ema, raw_params, meta dict); (None,)*4 if absent.

    `data`: optional in-memory train_state.npz bytes (from broadcast_file) —
    used under multihost so every process parses the identical blob.
    """
    import io

    import numpy as np
    if data is not None:
        blob = np.load(io.BytesIO(data))
    else:
        path = os.path.join(save_dir, "train_state.npz")
        if not os.path.exists(path):
            return None, None, None, None
        blob = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(opt_state_template)
    n = sum(1 for k in blob.files if k.startswith("opt_"))
    if n != len(leaves):
        raise ValueError(f"train_state.npz has {n} optimizer leaves, the "
                         f"current optimizer expects {len(leaves)} — config "
                         "mismatch with the saved run")
    opt = jax.tree_util.tree_unflatten(
        treedef, [blob[f"opt_{i}"] for i in range(n)])

    def _tree(prefix, template):
        if template is None or f"{prefix}_0" not in blob.files:
            return None
        el, et = jax.tree_util.tree_flatten(template)
        return jax.tree_util.tree_unflatten(
            et, [blob[f"{prefix}_{i}"] for i in range(len(el))])

    meta = {"epoch": int(blob["epoch"]) if "epoch" in blob.files else None,
            "best_val": (float(blob["best_val"])
                         if "best_val" in blob.files else None)}
    return opt, _tree("ema", ema_template), _tree("raw", raw_template), meta


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


def export_torch_run(run_dir: str, out_dir: str) -> Dict[str, str]:
    """Inverse of import_torch_run: write reference-layout model_*.pt files.

    Reads this framework's model_<name>.msgpack checkpoints (template-free
    msgpack restore) and saves torch state_dicts the reference's
    load_run/solvers can consume (reference utils.py save_run contract) —
    migration works in both directions. Returns {model name: .pt path}.
    """
    import torch

    from smpl_nerf_tpu.models import render_ray_net, warp_field_net

    os.makedirs(out_dir, exist_ok=True)
    written: Dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(run_dir, "model_*.msgpack"))):
        name = os.path.basename(path)[len("model_"):-len(".msgpack")]
        with open(path, "rb") as fh:
            params = serialization.msgpack_restore(fh.read())
        tree = params.get("params", params)
        if name in ("model_coarse", "model_fine"):
            n_layers = 1 + sum(1 for k in tree if k.startswith("positional_net_"))
            sd = render_ray_net.export_torch_state_dict(params, n_layers)
        elif name == "model_warp_field":
            sd = warp_field_net.export_torch_state_dict(params)
        else:
            continue  # estimator/embedder families have no reference loader
        out_path = os.path.join(out_dir, f"{name}.pt")
        torch.save({k: torch.tensor(v) for k, v in sd.items()}, out_path)
        written[name] = out_path
    return written
