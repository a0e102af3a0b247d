"""Multi-host (2-process) data path: per-process batch assembly is exact.

Spawns two real processes (4 virtual CPU devices each) stitched by
jax.distributed into one 8-device mesh, trains the same seeded tiny problem,
and requires: (a) global batch assembly from per-process rows round-trips
exactly, (b) both processes see identical loss histories, (c) those histories
match a SINGLE-process 8-device run — i.e. --multihost changes how bytes reach
the devices, not the math. (SURVEY §2.9 / VERDICT round-1 weak #6.)
"""
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env["MH_LOG_DIR"] = str(tmp_path / "mh_run")
    procs = [subprocess.Popen([sys.executable, worker, coord, str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, cwd=os.path.dirname(os.path.dirname(worker)),
                              env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"ASSEMBLY_OK process={i}" in out, out

    def losses(out):
        m = re.search(r"LOSSES process=\d train=([\d.,]+) val=([\d.,]+)", out)
        assert m, out
        return (np.array([float(x) for x in m.group(1).split(",")]),
                np.array([float(x) for x in m.group(2).split(",")]))

    t0, v0 = losses(outs[0])
    t1, v1 = losses(outs[1])
    # both controllers observe the same global computation
    np.testing.assert_allclose(t0, t1, rtol=0, atol=0)
    np.testing.assert_allclose(v0, v1, rtol=0, atol=0)

    def tp_losses(out):
        m = re.search(r"TP_LOSSES process=\d train=([\d.,]+)", out)
        assert m, out
        return np.array([float(x) for x in m.group(1).split(",")])

    tp0, tp1 = tp_losses(outs[0]), tp_losses(outs[1])
    np.testing.assert_allclose(tp0, tp1, rtol=0, atol=0)

    # cross-process TP checkpoint save/restore (collective gather path)
    for out in outs:
        m = re.search(r"TP_CKPT process=\d restored=(\w+) match=(\w+) "
                      r"offset=(\d+)", out)
        assert m, out
        assert m.group(1) == "True" and m.group(2) == "True", out
        assert int(m.group(3)) == 2, out  # trained 2 epochs -> resume at 2

    # process-0-only checkpoint visibility: both processes restore via the
    # broadcast path (no deadlock, no divergent branch)
    for out in outs:
        m = re.search(r"PRIVATE_CKPT process=\d restored=(\w+) match=(\w+)", out)
        assert m, out
        assert m.group(1) == "True" and m.group(2) == "True", out

    # single-process ground truth (this process: 8 virtual devices, conftest)
    from tests.multihost_worker import run_training
    history = run_training()
    np.testing.assert_allclose(t0, np.array(history["train_loss"]), rtol=2e-5)
    np.testing.assert_allclose(v0, np.array(history["val_loss"]), rtol=2e-5)
    # multi-host TP trains the same problem to the same losses
    history_tp = run_training(("--mesh_shape=4,2", "--tensor_parallel=1"))
    np.testing.assert_allclose(tp0, np.array(history_tp["train_loss"]), rtol=2e-4)
