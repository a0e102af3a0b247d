"""Packaging surface: pyproject console entry points resolve to callables.

The framework is pip-installable (pyproject.toml); these tests pin the
entry-point targets so a module rename cannot silently break the installed
scripts (the reference ships bare scripts only — no packaging to test).
"""
import importlib
import pathlib
import tomllib


def test_console_scripts_resolve():
    repo = pathlib.Path(__file__).resolve().parents[1]
    cfg = tomllib.loads((repo / "pyproject.toml").read_text())
    scripts = cfg["project"]["scripts"]
    assert set(scripts) == {
        "smplnerf-train", "smplnerf-inference", "smplnerf-create-dataset"}
    for target in scripts.values():
        mod, fn = target.split(":")
        assert callable(getattr(importlib.import_module(mod), fn)), target


def test_version_matches_package():
    import smpl_nerf_tpu

    repo = pathlib.Path(__file__).resolve().parents[1]
    cfg = tomllib.loads((repo / "pyproject.toml").read_text())
    assert cfg["project"]["version"] == smpl_nerf_tpu.__version__
