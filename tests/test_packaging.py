"""Packaging surface: every console script in pyproject.toml resolves.

The reference is used as a flat checkout of scripts (/root/reference/train.py
etc.); this framework additionally installs as a package (`pip install .`)
with `vcvits-*` console scripts. These tests pin the entry-point wiring
without running an actual pip install (slow on this host).
"""

from __future__ import annotations

import importlib
import os
import tomllib

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject() -> dict:
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve():
    scripts = _pyproject()["project"]["scripts"]
    assert len(scripts) == 8
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func_name)), f"{name} -> {target}"


def test_root_shims_match_cli_modules():
    # `python train.py ...` (reference-style flat usage) must hit the same
    # main as the installed `vcvits-train`.
    for shim in ("train", "infer", "serve", "filelist", "split",
                 "train_tts", "infer_tts", "convert_checkpoint"):
        path = os.path.join(ROOT, f"{shim}.py")
        assert os.path.exists(path), shim
        src = open(path).read()
        assert f"from vcvits_tpu.cli.{shim} import main" in src, shim


def test_native_lib_listed_as_package_data():
    data = _pyproject()["tool"]["setuptools"]["package-data"]
    assert "*.so" in data["vcvits_tpu.native"]


def test_version_consistent():
    import vcvits_tpu

    assert _pyproject()["project"]["version"] == vcvits_tpu.__version__
