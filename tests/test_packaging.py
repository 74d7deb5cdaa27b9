"""Packaging smoke tests (reference setup.py:1 installs `genrobo3d`; this
framework ships pyproject.toml with console entry points). Every declared
entry point must resolve to an importable callable, and the config YAMLs
must ship as package data."""
import os
import subprocess
import sys

import pytest

try:
    import tomllib
except ImportError:  # py<3.11
    tomllib = None

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(tomllib is None, reason="tomllib unavailable")
def test_entry_points_resolve():
    with open(os.path.join(REPO_ROOT, "pyproject.toml"), "rb") as f:
        proj = tomllib.load(f)
    scripts = proj["project"]["scripts"]
    assert len(scripts) >= 10
    import importlib
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, func_name, None)
        assert callable(fn), f"{name} -> {target} does not resolve"


def test_package_data_yaml_listed():
    cfg_dir = os.path.join(REPO_ROOT, "robot3dlotus_tpu", "configs", "rlbench")
    yamls = sorted(f for f in os.listdir(cfg_dir) if f.endswith(".yaml"))
    assert yamls == ["motion_planner_ptv3.yaml", "robot_pipeline.yaml",
                     "robot_pipeline_gt.yaml", "simple_policy_ptv3.yaml"]


@pytest.mark.slow
def test_cli_help_subprocess():
    """One installed-style CLI runs end to end (argparse --help exits 0)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "robot3dlotus_tpu.scripts.fetch_assets",
         "--help"], capture_output=True, text=True, env=env, cwd=REPO_ROOT,
        timeout=120)
    assert out.returncode == 0, out.stderr
    assert "--dst" in out.stdout
