"""Packaging surface smoke tests.

This image forbids installs, so instead of a venv editable-install we pin
the two shipped entry surfaces directly: ``python -m vae_latent_geometry_tpu``
(module execution via ``__main__.py``) and the ``vlg-tpu`` console script's
target resolved from pyproject.toml — so neither can rot without a test
noticing (the console script had no coverage at all through round 4).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_python_dash_m_entry_help():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "vae_latent_geometry_tpu", "--help"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-800:]
    assert "optimize" in out.stdout and "train" in out.stdout


def test_console_script_target_resolves_from_pyproject():
    # parse the [project.scripts] table the installed `vlg-tpu` binary would
    # bind to, import that exact module:function, and drive it with --help
    try:
        import tomllib
    except ImportError:  # pragma: no cover - py<3.11
        pytest.skip("tomllib unavailable")
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        proj = tomllib.load(f)["project"]
    scripts = proj["scripts"]
    assert "vlg-tpu" in scripts
    mod_name, func_name = scripts["vlg-tpu"].split(":")
    import importlib

    fn = getattr(importlib.import_module(mod_name), func_name)
    old_argv = sys.argv
    sys.argv = ["vlg-tpu", "--help"]
    try:
        with pytest.raises(SystemExit) as e:
            fn()
        assert e.value.code in (0, None)
    finally:
        sys.argv = old_argv


def test_pyproject_package_discovery_matches_tree():
    """Every on-disk (sub)package must (a) be a real package (__init__.py —
    setuptools find() drops module dirs without one) and (b) have its dotted
    name matched by pyproject's packages.find include patterns — otherwise a
    built wheel silently ships without it."""
    import fnmatch

    try:
        import tomllib
    except ImportError:  # pragma: no cover - py<3.11
        pytest.skip("tomllib unavailable")
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        cfg = tomllib.load(f)
    include = cfg["tool"]["setuptools"]["packages"]["find"]["include"]

    pkg_root = os.path.join(REPO, "vae_latent_geometry_tpu")
    found = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        if any(f.endswith(".py") for f in filenames):
            assert "__init__.py" in filenames, (
                f"{dirpath} has modules but no __init__.py — "
                "setuptools find() would drop it from the wheel")
            dotted = os.path.relpath(dirpath, REPO).replace(os.sep, ".")
            found.append(dotted)
    assert "vae_latent_geometry_tpu" in found
    for dotted in found:
        assert any(fnmatch.fnmatch(dotted, pat) for pat in include), (
            f"package {dotted} matches no packages.find include pattern "
            f"{include} — the wheel would drop it")
