"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding layouts are validated without TPU hardware via
``xla_force_host_platform_device_count`` (the standard way to test pjit
layouts); set before any jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# importing torch (the checkpoint converter does) re-registers the TPU
# plugin and defeats JAX_PLATFORMS; pin the platform through jax.config too
import jax

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: a cold host (fresh boot, wiped /tmp compile
# cache) otherwise pays ~10 min of XLA compiles for the default suite vs
# ~3 min warm; keep the cache inside the repo so reboots don't wipe it
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

REFERENCE = Path("/root/reference")


@pytest.fixture(scope="session")
def reference_path():
    if not REFERENCE.exists():
        pytest.skip("reference checkout not available")
    return REFERENCE


@pytest.fixture(scope="session")
def reference_maze_env(reference_path):
    """The reference MazeEnv (pure numpy), imported read-only for goldens.

    Loaded by file path (the reference environment package __init__ pulls in
    pybullet, which is not installed here).
    """

    import importlib.util
    import types

    pkg = types.ModuleType("_refenv")
    pkg.__path__ = [str(reference_path / "environment")]
    sys.modules["_refenv"] = pkg
    for mod in ("env_config", "maze_env"):
        spec = importlib.util.spec_from_file_location(
            f"_refenv.{mod}", reference_path / "environment" / f"{mod}.py"
        )
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"_refenv.{mod}"] = m
        spec.loader.exec_module(m)

    ref_cls = sys.modules["_refenv.maze_env"].MazeEnv

    def make(dim=2, name="mazes_15_%d_3000"):
        return ref_cls(
            dim=dim,
            map_file=str(reference_path / "maze_files" / (name % dim + ".npz"))
            if "%d" in name
            else str(reference_path / "maze_files" / (name + ".npz")),
        )

    return make
