"""Test config: force the CPU backend with 8 virtual devices so the suite runs
fast and multi-chip sharding tests work without TPU hardware (SURVEY.md §4).

The container's sitecustomize registers the axon TPU backend at interpreter
startup (before any conftest can run) whenever PALLAS_AXON_POOL_IPS is set,
and every jit then goes through a slow remote-compile tunnel.  To get a clean
CPU backend we re-exec the whole pytest invocation once with that hook
disabled, suspending pytest's fd capture so the child's output streams
through.
"""
import os
import sys

_NEED_REEXEC = bool(os.environ.get("PALLAS_AXON_POOL_IPS")) and not os.environ.get(
    "MACHISPLIN_TEST_REEXEC"
)

if not _NEED_REEXEC:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    _flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_enable_x64", True)
    # persistent compile cache: repeat suite runs skip most XLA compiles
    _cache_dir = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import contextlib

import numpy as np
import pytest


# the documented fast verify subset (`pytest -m quick`, ~3.5 min warm-cache
# vs ~25-30 min full on this single core): substrate + numerics coverage
# without the heavy pipeline/mesh integration walls
_QUICK_MODULES = {
    "test_grid", "test_io", "test_aux", "test_feather",
    "test_tps", "test_nystrom", "test_ensemble", "test_goldens",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)


def _ensure_native_built():
    """Build native/libmachisplin_native.so once per checkout when a
    toolchain exists, so the 4 native tests run by default instead of
    silently skipping in a fresh clone (round-4 VERDICT #7).  Skips
    gracefully (tests keep their skipif) when g++/make are absent or the
    build fails."""
    import shutil
    import subprocess

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(here, "native", "libmachisplin_native.so")
    src = os.path.join(here, "native", "machisplin_native.cpp")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return
    if not (shutil.which("make") and shutil.which("g++")):
        return
    try:
        subprocess.run(
            ["make", "-C", os.path.join(here, "native")],
            check=False, capture_output=True, timeout=120,
        )
    except (OSError, subprocess.TimeoutExpired):
        pass


def pytest_configure(config):
    if not _NEED_REEXEC:
        _ensure_native_built()
        return
    import subprocess

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip()
    env["MACHISPLIN_TEST_REEXEC"] = "1"
    capman = config.pluginmanager.getplugin("capturemanager")
    ctx = capman.global_and_fixture_disabled() if capman else contextlib.nullcontext()
    with ctx:
        code = subprocess.call(list(sys.orig_argv), env=env)
    os._exit(code)


@pytest.fixture
def rng():
    return np.random.default_rng(1313)


@pytest.fixture(scope="session")
def sampling():
    """The reference's bundled 813-station dataset (data-raw/sampling.csv):
    columns long, lat, bio_1 (annual temp), bio_12 (annual precip)."""
    path = os.path.join(os.path.dirname(__file__), "..", "machisplin_tpu", "data", "sampling.csv")
    return np.genfromtxt(path, delimiter=",", names=True)
