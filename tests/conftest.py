"""Test harness config: force CPU platform with 8 virtual devices so
multi-chip sharding tests run without TPU hardware.

The container's sitecustomize registers the axon TPU backend at interpreter
start and presets JAX_PLATFORMS=axon, so a plain setdefault is not enough —
force the platform both via env (for subprocesses) and jax.config (the
backend is registered but not yet initialized at conftest import time).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# A dead/wedged accelerator tunnel leaves the axon plugin's retry threads
# wedging plain `import jax` even under JAX_PLATFORMS=cpu (ROUND1_NOTES
# incident; re-confirmed round 3). Tests never touch the tunnel — scrub the
# pool address so the plugin cannot dial it.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (heavyweight e2e/scale runs; "
             "the default profile is the fast inner-loop suite)")


def pytest_collection_modifyitems(config, items):
    """Fast/slow split: `pytest tests/` is the inner-loop profile
    (minutes); `pytest tests/ --runslow` is the full suite (documented in
    tests/README.md with measured timings)."""
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    One pytest process compiles 150+ distinct XLA programs; on this
    host the XLA:CPU compiler segfaults deterministically once enough
    compiled state accumulates (observed at ~82% of the suite,
    backend_compile_and_load frame, zero Python-side leak). Modules
    rarely share program shapes, so the re-compile cost is small.
    """
    yield
    jax.clear_caches()
