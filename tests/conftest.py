"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use XLA's
host-platform device virtualization (8 CPU "devices") so every
shard_map/pjit path compiles and executes with real collectives.
MUST set env vars before jax is first imported.
"""

import os

_want = os.environ.get("CLANN_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _want
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: the nested while-loop search program takes
# minutes to compile on the single-core CI host; cache it across runs.
# OWN directory, NOT the relay-shared ~/.cache/jax_comp_cache: the axon
# relay populates that one with CPU AOT entries compiled on ANOTHER
# machine (cpu_aot_loader warns "machine type ... doesn't match ... could
# lead to execution errors such as SIGILL"), and loading a foreign entry
# segfaulted two full local test runs mid-suite (round 5; the crashing
# test passes in isolation). Local CPU runs must only share cache entries
# compiled on this host.
os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.expanduser(
    "~/.cache/jax_comp_cache_cpu_local"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# The ambient axon sitecustomize registers the TPU PJRT plugin and sets
# jax_platforms="axon,cpu" programmatically, overriding the env var. The
# backend is not yet initialized at conftest time, so pin the config here to
# force the virtual 8-device CPU mesh for tests.
jax.config.update("jax_platforms", _want)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Fast/slow split: the full suite takes ~25 min on a 1-core host even with
# a warm compilation cache (the sharded/e2e modules each compile
# multi-minute XLA programs). `pytest -m "not slow"` keeps the unit-level
# core — formats, hashing, prefix maps, GMM, kernels-in-interpret,
# metrics, API — inside a few minutes. Membership is by module: every
# module below is dominated by large jitted end-to-end programs.
_SLOW_MODULES = {
    "test_sharded.py",
    "test_sharded_build.py",
    "test_interop.py",
    "test_insert_rebuild.py",
    "test_index_search.py",
    "test_puffinn_compat.py",
    "test_jaccard_join.py",
    "test_gather_block.py",
    "test_global_query.py",
    "test_recall_matrix.py",
    "test_reference_cross.py",
    "test_bench_harness.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The FULL suite accumulates ~350 live compiled programs in one
    XLA:CPU client and segfaults deterministically near the 23rd module
    (round 5: twice at the same jit inside test_reference_cross, which
    passes alone, with its module, and with either suite HALF — only the
    full accumulation crashes; a native XLA/CPython limit, not a code
    bug). Clearing jit caches between modules bounds the live-program
    count; re-traces reload from the persistent on-disk compile cache,
    so the cost is small.
    """
    yield
    import jax

    jax.clear_caches()


@pytest.fixture(scope="session")
def small_angular_dataset():
    """Shared tiny clustered dataset with ground truth (session-cached)."""
    from clann_tpu.data.synthetic import make_synthetic_dataset

    return make_synthetic_dataset(
        n=3000, d=25, n_queries=60, k_gt=50, metric="angular", clustered=True, seed=7
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
