"""Test configuration: run everything on a virtual 8-device CPU mesh with
float64 enabled, so golden tests compare against the NumPy/SciPy oracle at
full precision (SURVEY.md §4).  The real-TPU path is exercised by bench.py
and __graft_entry__.py, not the unit suite."""

import gc
import os

# The session environment pins JAX_PLATFORMS to the TPU tunnel ('axon');
# the unit suite must run on the virtual CPU mesh, so override outright.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon plugin rewrites jax_platforms to "axon,cpu" at import time, so the
# env var alone is not enough — force the config after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the suite is compile-dominated (big prefix-scan
# filter graphs, sweep pipelines) and re-runs identical shapes every round —
# cached reruns cut wall time several-fold.  CPU-specific dir (TPU runs use
# /root/.cache/jaxcomp; sharing a dir across hosts triggers AOT
# machine-feature warnings).
os.makedirs("/root/.cache/jaxcomp-cpu", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp-cpu")
# 0.3 s: the suite compiles dozens of mid-size (0.3-2 s) graphs per run;
# caching them is worth far more than the ~ms spent serializing each.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "multihost: two-process distributed tests (run with -m multihost)")


def pytest_collection_modifyitems(config, items):
    # The multihost tests spawn two cold JAX processes (~1 min); keep them
    # out of the default suite — select explicitly with `-m multihost`.
    if "multihost" in (config.getoption("-m") or ""):
        return
    skip = pytest.mark.skip(reason="multihost: run with -m multihost")
    for item in items:
        if "multihost" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="module", autouse=True)
def _gc_freeze_between_modules():
    """Bound Python GC cost: by late modules the process holds millions of
    long-lived objects (jaxprs, compiled executables, test-module constants),
    and every gen-2 collection rescans them all — measured +76 s over the
    full suite (684 s -> 608 s with gc off).  Instead of disabling the
    collector, collect at each module boundary and freeze the survivors into
    the permanent generation, so gen-2 scans only ever cover the current
    module's allocations."""
    gc.collect()
    gc.freeze()
    yield


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
