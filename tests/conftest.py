"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh — the TPU-native
analog of testing multi-node without a cluster (SURVEY.md §4).

NOTE this environment's sitecustomize imports jax and registers the 'axon'
TPU plugin before pytest starts, so env vars (JAX_PLATFORMS / XLA_FLAGS) are
read too late — jax.config.update still works because no backend has been
initialized yet.
"""

import os

import jax

# PNY_TPU=1 runs the selected tests on the real accelerator instead — the
# hardware-validation mode for the convergence tests (single chip here, so
# only run tests that don't need the 8-device mesh).
if not os.environ.get("PNY_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    # Persistent compilation cache: this box has a single CPU core and each
    # XLA compile costs seconds; cache across test runs.
    # cache dir keyed by interpreter env: processes launched with a stripped
    # PYTHONPATH (no axon sitecustomize) detect different CPU features and
    # their AOT artifacts are NOT interchangeable (cpu_aot_loader SIGILL
    # warnings, observed NaN garbage when shared)
    _cache_key = (
        "noaxon" if "axon_site" not in os.environ.get("PYTHONPATH", "") else "axon"
    )
    jax.config.update(
        "jax_compilation_cache_dir", f"/tmp/jax_comp_cache_cpu_{_cache_key}"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
