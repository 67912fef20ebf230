"""Test harness: force JAX onto 8 emulated CPU devices.

Multi-chip sharding is validated without TPU hardware, per SURVEY.md §4.
NOTE: this environment pre-imports jax and registers the TPU PJRT plugin in
*every* python process via a sitecustomize (PYTHONPATH=/root/.axon_site), so
env-var settings here would be too late — but backends initialize lazily, so
`jax.config.update("jax_platforms", "cpu")` before the first device use still
wins, and XLA_FLAGS is read at CPU-client creation time.
"""

import os
import sys

# fresh containers have no editable install; the repo root on sys.path makes
# `import tpu3drec` / `import baseline` work regardless
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache (env vars are too late — jax is pre-imported by
# the sitecustomize); cuts repeat-suite wall time substantially
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu3drec_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
