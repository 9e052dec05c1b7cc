"""Test configuration: run on a virtual 8-device CPU mesh.

Tests exercise TPU-shaped code paths (static shapes, shard_map over a Mesh)
on host CPU so they run anywhere; the driver separately compiles the
multi-chip path and benchmarks on real TPU hardware.
"""

import os
import sys

# The sandbox injects an 'axon' PJRT plugin (TPU tunnel with REMOTE
# compilation) via PYTHONPATH; with it loaded, even CPU-only runs stall for
# minutes on network waits and every XLA compile goes through the tunnel.
# Tests are CPU-only: strip it before jax import.
sys.path = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":") if ".axon_site" not in p
)

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the sandbox presets 'axon'
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The sandbox's sitecustomize imports jax at interpreter startup (before this
# conftest), so JAX_PLATFORMS was already read as 'axon'; force CPU via the
# live config too.
jax.config.update("jax_platforms", "cpu")

# x64 is enabled session-wide so float64 oracles are exact; production-path
# tests pass explicit float32 inputs to exercise the TPU dtype discipline.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA compiles are very slow in this sandbox;
# caching them on disk makes repeated test runs fast.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
