"""Test harness config: run everything on a virtual 8-device CPU mesh.

The environment may pre-import jax with a TPU platform plugin configured
(JAX_PLATFORMS=axon via sitecustomize), so setting env vars here is too
late; use jax.config.update before any backend is initialised. Unit
tests must be fast and hermetic; sharding tests use 8 virtual CPU
devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _restore_prng_impl():
    """CLI entry points switch the global default PRNG impl to the fast
    TPU rbg generator (regcn_tpu.utils.prng.use_fast_prng); restore it so
    tests that run after test_cli.py keep their deterministic threefry
    draws (the tangent-fast-path gradient parity test is sensitive to
    which side of a clamp boundary the random init lands on)."""
    impl = jax.config.jax_default_prng_impl
    yield
    if jax.config.jax_default_prng_impl != impl:
        jax.config.update("jax_default_prng_impl", impl)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tiny_graph(rng):
    """A small random snapshot: 50 nodes, 6 relations, 120 triples."""
    n, r, m = 50, 6, 120
    triples = np.stack(
        [rng.integers(0, n, m), rng.integers(0, r, m), rng.integers(0, n, m)], axis=1
    )
    triples = np.unique(triples, axis=0)
    return n, r, triples
