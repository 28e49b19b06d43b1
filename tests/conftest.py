"""Test configuration: force an 8-device virtual CPU mesh so sharding
tests run without TPU hardware.  Must run before jax is imported."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon site plugin pins jax_platforms to "axon,cpu" at interpreter
# startup (sitecustomize), overriding the env var — pin it back.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def dna_alpha():
    from vstree_tpu.core.alphabet import dna_alphabet

    return dna_alphabet()


def random_dna_text(rng, n, n_wild=0, n_sep=0):
    """Random encoded DNA text with optional wildcards/separators."""
    t = rng.integers(0, 4, size=n).astype(np.uint8)
    if n_wild:
        t[rng.choice(n, size=min(n_wild, n), replace=False)] = 254
    if n_sep:
        t[rng.choice(n, size=min(n_sep, n), replace=False)] = 255
    return t
