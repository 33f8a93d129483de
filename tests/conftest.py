"""Test env: force a virtual 8-device CPU backend.

This is the JAX-native "fake backend" replacing the reference's need for real
GPUs in test_ddp.py (see SURVEY.md §4): multi-device sharding tests run on 8
virtual CPU devices via --xla_force_host_platform_device_count.

Note: this machine's sitecustomize registers a TPU plugin at interpreter
startup and pins ``jax_platforms`` via jax.config (env vars are too late), so
we must override through jax.config as well — BEFORE any backend is used.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
