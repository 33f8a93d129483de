"""Test env: force a virtual 8-device CPU backend BEFORE jax initializes.

This is the JAX-native "fake backend" replacing the reference's need for real
GPUs in test_ddp.py (see SURVEY.md §4): multi-device sharding tests run on 8
virtual CPU devices via --xla_force_host_platform_device_count.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
