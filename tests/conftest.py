"""Test configuration: force the CPU backend with 8 virtual devices.

Must run before jax initializes — multi-chip semantics (shard_map / psum)
are tested on a fake 8-device CPU mesh exactly as the driver's
``dryrun_multichip`` does (SURVEY.md §4).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(__file__))

import json  # noqa: E402

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def pan_tadeusz():
    with open(os.path.join(REFERENCE, "data/pan_tadeusz.json")) as f:
        return json.load(f)


@pytest.fixture(scope="session")
def pan_tadeusz_golden():
    with open(os.path.join(REFERENCE, "data/pan_tadeusz.tokens.json")) as f:
        return json.load(f)


@pytest.fixture(scope="session")
def train_5k():
    with open(os.path.join(REFERENCE, "data/train-5K.json")) as f:
        return json.load(f)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running conformance test")
