"""Test configuration: run on a virtual 8-device CPU mesh.

Sharding logic is validated on CPU (SURVEY.md §4).  Note: under the axon
TPU tunnel, JAX_PLATFORMS=cpu is not honored, so we also pin the default
device to cpu:0 after import — otherwise every eager op round-trips to the
remote TPU chip.
"""

import os

# force (not setdefault): the machine env exports JAX_PLATFORMS=axon
os.environ["JAX_NUM_CPU_DEVICES"] = "8"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if any(d.platform != "cpu" for d in jax.devices()):
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

import gzip
import pathlib

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
GOLDEN = pathlib.Path(__file__).parent.parent / "golden"
REFERENCE = pathlib.Path("/root/reference")


def cpu_devices(n=None):
    ds = jax.devices("cpu")
    return ds if n is None else ds[:n]


@pytest.fixture(scope="session")
def fixtures():
    return FIXTURES


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN


def read_fixture_text(name: str) -> str:
    with gzip.open(FIXTURES / name, "rt") as f:
        return f.read()


@pytest.fixture(scope="session")
def ml100k_base_text():
    return read_fixture_text("ml100k.base.feature.gz")


@pytest.fixture(scope="session")
def ml100k_test_text():
    return read_fixture_text("ml100k.test.feature.gz")
