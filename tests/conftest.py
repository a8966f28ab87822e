"""Test configuration: run on a virtual 8-device CPU mesh.

Sharding logic is validated on CPU (SURVEY.md §4).  The suite must NEVER
initialize the remote axon TPU backend: the device is exclusive and
flaky, and a wedged remote end hangs even backend *init* for the
process's whole lifetime — with the plugin active, the entire suite dies
at collection.  The plugin is registered by /root/.axon_site's
sitecustomize.py at interpreter start (before this file runs) and its
backend factory ignores JAX_PLATFORMS — even ``jax.devices("cpu")``
initializes it.  The only reliable in-process cure is to DEREGISTER the
factory before the first backend init, which is what we do below.

(Equivalent out-of-process recipe, for ad-hoc CPU runs outside pytest:
strip `.axon_site` from PYTHONPATH, e.g.
``PYTHONPATH=/root/repo python -m pytest tests/ -q``.)
"""

import os

# Env vars first: these take effect when jax has NOT been imported yet
# (e.g. when .axon_site is absent from PYTHONPATH).
os.environ["JAX_NUM_CPU_DEVICES"] = "8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# Under the axon image jax was already imported by sitecustomize, so the
# env vars above were latched too late — set the config values directly
# and drop the axon backend factory before any backend initializes.
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

assert all(d.platform == "cpu" for d in jax.devices())

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
