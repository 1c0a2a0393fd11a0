"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding tests run on an emulated 8-device CPU mesh
(SURVEY.md §4); real-TPU execution is exercised by bench.py and the
driver's graft entry instead.  Must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment may pre-import jax with a TPU plugin (axon sitecustomize),
# making the env var too late — force the platform through the config API.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
REFERENCE = pathlib.Path("/root/reference")

sys.path.insert(0, str(REPO))


def has_reference() -> bool:
    return REFERENCE.exists()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def import_reference_flow_utils():
    """Import the reference's flow_utils for golden comparisons.

    The reference is study-only public content: we import it in tests to
    verify numerical parity, never to reuse its code in the package.
    """
    if not has_reference():
        pytest.skip("reference repo not mounted")
    for p in (str(REFERENCE), str(REFERENCE / "src/ebsynth/deps/gmflow")):
        if p not in sys.path:
            sys.path.insert(0, p)
    import importlib

    return importlib.import_module("src.flow_utils")
