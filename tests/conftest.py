"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so the multi-device sharding
paths are exercised without TPU hardware. Must run before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The axon sitecustomize hook registers the TPU PJRT plugin on first jax
# import whenever PALLAS_AXON_POOL_IPS is set — and during a TPU-service
# outage that registration BLOCKS indefinitely, hanging even CPU-only
# runs (observed 2026-08-18: `import jax` hung >120 s while bare python
# started in 2 s). Tests are CPU-only; drop the hook's trigger.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon harness registers the TPU backend from sitecustomize and pins the
# platform before env vars are consulted; config.update is the reliable
# override to get the deterministic 8-virtual-device CPU platform.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def tmp_db(tmp_path):
    """A fresh initialized database."""
    from facet_tpu.db.schema import init_database

    path = str(tmp_path / "test.db")
    init_database(path)
    return path


@pytest.fixture
def tmp_config(tmp_path):
    """A fresh default scoring config on disk."""
    from facet_tpu.config.default_config import write_default_config

    path = str(tmp_path / "scoring_config.json")
    write_default_config(path)
    return path


@pytest.fixture
def scoring_config(tmp_config):
    from facet_tpu.config.scoring_config import ScoringConfig

    return ScoringConfig(tmp_config)
