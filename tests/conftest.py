"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This is the "fake cluster" for multi-chip tests (the reference has no
distributed tests at all, SURVEY.md §4); env vars must be set before the
first jax import.
"""

import os

# XLA_FLAGS is read lazily at CPU-client creation, so setting it here works
# even though sitecustomize may have imported jax already.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The environment pre-imports jax with platform 'axon' (real TPU tunnel);
# override to CPU *before* any backend is initialized so tests run on the
# virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# True smoke tier (<1 min on this 1-core box): pure op/structure/data tests
# with no full-model compiles. `pytest -m smoke` is the iteration loop;
# `-m "not slow"` is the pre-commit gate; the full suite is the CI tier.
_SMOKE_MODULES = {
    "test_boxes", "test_config", "test_ops", "test_structures_extra",
    "test_misc", "test_data",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__ in _SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture(scope="session")
def default_cfg():
    from oneshotdet_tpu.config import cfg

    c = cfg.clone()
    c.defrost()
    return c
