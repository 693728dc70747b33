"""Test configuration: CPU backend with 8 virtual devices.

Multi-device sharding is validated on a host-platform mesh
(``--xla_force_host_platform_device_count=8``) — the idiomatic JAX "fake
backend" (SURVEY.md §4). Must run before jax initializes a backend, hence the
env mutation at import time. Matmul precision is raised to ``highest`` so
parity tests against torch are tight.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.pop("JAX_PLATFORMS", None)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402

# Modules dominated by XLA model/train-step compiles (minutes on a 1-core
# host). Everything else is the fast always-run tier: `pytest -m fast`.
_SLOW_MODULES = {
    "test_model", "test_trainer_agent", "test_device_preprocess",
    "test_serving", "test_fused", "test_pallas_dense_block", "test_detector",
    "test_reference_parity", "test_detection_agent",
    "test_converter_walk",  # tensorflow import dominates
    "test_converter_real_decode",  # tensorflow import dominates
    "test_cli_e2e",
    "test_multiprocess",  # spawns train-step-compiling subprocesses
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)
        if mod == "test_multiprocess":
            # budget up to 1500 s each on a loaded 1-core host AND spawn
            # compiling subprocesses — NEVER run these concurrently with a
            # perf measurement (an r3 perf number was corrupted exactly
            # this way; BASELINE.md "policy boundary"). Deselect with
            # `pytest -m "not multiprocess"`.
            item.add_marker(pytest.mark.multiprocess)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: compile-heavy (model/trainer) tests")
    config.addinivalue_line("markers", "fast: quick math/IO tier, runs in <1 min")
    config.addinivalue_line(
        "markers",
        "multiprocess: spawns OS subprocesses that compile train steps; "
        "excluded via -m 'not multiprocess' while perf runs are active")


@pytest.fixture(scope="session")
def tiny_config(tmp_path_factory):
    """A small-architecture config for fast CPU tests."""
    from dmmfods_tpu.config import get_config

    cfg = get_config(str(tmp_path_factory.mktemp("host")))
    cfg.tpu.compute_dtype = "float32"
    cfg.model.growth_rate = 8
    cfg.model.block_config = (2, 2, 2, 2)
    cfg.model.num_init_features = 16
    return cfg


@pytest.fixture(scope="session")
def full_config(tmp_path_factory):
    """Reference-default architecture config (DenseNet-121 mid fusion)."""
    from dmmfods_tpu.config import get_config

    cfg = get_config(str(tmp_path_factory.mktemp("host_full")))
    cfg.tpu.compute_dtype = "float32"
    return cfg
