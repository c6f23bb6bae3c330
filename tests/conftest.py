"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers a tunneled TPU PJRT backend ("axon")
at interpreter start and overrides JAX_PLATFORMS, so the env var alone is not
enough — we also force the platform through jax.config before any backend is
used. XLA_FLAGS must still be set before jax import for the host-device count
to take effect.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False, help="run slow tests")
    parser.addoption(
        "--rundownload", action="store_true", default=False,
        help="run tests that download pinned checkpoints (needs egress)",
    )


def pytest_collection_modifyitems(config, items):
    skip_slow = pytest.mark.skip(reason="need --runslow option to run")
    skip_dl = pytest.mark.skip(reason="need --rundownload option (and egress) to run")
    for item in items:
        if "slow" in item.keywords and not config.getoption("--runslow"):
            item.add_marker(skip_slow)
        if "download" in item.keywords and not config.getoption("--rundownload"):
            item.add_marker(skip_dl)


@pytest.fixture(autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu"
