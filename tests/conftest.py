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
# persistent compilation cache: repeated suite runs skip most XLA compiles
# (the dominant cost of this suite); shared across xdist workers (the cache
# is multi-process safe — sha-named files + atomic rename)
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            os.path.expanduser("~/.cache/jax_test_cache"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Shared stubs for optional reference-side dependencies that are absent in
# this environment. One complete stub here, so per-file partial stubs can't
# shadow each other depending on collection order.
# ---------------------------------------------------------------------------
import contextlib  # noqa: E402
import importlib.machinery  # noqa: E402
import sys as _sys  # noqa: E402
import types as _types  # noqa: E402


def _install_stub(name, build):
    try:
        __import__(name)
    except ImportError:
        mod = build()
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        _sys.modules[name] = mod


def _build_omegaconf():
    m = _types.ModuleType("omegaconf")
    m.II = lambda key: f"${{{key}}}"
    m.MISSING = "???"
    m.DictConfig = dict
    m.ListConfig = list

    @contextlib.contextmanager
    def open_dict(*args, **kwargs):
        yield None

    m.open_dict = open_dict

    class OmegaConf:
        @staticmethod
        def is_config(obj):
            return False

        @staticmethod
        def set_struct(*a, **k):
            pass

    m.OmegaConf = OmegaConf
    return m


def _build_torchaudio():
    m = _types.ModuleType("torchaudio")
    m.transforms = _types.ModuleType("torchaudio.transforms")
    return m


_install_stub("omegaconf", _build_omegaconf)
_install_stub("torchaudio", _build_torchaudio)


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False, help="run slow tests")
    parser.addoption(
        "--rundownload", action="store_true", default=False,
        help="run tests that download pinned checkpoints (needs egress)",
    )


def _slow_manifest():
    """Measured-slow tests tiered out of the default run (reference pattern:
    opt-in markers, test/conftest.py:8-84). tests/slow_tests.txt holds one
    nodeid per line, seeded from `--durations` of a full run; regenerate
    after big suite changes. The default tier (`pytest -q`) targets <5 min;
    `--runslow` restores the full suite."""
    import pathlib

    path = pathlib.Path(__file__).parent / "slow_tests.txt"
    if not path.exists():
        return frozenset()
    return frozenset(
        line.strip() for line in path.read_text().splitlines()
        if line.strip() and not line.startswith("#")
    )


def pytest_collection_modifyitems(config, items):
    skip_slow = pytest.mark.skip(reason="need --runslow option to run")
    skip_dl = pytest.mark.skip(reason="need --rundownload option (and egress) to run")
    manifest = _slow_manifest()
    matched = set()
    for item in items:
        if item.nodeid in manifest:
            matched.add(item.nodeid)
            item.add_marker(pytest.mark.slow)
        if "slow" in item.keywords and not config.getoption("--runslow"):
            item.add_marker(skip_slow)
        if "download" in item.keywords and not config.getoption("--rundownload"):
            item.add_marker(skip_dl)
    # a renamed/re-parameterized test silently dropping back into the fast
    # tier (or a stale manifest line) should be visible, not silent — but
    # only when the whole suite was collected (a path/-k selection
    # legitimately collects a subset)
    if not config.args or config.args == [str(config.rootpath / "tests")] or (
        len(config.args) == 1 and config.args[0].rstrip("/").endswith("tests")
    ):
        stale = manifest - matched
        if stale:
            import warnings

            warnings.warn(
                "tests/slow_tests.txt entries match no collected test "
                f"(renamed or stale?): {sorted(stale)[:5]}"
                + (f" ... +{len(stale) - 5} more" if len(stale) > 5 else ""),
                stacklevel=1,
            )


@pytest.fixture(autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu"
