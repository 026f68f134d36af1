"""Test configuration: force an 8-device virtual CPU mesh.

The image's sitecustomize initializes the axon (real-TPU) JAX backend at
interpreter start, so env vars alone are too late — we re-point the already-
imported jax at CPU and re-initialize with 8 virtual devices. This replaces
the reference's untestable DDP path (SURVEY §4): every multi-device test runs
against jax.sharding over 8 virtual CPU devices.
"""

import hashlib
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import jax.extend.backend  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.extend.backend.clear_backends()
jax.config.update("jax_num_cpu_devices", 8)

# The persistent compilation cache stores XLA:CPU AOT executables whose
# cache key does NOT include the host's CPU features. An AOT blob compiled
# on one machine can load on another with a feature-mismatch warning
# ("+prefer-no-scatter is not supported on the host machine ... could lead
# to execution errors such as SIGILL") and then wedge: we observed a cached
# NeO-360 step spinning all Eigen threads forever, blocking every later
# device_get in the process. Scope the CPU test cache to this machine's
# CPU-flag fingerprint so stale cross-host AOT entries can never load.
def _cpu_cache_dir():
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    tag = hashlib.sha1(flags.encode()).hexdigest()[:10]
    base = os.environ.get("NEO360_TEST_CACHE_BASE",
                          os.path.expanduser("~/jax_cache_cpu"))
    path = f"{base}_{tag}"
    os.makedirs(path, exist_ok=True)
    return path


jax.config.update("jax_compilation_cache_dir", _cpu_cache_dir())

import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh, got "
        f"{jax.default_backend()!r}")
    assert jax.device_count() == 8


@pytest.fixture(scope="session")
def micro_scene(tmp_path_factory):
    """A single synthetic NERDS360-layout scene (see data/fixtures.py)."""
    from neo360_tpu.data.fixtures import make_micro_scene
    root = tmp_path_factory.mktemp("nerds360_scene")
    return make_micro_scene(str(root))


@pytest.fixture(scope="session")
def multi_scene_root(tmp_path_factory):
    """Three micro scenes for the generalizable (AE) loader."""
    from neo360_tpu.data.fixtures import make_multi_scene_root
    root = tmp_path_factory.mktemp("nerds360_multi")
    return make_multi_scene_root(str(root), n_scenes=3)
