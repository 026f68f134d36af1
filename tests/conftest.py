"""Test configuration: force an 8-device virtual CPU mesh.

The image's sitecustomize initializes the axon (real-TPU) JAX backend at
interpreter start, so env vars alone are too late — we re-point the already-
imported jax at CPU and re-initialize with 8 virtual devices. This replaces
the reference's untestable DDP path (SURVEY §4): every multi-device test runs
against jax.sharding over 8 virtual CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import jax.extend.backend  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.extend.backend.clear_backends()
jax.config.update("jax_num_cpu_devices", 8)

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
