import jax.numpy as jnp
import numpy as np

from neo360_tpu.core import rays as ray_core
from neo360_tpu.core import render


def test_volsdf_rendering_opaque():
    b, s = 2, 8
    t_vals = jnp.broadcast_to(jnp.linspace(0.1, 1.0, s), (b, s))
    rgb = jnp.zeros((b, s, 3)).at[:, 2, :].set(1.0)
    density = jnp.zeros((b, s)).at[:, 2].set(1e6)
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (b, 1))
    comp, acc, w, depth = render.volume_rendering_volsdf(
        rgb, density, t_vals, dirs, False)
    np.testing.assert_allclose(np.asarray(comp[:, 0]), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-4)


def test_volsdf_empty_white():
    b, s = 2, 8
    t_vals = jnp.broadcast_to(jnp.linspace(0.1, 1.0, s), (b, s))
    comp, acc, *_ = render.volume_rendering_volsdf(
        jnp.zeros((b, s, 3)), jnp.zeros((b, s, 1)), t_vals,
        jnp.ones((b, 3)), True)
    np.testing.assert_allclose(np.asarray(comp), 1.0, atol=1e-5)


def test_sample_rays_in_bbox():
    # two boxes: one centered at origin, one far away
    rot = jnp.stack([jnp.eye(3), jnp.eye(3)])
    trans = jnp.asarray([[0.0, 0.0, 0.0], [100.0, 0.0, 0.0]])
    ext = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 1.0, 1.0]])
    rays_o = jnp.asarray([[-5.0, 0.0, 0.0],    # hits both (origin then far)
                          [-5.0, 50.0, 0.0]])  # misses both
    rays_d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    near, far, mask = ray_core.sample_rays_in_bbox(rays_o, rays_d, rot,
                                                   trans, ext)
    assert bool(mask[0, 0]) and not bool(mask[1, 0])
    np.testing.assert_allclose(float(near[0, 0]), 4.0, atol=1e-5)
    np.testing.assert_allclose(float(far[0, 0]), 6.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(near[1]), 0.0)


def test_sample_rays_in_bbox_rotated():
    # 45-degree rotated box: ray along x enters at sqrt(2)-scaled faces
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    rot = jnp.asarray([[[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]]])
    trans = jnp.zeros((1, 3))
    ext = jnp.ones((1, 3))
    rays_o = jnp.asarray([[-5.0, 0.0, 0.0]])
    rays_d = jnp.asarray([[1.0, 0.0, 0.0]])
    near, far, mask = ray_core.sample_rays_in_bbox(rays_o, rays_d, rot,
                                                   trans, ext)
    assert bool(mask[0, 0])
    np.testing.assert_allclose(float(near[0, 0]), 5.0 - np.sqrt(2), rtol=1e-5)
