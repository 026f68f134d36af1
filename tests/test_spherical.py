import jax.numpy as jnp
import numpy as np

from neo360_tpu.core import spherical


def _rays(b=16, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-0.3, 0.3, size=(b, 3)))
    d = jnp.asarray(rng.normal(size=(b, 3)))
    return o, d


def test_intersect_sphere_exit_point_on_unit_sphere():
    o, d = _rays()
    t = spherical.intersect_sphere(o, d)
    p = np.asarray(o) + np.asarray(t) * np.asarray(d)
    np.testing.assert_allclose(np.linalg.norm(p, axis=-1), 1.0, atol=1e-5)
    assert np.all(np.asarray(t) > 0)


def test_intersect_sphere_axis_ray():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[2.0, 0.0, 0.0]])  # unnormalized
    t = spherical.intersect_sphere(o, d)
    np.testing.assert_allclose(float(t[0, 0]), 0.5, atol=1e-6)  # 0.5 * 2 = 1


def test_depth2pts_outside_properties():
    o, d = _rays(8, seed=1)
    depth = jnp.broadcast_to(jnp.linspace(1.0, 0.1, 6), (8, 6))
    pts = spherical.depth2pts_outside(o, d, depth)
    assert pts.shape == (8, 6, 4)
    # xyz is a unit vector; 4th channel is the inverse radius
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pts[..., :3]), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pts[..., 3]), np.asarray(depth))


def test_depth2pts_outside_depth1_is_sphere_exit():
    # depth (inverse radius) == 1 -> the point IS the sphere exit point
    o, d = _rays(8, seed=2)
    t_exit = spherical.intersect_sphere(o, d)
    p_exit = np.asarray(o) + np.asarray(t_exit) * np.asarray(d)
    pts = spherical.depth2pts_outside(o, d, jnp.ones((8, 1)))
    np.testing.assert_allclose(np.asarray(pts[:, 0, :3]), p_exit, atol=1e-4)
