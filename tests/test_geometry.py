import jax.numpy as jnp
import numpy as np

from neo360_tpu.core import geometry


def _pose(seed=0):
    rng = np.random.default_rng(seed)
    c2w = np.eye(4)
    c2w[:3, :3] = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    c2w[:3, 3] = rng.normal(size=3)
    return c2w


def test_world2camera_inverts_pose():
    c2w = _pose()
    rng = np.random.default_rng(1)
    pts_cam = rng.normal(size=(1, 10, 3))
    # world = R p + t; world2camera should recover p
    pts_world = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
    out = geometry.world2camera(jnp.asarray(pts_world),
                                jnp.asarray(c2w)[None])
    np.testing.assert_allclose(np.asarray(out), pts_cam, atol=1e-5)


def test_world2camera_viewdirs_rotation_only():
    c2w = _pose(2)
    rng = np.random.default_rng(3)
    d_cam = rng.normal(size=(1, 7, 3))
    d_world = d_cam @ c2w[:3, :3].T
    out = geometry.world2camera_viewdirs(jnp.asarray(d_world),
                                         jnp.asarray(c2w)[None])
    np.testing.assert_allclose(np.asarray(out), d_cam, atol=1e-6)


def test_repeat_interleave():
    x = jnp.asarray([[1.0], [2.0]])
    out = geometry.repeat_interleave(x, 3)
    np.testing.assert_allclose(
        np.asarray(out)[:, 0], [1, 1, 1, 2, 2, 2])


def test_projection_pinhole():
    # camera frame point at (x, y, -z): uv = (-x/-z)*f + c = (x/z)*f + c
    pts = jnp.asarray([[[0.5, -0.25, -2.0]]])
    focal = jnp.asarray([[100.0, -100.0]])   # negated fy, per the encoder
    center = jnp.asarray([[160.0, 120.0]])
    uv = geometry.projection(pts, focal, center)
    # u = -0.5 / -2 * 100 + 160 = 185 ; v = -(-0.25)/(-2) * -100 + 120 = 132.5
    np.testing.assert_allclose(np.asarray(uv)[0, 0], [185.0, 132.5],
                               rtol=1e-5)


def test_world_grid():
    g = geometry.get_world_grid([[-1, 1], [-1, 1], [0, 1]], [4, 4, 2])
    assert g.shape == (1, 32, 3)
    g = np.asarray(g)
    assert g[0, :, 2].min() == 0.0 and g[0, :, 2].max() == 1.0
    # ij-ordering: the last axis (z) varies fastest
    np.testing.assert_allclose(g[0, 0], [-1, -1, 0])
    np.testing.assert_allclose(g[0, 1], [-1, -1, 1])


def test_homography_warp_identity():
    """Identity proj_mat at depth 1 must reproduce the source features."""
    import numpy as np
    import jax.numpy as jnp
    from neo360_tpu.core.geometry import homography_warp

    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((1, 6, 8, 4)), jnp.float32)
    proj = jnp.eye(3, 4)[None]           # src == ref, zero translation
    depths = jnp.asarray([[1.0, 2.0]])
    out = homography_warp(feat, proj, depths)
    assert out.shape == (1, 2, 6, 8, 4)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(feat[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[0, 1]), np.asarray(feat[0]),
                               atol=1e-5)


def test_homography_warp_translation():
    """A pure x-shift in pixel space shifts the sampled features."""
    import numpy as np
    import jax.numpy as jnp
    from neo360_tpu.core.geometry import homography_warp

    feat = jnp.broadcast_to(jnp.arange(8.0)[None, None, :, None],
                            (1, 2, 8, 1))
    proj = jnp.eye(3, 4)[None].at[0, 0, 3].set(2.0)   # u' = u + 2/depth
    depths = jnp.asarray([[1.0]])
    out = homography_warp(feat, proj, depths)[0, 0, 0, :, 0]
    np.testing.assert_allclose(np.asarray(out[:6]),
                               np.arange(2.0, 8.0), atol=1e-5)
    # out-of-bounds -> zeros padding
    np.testing.assert_allclose(np.asarray(out[6:]), [0.0, 0.0], atol=1e-5)
