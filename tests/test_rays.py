import jax
import jax.numpy as jnp
import numpy as np

from neo360_tpu.core import rays as ray_core


def test_ray_directions_convention():
    h, w, f = 4, 6, 10.0
    d = ray_core.get_ray_directions(h, w, f)
    assert d.shape == (h, w, 3)
    # pixel (row j=0, col i=0): [(0 - w/2)/f, -(0 - h/2)/f, -1]
    np.testing.assert_allclose(
        np.asarray(d[0, 0]), [(0 - w / 2) / f, (h / 2) / f, -1.0], atol=1e-6)
    # no +0.5 centering: center-ish pixel (h/2, w/2) maps exactly to 0
    np.testing.assert_allclose(
        np.asarray(d[h // 2, w // 2]), [0.0, 0.0, -1.0], atol=1e-6)


def test_get_rays_identity_pose():
    h, w, f = 3, 3, 5.0
    d = ray_core.get_ray_directions(h, w, f)
    c2w = jnp.eye(4)[:3, :4]
    r = ray_core.get_rays(d, c2w)
    np.testing.assert_allclose(np.asarray(r["rays_d"]), np.asarray(d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r["rays_o"]), 0.0, atol=1e-6)
    norms = np.linalg.norm(np.asarray(r["viewdirs"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)


def test_pixel_radii_formula():
    h, w, f = 5, 4, 7.0
    d = ray_core.get_ray_directions(h, w, f)
    radii = ray_core.pixel_radii(d)
    assert radii.shape == (h, w, 1)
    dx = np.linalg.norm(np.asarray(d[1]) - np.asarray(d[0]), axis=-1)
    np.testing.assert_allclose(
        np.asarray(radii[0, :, 0]), dx * 2 / np.sqrt(12), rtol=1e-5)
    # last row duplicates the second-to-last difference row
    np.testing.assert_allclose(np.asarray(radii[-1]), np.asarray(radii[-2]))


def test_pd_flip_roundtrip():
    rng = np.random.default_rng(0)
    c2w = np.eye(4)
    c2w[:3, :3] = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    c2w[:3, 3] = rng.normal(size=3)
    flip = np.array([[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
                    dtype=np.float64)
    back = ray_core.convert_pose_pd_to_nerf(c2w @ np.linalg.inv(flip))
    np.testing.assert_allclose(back, c2w, atol=1e-12)
    # translation is untouched by the right-multiplied flip
    np.testing.assert_allclose(
        ray_core.convert_pose_pd_to_nerf(c2w)[:3, 3], c2w[:3, 3])


def test_ray_aabb_intersection():
    rays_o = jnp.array([[-2.0, 0.0, 0.0],   # hits
                        [-2.0, 5.0, 0.0],   # misses
                        [0.0, 0.0, 0.0]])   # starts inside -> no hit
    rays_d = jnp.array([[1.0, 0.0, 0.0]] * 3)
    hit, tn, tf = ray_core.ray_aabb_intersection(
        rays_o, rays_d, [-1, -1, -1], [1, 1, 1])
    np.testing.assert_array_equal(np.asarray(hit), [True, False, False])
    np.testing.assert_allclose(np.asarray(tn)[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tf)[0], 3.0, atol=1e-6)


def test_rays_for_camera_jits():
    out = jax.jit(lambda m: ray_core.rays_for_camera(8, 6, 10.0, m))(
        jnp.eye(4)[:3, :4])
    assert out["rays_o"].shape == (48, 3)
    assert out["radii"].shape == (48, 1)


def test_get_rays_segmented_picks_member_rays():
    h, w = 6, 8
    rng = np.random.default_rng(0)
    masks = np.zeros((h, w, 2), dtype=np.uint8)
    masks[:3, :, 0] = 1      # class A occupies the top half
    masks[4:, :, 1] = 1      # class B the bottom rows
    rays_o = np.arange(h * w * 3, dtype=np.float32).reshape(h * w, 3)
    rays_d = -rays_o
    o_cls, d_cls, ids, fg = ray_core.get_rays_segmented(
        masks, [7, 3], rays_o, rays_d, w, h, n_rays=10, rng=rng)
    assert ids == [3, 7]
    assert fg.shape == (h * w,)
    assert fg.sum() == (3 + 2) * w
    # picked rays must come from the class's own pixels
    seg = np.zeros((h, w), dtype=int)
    seg[masks[:, :, 0] > 0] = 3   # sorted ids: first mask channel <-> id 3
    seg[masks[:, :, 1] > 0] = 7
    for cid, o in zip(ids, o_cls):
        rows = (o[:, 0] / 3).astype(int) // w
        assert np.all(seg.flatten()[(o[:, 0] / 3).astype(int)] == cid), rows


def test_get_rays_mvs_conventions():
    h, w, f = 4, 6, 10.0
    c2w = jnp.eye(4)
    o, d = ray_core.get_rays_mvs(h, w, f, c2w)
    assert o.shape == (h * w, 3) and d.shape == (h * w, 3)
    np.testing.assert_allclose(np.asarray(o), 0.0)
    # +z forward (vs get_ray_directions' -z), center at W/2 exactly
    np.testing.assert_allclose(np.asarray(d[:, 2]), 1.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(d[0]), [(0 - w / 2) / f, (0 - h / 2) / f, 1.0], atol=1e-6)


def test_rot_from_origin_preserves_distance_and_orthonormality():
    from neo360_tpu.data.poses import rot_from_origin
    rng = np.random.default_rng(1)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.3, -0.2, 0.9]
    out = rot_from_origin(c2w, rotation_deg=10.0, rng=rng)
    assert out.shape == (4, 4)
    np.testing.assert_allclose(np.linalg.norm(out[:3, 3]),
                               np.linalg.norm(c2w[:3, 3]), rtol=1e-5)
    rtr = out[:3, :3] @ out[:3, :3].T
    np.testing.assert_allclose(rtr, np.eye(3), atol=1e-5)
    # bounded jitter: rotation angle <= 3 * 10 deg
    cos_angle = (np.trace(out[:3, :3]) - 1.0) / 2.0
    assert cos_angle > np.cos(np.deg2rad(31.0))
