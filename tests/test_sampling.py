import jax
import jax.numpy as jnp
import numpy as np

from neo360_tpu.core import sampling


def _rays(b=4):
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.normal(size=(b, 3)) * 0.1)
    d = jnp.asarray(rng.normal(size=(b, 3)))
    return o, d


def test_stratified_deterministic_linspace():
    o, d = _rays()
    t, pts = sampling.sample_along_rays(o, d, 8, 0.2, 3.0, False, False)
    assert t.shape == (4, 9) and pts.shape == (4, 9, 3)
    np.testing.assert_allclose(np.asarray(t[0]), np.linspace(0.2, 3.0, 9),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pts), np.asarray(o)[:, None] + np.asarray(t)[..., None]
        * np.asarray(d)[:, None], rtol=1e-5)


def test_stratified_lindisp():
    o, d = _rays()
    t, _ = sampling.sample_along_rays(o, d, 4, 0.5, 2.0, False, True)
    u = np.linspace(0, 1, 5)
    expect = 1.0 / (1.0 / 0.5 * (1 - u) + 1.0 / 2.0 * u)
    np.testing.assert_allclose(np.asarray(t[0]), expect, rtol=1e-6)


def test_stratified_randomized_within_bins():
    o, d = _rays()
    key = jax.random.PRNGKey(0)
    t, _ = sampling.sample_along_rays(o, d, 16, 0.2, 3.0, True, False, key)
    t = np.asarray(t)
    base = np.linspace(0.2, 3.0, 17)
    mids = 0.5 * (base[1:] + base[:-1])
    lower = np.concatenate([base[:1], mids])
    upper = np.concatenate([mids, base[-1:]])
    assert np.all(t >= lower - 1e-6) and np.all(t <= upper + 1e-6)
    assert np.all(np.diff(t, axis=-1) >= -1e-6)  # sorted


def test_sorted_piecewise_constant_pdf_uniform():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (2, 9))
    weights = jnp.ones((2, 8))
    s = sampling.sorted_piecewise_constant_pdf(bins, weights, 32, False)
    s = np.asarray(s)
    assert s.shape == (2, 32)
    assert np.all(np.diff(s, axis=-1) >= 0)
    # uniform weights -> approximately uniform quantiles of [0, 1]
    np.testing.assert_allclose(s[0], np.linspace(0, 1, 32, endpoint=False),
                               atol=0.05)


def test_sample_pdf_concentrates():
    o, d = _rays(1)
    bins = jnp.linspace(0.0, 1.0, 17)[None, :]
    w = jnp.zeros((1, 16)).at[0, 8].set(100.0)  # all mass in bin 8
    t_vals = jnp.linspace(0.0, 1.0, 4)[None, :]
    key = jax.random.PRNGKey(1)
    t_new, pts = sampling.sample_pdf(bins, w, o, d, t_vals, 32, True, key)
    assert t_new.shape == (1, 36)
    assert np.all(np.diff(np.asarray(t_new), axis=-1) >= 0)
    inside = np.mean((np.asarray(t_new) >= 0.5) & (np.asarray(t_new) <= 9 / 16))
    assert inside > 0.6  # most merged samples in the hot bin


def test_nerfpp_bg_sampling_shapes_and_order():
    o = jnp.array([[0.1, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.2, 0.1]])
    t, coords, coords_lin = sampling.sample_along_rays_nerfpp(
        o, d, 8, 1e-4, jnp.array([[1.2]]), False, False, in_sphere=False,
        far_uncontracted=3.0)
    assert t.shape == (1, 9)
    assert coords.shape == (1, 9, 4)
    assert coords_lin.shape == (1, 9, 3)
    # t descends 1 -> 0 (inverse depth)
    t = np.asarray(t)
    assert t[0, 0] == 1.0 and abs(t[0, -1]) < 1e-6
    assert np.all(np.diff(t, axis=-1) <= 1e-6)
    # 4D points: unit sphere direction + 1/r channel == t
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(coords[..., :3]), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(coords[..., 3]), t, atol=1e-6)


def test_nerfpp_fg_matches_vanilla():
    o, d = _rays()
    far = jnp.full((4, 1), 2.0)
    t1, p1 = sampling.sample_along_rays_nerfpp(
        o, d, 8, 0.2, far, False, False, in_sphere=True)
    t2, p2 = sampling.sample_along_rays(o, d, 8, 0.2, far, False, False)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-6)
