import jax.numpy as jnp
import numpy as np

from neo360_tpu.core import render


def test_opaque_sample_dominates():
    b, s = 2, 8
    t_vals = jnp.broadcast_to(jnp.linspace(0.1, 1.0, s), (b, s))
    rgb = jnp.zeros((b, s, 3)).at[:, 3, :].set(jnp.array([1.0, 0.5, 0.25]))
    density = jnp.zeros((b, s, 1)).at[:, 3, 0].set(1e6)
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (b, 1))
    comp, acc, weights, depth = render.volumetric_rendering(
        rgb, density, t_vals, dirs, white_bkgd=False)
    np.testing.assert_allclose(np.asarray(comp[0]), [1.0, 0.5, 0.25], atol=1e-4)
    np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(depth[0]), float(t_vals[0, 3]),
                               atol=1e-4)


def test_empty_space_white_background():
    b, s = 2, 8
    t_vals = jnp.broadcast_to(jnp.linspace(0.1, 1.0, s), (b, s))
    rgb = jnp.full((b, s, 3), 0.3)
    density = jnp.zeros((b, s, 1))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (b, 1))
    comp, acc, *_ = render.volumetric_rendering(
        rgb, density, t_vals, dirs, white_bkgd=True)
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(comp), 1.0, atol=1e-5)


def test_weights_sum_to_acc_at_most_one():
    rng = np.random.default_rng(0)
    t_vals = jnp.asarray(np.sort(rng.uniform(0.1, 2.0, size=(4, 16))))
    rgb = jnp.asarray(rng.uniform(size=(4, 16, 3)))
    density = jnp.asarray(rng.uniform(size=(4, 16, 1)))
    dirs = jnp.asarray(rng.normal(size=(4, 3)))
    _, acc, weights, _ = render.volumetric_rendering(
        rgb, density, t_vals, dirs, white_bkgd=False)
    np.testing.assert_allclose(np.asarray(weights.sum(-1)), np.asarray(acc),
                               rtol=1e-5)
    assert np.all(np.asarray(acc) <= 1.0 + 1e-4)


def test_nerfpp_bg_lambda_empty_fg():
    b, s = 3, 8
    t_vals = jnp.broadcast_to(jnp.linspace(0.0, 0.9, s), (b, s))
    rgb = jnp.full((b, s, 3), 0.5)
    density = jnp.zeros((b, s, 1))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (b, 1))
    t_far = jnp.ones((b, 1))
    comp, acc, w, bg_lambda, depth = render.volumetric_rendering_nerfpp(
        rgb, density, t_vals, dirs, False, in_sphere=True, t_far=t_far)
    # nothing absorbed: all transmittance flows to the background
    np.testing.assert_allclose(np.asarray(bg_lambda), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-4)


def test_nerfpp_bg_descending_depths():
    b, s = 2, 8
    # background t_vals descend (inverse depth 1 -> 0)
    t_vals = jnp.broadcast_to(jnp.linspace(1.0, 0.0, s), (b, s))
    rgb = jnp.zeros((b, s, 3)).at[:, 0, :].set(1.0)
    density = jnp.zeros((b, s, 1)).at[:, 0, 0].set(1e6)
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (b, 1))
    comp, acc, w, bg_lambda, _ = render.volumetric_rendering_nerfpp(
        rgb, density, t_vals, dirs, False, in_sphere=False)
    assert bg_lambda is None
    np.testing.assert_allclose(np.asarray(comp[:, 0]), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-4)


def test_mip_alpha_weights_opaque_background():
    b, s = 2, 6
    tdist = jnp.broadcast_to(jnp.linspace(0.1, 1.0, s + 1), (b, s + 1))
    density = jnp.zeros((b, s))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (b, 1))
    weights, alpha, trans = render.compute_alpha_weights(
        density, tdist, dirs, opaque_background=True)
    # zero density but opaque background: the last interval absorbs all
    np.testing.assert_allclose(np.asarray(weights[:, -1]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(weights.sum(-1)), 1.0, atol=1e-5)


def test_render_mip_background_blend():
    b, s = 2, 4
    tdist = jnp.broadcast_to(jnp.linspace(0.1, 1.0, s + 1), (b, s + 1))
    rgbs = jnp.zeros((b, s, 3))
    weights = jnp.zeros((b, s))
    out = render.render_mip(rgbs, weights, tdist, bg_rgbs=1.0,
                            compute_depth=True)
    np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-6)
    assert out["depth"].shape == (b,)
