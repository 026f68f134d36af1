import jax.numpy as jnp
import numpy as np

from neo360_tpu.ops import losses


def _hist(b=4, s=16, seed=0):
    rng = np.random.default_rng(seed)
    t = jnp.asarray(np.sort(rng.uniform(0.0, 1.0, size=(b, s + 1)), axis=-1))
    w = jnp.asarray(rng.uniform(0.0, 0.2, size=(b, s)))
    return t, w


def test_distortion_linear_matches_quadratic_oracle():
    t, w = _hist()
    quad = losses.lossfun_distortion(t, w)
    lin = losses.distortion_loss(t, w)
    np.testing.assert_allclose(np.asarray(lin), np.asarray(quad), rtol=1e-5)


def test_eff_distloss_matches_oracle():
    t, w = _hist(seed=1)
    m = 0.5 * (t[..., 1:] + t[..., :-1])
    interval = t[..., 1:] - t[..., :-1]
    eff = losses.eff_distloss(w, m, interval)
    oracle = jnp.mean(losses.lossfun_distortion(t, w))
    np.testing.assert_allclose(np.asarray(eff), np.asarray(oracle), rtol=1e-5)


def test_distortion_zero_for_delta():
    # all mass in a single infinitesimal interval -> loss ~ w^2 * dt / 3 only
    t = jnp.asarray([[0.0, 0.5, 0.5 + 1e-6, 1.0]])
    w = jnp.asarray([[0.0, 1.0, 0.0]])
    val = float(losses.lossfun_distortion(t, w)[0])
    assert val < 1e-5


def test_lossfun_outer_zero_when_env_covers():
    # identical histograms: outer measure >= w everywhere -> loss 0
    t, w = _hist(seed=2)
    out = losses.lossfun_outer(t, w, t, w)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_lossfun_outer_positive_when_env_misses():
    t = jnp.asarray([[0.0, 0.25, 0.5, 0.75, 1.0]])
    w = jnp.asarray([[0.0, 0.9, 0.1, 0.0]])
    w_env = jnp.asarray([[0.9, 0.0, 0.0, 0.1]])  # mass elsewhere
    out = losses.lossfun_outer(t, w, t, w_env)
    assert float(jnp.sum(out)) > 0.1


def test_charbonnier_close_to_abs_for_large_errors():
    x = jnp.asarray([10.0])
    y = jnp.asarray([0.0])
    np.testing.assert_allclose(
        float(losses.charbonnier_loss(x, y, eps=1e-3)), 10.0, rtol=1e-4)


def test_psnr_mse_roundtrip():
    mse = jnp.asarray(0.01)
    np.testing.assert_allclose(float(losses.mse2psnr(mse)), 20.0, rtol=1e-5)
