import jax.numpy as jnp
import numpy as np

from neo360_tpu.train import metrics


def test_psnr_known_value():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(float(metrics.psnr(a, b)), 20.0, rtol=1e-5)


def test_ssim_identity_is_one():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)), jnp.float32)
    assert abs(float(metrics.ssim(img, img)) - 1.0) < 1e-5


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    light = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1).astype(np.float32)
    heavy = np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1).astype(np.float32)
    s_light = float(metrics.ssim(jnp.asarray(img), jnp.asarray(light)))
    s_heavy = float(metrics.ssim(jnp.asarray(img), jnp.asarray(heavy)))
    assert 1.0 > s_light > s_heavy


def test_ssim_constant_shift():
    img = jnp.full((16, 16, 1), 0.5)
    shifted = jnp.full((16, 16, 1), 0.6)
    s = float(metrics.ssim(img, shifted))
    assert 0.0 < s < 1.0
