"""Image quality metrics: PSNR, SSIM (and an LPIPS hook in nn/lpips.py).

PSNR matches the reference's hand-rolled MSE version (interface.py:52-75).
SSIM follows the standard Wang et al. formulation with an 11x11 Gaussian
window (sigma 1.5), k1=0.01, k2=0.03, data range 1 — the same defaults as the
piqa.SSIM metric the reference instantiates per call (interface.py:102-122).
Implemented as depthwise convs so XLA maps it onto the conv units.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """-10 log10(mse). Any matching shapes."""
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-0.5 * (x / sigma) ** 2)
    return (g / g.sum()).astype(np.float32)


def _filter2d_separable(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Depthwise separable valid-conv of (H, W, C) with a 1-D kernel k."""
    c = img.shape[-1]
    x = img[None].transpose(0, 3, 1, 2)  # NCHW
    kh = jnp.asarray(k).reshape(1, 1, -1, 1)
    kw = jnp.asarray(k).reshape(1, 1, 1, -1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    # precision=HIGHEST: on TPU the default conv path multiplies in bf16,
    # which is enough to flip the sign of mu_xx - mu_x^2 variances.
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kh, (c, 1, 1, 1)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kw, (c, 1, 1, 1)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    return x.transpose(0, 2, 3, 1)[0]


def ssim(pred: jnp.ndarray, target: jnp.ndarray,
         max_val: float = 1.0, kernel_size: int = 11,
         sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Mean SSIM between two (H, W, C) images in [0, max_val]."""
    k = _gaussian_kernel(kernel_size, sigma)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    mu_x = _filter2d_separable(pred, k)
    mu_y = _filter2d_separable(target, k)
    mu_xx = _filter2d_separable(pred * pred, k)
    mu_yy = _filter2d_separable(target * target, k)
    mu_xy = _filter2d_separable(pred * target, k)

    var_x = mu_xx - mu_x ** 2
    var_y = mu_yy - mu_y ** 2
    cov = mu_xy - mu_x * mu_y

    num = (2 * mu_x * mu_y + c1) * (2 * cov + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2)
    return jnp.mean(num / den)
