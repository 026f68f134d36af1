"""MipNeRF-360 sampling machinery: s-space warps, weight dilation,
histogram resampling, and conical-frustum Gaussians.

Parity with reference models/mipnerf360/helper.py (re-implemented in jnp):
  - construct_ray_warps (1/t lerp)             helper.py:168-172
  - weight<->pdf, max_dilate(_weights)         helper.py:152-192
  - integrate_weights / sorted_interp /
    invert_cdf / sample / sample_intervals     helper.py:196-396
  - cast_rays_gaussian / conical_frustum /
    cylinder / lift_gaussian                   helper.py:278-339

The masked max/min interp keeps everything dense (no gathers): for N bins and
M samples it is a (B, N, M) elementwise reduce on the VPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

EPS = 1.1920929e-07  # float32 machine epsilon, as in the reference


def construct_ray_warps(t_near, t_far):
    """Returns (t_to_s, s_to_t) for the 1/t warp normalized to [0, 1]."""
    s_near, s_far = 1.0 / t_near, 1.0 / t_far

    def t_to_s(t):
        return (1.0 / t - s_near) / (s_far - s_near)

    def s_to_t(s):
        return 1.0 / (s * s_far + (1.0 - s) * s_near)

    return t_to_s, s_to_t


def weight_to_pdf(t: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return w / jnp.maximum(t[..., 1:] - t[..., :-1], EPS)


def pdf_to_weight(t: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    return p * (t[..., 1:] - t[..., :-1])


def max_dilate(t: jnp.ndarray, w: jnp.ndarray, dilation,
               domain: Tuple[float, float]):
    """Dilate a step function by a radius, taking the max over covering
    intervals (reference helper.py:152-165)."""
    t0 = t[..., :-1] - dilation
    t1 = t[..., 1:] + dilation
    t_dilate = jnp.sort(jnp.concatenate([t, t0, t1], axis=-1), axis=-1)
    t_dilate = jnp.clip(t_dilate, domain[0], domain[1])
    mask = ((t0[..., None, :] <= t_dilate[..., None])
            & (t1[..., None, :] > t_dilate[..., None]))
    w_dilate = jnp.max(
        jnp.where(mask, w[..., None, :], 0.0), axis=-1)[..., :-1]
    return t_dilate, w_dilate


def max_dilate_weights(t, w, dilation, domain, renormalize: bool):
    p = weight_to_pdf(t, w)
    t_dilate, p_dilate = max_dilate(t, p, dilation, domain)
    w_dilate = pdf_to_weight(t_dilate, p_dilate)
    if renormalize:
        w_dilate = w_dilate / jnp.maximum(
            jnp.sum(w_dilate, axis=-1, keepdims=True), EPS)
    return t_dilate, w_dilate


def integrate_weights(w: jnp.ndarray) -> jnp.ndarray:
    """CDF over bin edges, pinned to [0, 1] at the ends."""
    cw = jnp.minimum(1.0, jnp.cumsum(w[..., :-1], axis=-1))
    shape = cw.shape[:-1] + (1,)
    return jnp.concatenate(
        [jnp.zeros(shape, cw.dtype), cw, jnp.ones(shape, cw.dtype)], axis=-1)


def sorted_interp(x: jnp.ndarray, xp: jnp.ndarray,
                  fp: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-linear interp of sorted (xp, fp) at sorted x, dense masked
    max/min formulation (no gathers)."""
    mask = x[..., None, :] >= xp[..., :, None]

    fp0 = jnp.max(jnp.where(mask, fp[..., None], fp[..., :1, None]), axis=-2)
    fp1 = jnp.min(jnp.where(mask, fp[..., -1:, None], fp[..., None]), axis=-2)
    xp0 = jnp.max(jnp.where(mask, xp[..., None], xp[..., :1, None]), axis=-2)
    xp1 = jnp.min(jnp.where(mask, xp[..., -1:, None], xp[..., None]), axis=-2)

    denom = xp1 - xp0
    offset = jnp.where(denom != 0.0, (x - xp0) / jnp.where(denom == 0, 1, denom), 0.0)
    offset = jnp.clip(jnp.nan_to_num(offset, nan=0.0), 0.0, 1.0)
    return fp0 + offset * (fp1 - fp0)


def invert_cdf(u: jnp.ndarray, t: jnp.ndarray,
               w_logits: jnp.ndarray) -> jnp.ndarray:
    w = jax.nn.softmax(w_logits, axis=-1)
    cw = integrate_weights(w)
    return sorted_interp(u, cw, t)


def sample(
    t: jnp.ndarray,
    w_logits: jnp.ndarray,
    num_samples: int,
    randomized: bool,
    key: Optional[jax.Array] = None,
    single_jitter: bool = False,
    deterministic_center: bool = False,
) -> jnp.ndarray:
    """Draw samples from a histogram via stratified CDF inversion
    (reference helper.py:343-369)."""
    if not randomized:
        if deterministic_center:
            pad = 1.0 / (2 * num_samples)
            u = jnp.linspace(pad, 1.0 - pad - EPS, num_samples)
        else:
            u = jnp.linspace(0.0, 1.0 - EPS, num_samples)
        u = jnp.broadcast_to(u, t.shape[:-1] + (num_samples,))
    else:
        u_max = EPS + (1.0 - EPS) / num_samples
        max_jitter = (1.0 - u_max) / (num_samples - 1) - EPS
        d = 1 if single_jitter else num_samples
        u = (jnp.linspace(0.0, 1.0 - u_max, num_samples)
             + jax.random.uniform(key, t.shape[:-1] + (d,)) * max_jitter)
    return invert_cdf(u.astype(t.dtype), t, w_logits)


def sample_intervals(
    t: jnp.ndarray,
    w_logits: jnp.ndarray,
    num_samples: int,
    randomized: bool,
    key: Optional[jax.Array] = None,
    single_jitter: bool = False,
    domain: Tuple[float, float] = (-jnp.inf, jnp.inf),
) -> jnp.ndarray:
    """Sample interval edges centered on histogram samples
    (reference helper.py:373-396)."""
    centers = sample(t, w_logits, num_samples, randomized, key,
                     single_jitter, deterministic_center=True)
    mid = 0.5 * (centers[..., 1:] + centers[..., :-1])
    min_val, max_val = domain
    first = jnp.maximum(2 * centers[..., :1] - mid[..., :1], min_val)
    last = jnp.minimum(2 * centers[..., -1:] - mid[..., -1:], max_val)
    return jnp.concatenate([first, mid, last], axis=-1)


# ---------------------------------------------------------------------------
# Conical-frustum Gaussians
# ---------------------------------------------------------------------------

def lift_gaussian(d: jnp.ndarray, t_mean: jnp.ndarray, t_var: jnp.ndarray,
                  r_var: jnp.ndarray, diag: bool):
    """Lift per-interval (t_mean, t_var, r_var) onto ray direction d."""
    mean = d[..., None, :] * t_mean[..., None]
    d_mag_sq = jnp.maximum(1e-10, jnp.sum(d ** 2, axis=-1, keepdims=True))

    if diag:
        d_outer_diag = d ** 2
        null_outer_diag = 1.0 - d_outer_diag / d_mag_sq
        t_cov_diag = t_var[..., None] * d_outer_diag[..., None, :]
        xy_cov_diag = r_var[..., None] * null_outer_diag[..., None, :]
        return mean, t_cov_diag + xy_cov_diag

    d_outer = d[..., :, None] * d[..., None, :]
    eye = jnp.eye(d.shape[-1], dtype=d.dtype)
    null_outer = eye - d[..., :, None] * (d / d_mag_sq)[..., None, :]
    t_cov = t_var[..., None, None] * d_outer[..., None, :, :]
    xy_cov = r_var[..., None, None] * null_outer[..., None, :, :]
    return mean, t_cov + xy_cov


def conical_frustum_to_gaussian(d, t0, t1, radius, diag: bool):
    """Stable mean/var of a conical frustum (reference helper.py:293-304)."""
    mu = (t0 + t1) / 2
    hw = (t1 - t0) / 2
    denom = jnp.maximum(EPS, 3 * mu ** 2 + hw ** 2)
    t_mean = mu + (2 * mu * hw ** 2) / denom
    t_var = (hw ** 2) / 3 - (4 / 15) * hw ** 4 * (12 * mu ** 2 - hw ** 2) / denom ** 2
    r_var = (mu ** 2) / 4 + (5 / 12) * hw ** 2 - (4 / 15) * (hw ** 4) / denom
    r_var = r_var * radius ** 2
    return lift_gaussian(d, t_mean, t_var, r_var, diag)


def cylinder_to_gaussian(d, t0, t1, radius, diag: bool):
    t_mean = (t0 + t1) / 2
    r_var = radius ** 2 / 4
    t_var = (t1 - t0) ** 2 / 12
    return lift_gaussian(d, t_mean, t_var, r_var, diag)


def cast_rays_gaussian(t_vals, origins, directions, radii,
                       ray_shape: str = "cone", diag: bool = True):
    """Per-interval Gaussians along each ray (reference helper.py:278-289)."""
    t0, t1 = t_vals[..., :-1], t_vals[..., 1:]
    if ray_shape == "cone":
        fn = conical_frustum_to_gaussian
    elif ray_shape == "cylinder":
        fn = cylinder_to_gaussian
    else:
        raise ValueError(f"ray_shape {ray_shape!r} not supported")
    means, covs = fn(directions, t0, t1, radii, diag)
    return means + origins[..., None, :], covs
