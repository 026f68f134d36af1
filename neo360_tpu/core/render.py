"""Volumetric compositing (vanilla NeRF, NeRF++ fg/bg, MipNeRF-360).

All variants are a cumprod/cumsum + weighted reduction — pure VPU work that XLA
fuses with the upstream MLP epilogue. Shapes are static; no masking tricks are
needed because sample counts are compile-time constants.

Parity:
  - `volumetric_rendering`: reference vanilla_nerf/helper.py:521-559
    (dists padded with 1e10, alpha/exclusive-cumprod weights, depth = sum w*t).
  - `volumetric_rendering_nerfpp`: reference neo360/helper.py:128-171
    (in-sphere uses t_far for the final interval and emits bg_lambda = final
    transmittance; background runs over *descending* inverse depths).
  - `compute_alpha_weights`: reference mipnerf360/helper.py:234-260
    (opaque-background makes the last interval infinitely wide).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

_EPS = 1e-10


def volumetric_rendering(rgb: jnp.ndarray, density: jnp.ndarray,
                         t_vals: jnp.ndarray, dirs: jnp.ndarray,
                         white_bkgd: bool):
    """Standard NeRF compositing.

    Args:
      rgb: (B, S, 3).  density: (B, S, 1).  t_vals: (B, S).  dirs: (B, 3).
    Returns:
      comp_rgb (B, 3), acc (B,), weights (B, S), depth (B,).
    """
    dists = jnp.concatenate(
        [t_vals[..., 1:] - t_vals[..., :-1],
         jnp.full_like(t_vals[..., :1], 1e10)], axis=-1)
    dists = dists * jnp.linalg.norm(dirs[..., None, :], axis=-1)
    alpha = 1.0 - jnp.exp(-density[..., 0] * dists)
    accum_prod = jnp.concatenate(
        [jnp.ones_like(alpha[..., :1]),
         jnp.cumprod(1.0 - alpha[..., :-1] + _EPS, axis=-1)], axis=-1)
    weights = alpha * accum_prod

    comp_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth = jnp.sum(weights * t_vals, axis=-1)
    acc = jnp.sum(weights, axis=-1)

    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc[..., None])
    return comp_rgb, acc, weights, depth


def volumetric_rendering_nerfpp(
    rgb: jnp.ndarray,
    density: jnp.ndarray,
    t_vals: jnp.ndarray,
    dirs: jnp.ndarray,
    white_bkgd: bool,
    in_sphere: bool,
    t_far: Optional[jnp.ndarray] = None,
):
    """NeRF++ fg/bg compositing with leftover-transmittance bg_lambda.

    Foreground (in_sphere=True): final interval is [t_last, t_far] where t_far
    is the per-ray sphere exit depth; bg_lambda = transmittance past the last
    sample, used by the caller as `comp = fg + bg_lambda * bg`.
    Background (in_sphere=False): t_vals descend (inverse depth 1 -> 0), so
    dists = t[i] - t[i+1]; last interval is infinite; bg_lambda is None.

    Returns comp_rgb (B,3), acc (B,), weights (B,S), bg_lambda (B,1)|None,
    depth (B,).
    """
    if in_sphere:
        dists = t_vals[..., 1:] - t_vals[..., :-1]
        dists = jnp.concatenate([dists, t_far - t_vals[..., -1:]], axis=-1)
        dists = dists * jnp.linalg.norm(dirs[..., None, :], axis=-1)
    else:
        dists = t_vals[..., :-1] - t_vals[..., 1:]
        dists = jnp.concatenate(
            [dists, jnp.full_like(t_vals[..., :1], 1e10)], axis=-1)

    alpha = 1.0 - jnp.exp(-density[..., 0] * dists)
    trans = jnp.cumprod(1.0 - alpha + _EPS, axis=-1)
    bg_lambda = trans[..., -1:] if in_sphere else None
    accum_prod = jnp.concatenate(
        [jnp.ones_like(trans[..., -1:]), trans[..., :-1]], axis=-1)
    weights = alpha * accum_prod

    acc = jnp.sum(weights, axis=-1)
    comp_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)
    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc[..., None])
    depth = jnp.sum(weights * t_vals, axis=-1)
    return comp_rgb, acc, weights, bg_lambda, depth


def volume_rendering_volsdf(rgb: jnp.ndarray, density: jnp.ndarray,
                            t_vals: jnp.ndarray, dirs: jnp.ndarray,
                            white_bkgd: bool):
    """VolSDF-style compositing in log space (reference
    vanilla_nerf/helper.py:488-518): free energy = density * dists,
    transmittance = exp(-cumsum), final interval width 1 (not 1e10).

    rgb (B,S,3), density (B,S) or (B,S,1), t_vals (B,S), dirs (B,3).
    """
    density = density[..., 0] if density.ndim == rgb.ndim else density
    dists = jnp.concatenate(
        [t_vals[..., 1:] - t_vals[..., :-1],
         jnp.ones_like(t_vals[..., :1])], axis=-1)
    dists = dists * jnp.linalg.norm(dirs[..., None, :], axis=-1)
    free_energy = dists * density
    shifted = jnp.concatenate(
        [jnp.zeros_like(free_energy[..., :1]), free_energy[..., :-1]],
        axis=-1)
    alpha = 1.0 - jnp.exp(-free_energy)
    trans = jnp.exp(-jnp.cumsum(shifted, axis=-1))
    weights = alpha * trans

    comp_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth = jnp.sum(weights * t_vals, axis=-1)
    acc = jnp.sum(weights, axis=-1)
    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc[..., None])
    return comp_rgb, acc, weights, depth


def compute_alpha_weights(density: jnp.ndarray, tdist: jnp.ndarray,
                          dirs: jnp.ndarray, opaque_background: bool = False):
    """MipNeRF-360 weights from per-interval densities.

    density: (B, S) for S = len(tdist) - 1. Returns (weights, alpha, trans).
    """
    t_delta = tdist[..., 1:] - tdist[..., :-1]
    delta = t_delta * jnp.linalg.norm(dirs[..., None, :], axis=-1)
    density_delta = density * delta

    if opaque_background:
        density_delta = jnp.concatenate(
            [density_delta[..., :-1],
             jnp.full_like(density_delta[..., -1:], jnp.inf)], axis=-1)

    alpha = 1.0 - jnp.exp(-density_delta)
    trans = jnp.exp(-jnp.concatenate(
        [jnp.zeros_like(density_delta[..., :1]),
         jnp.cumsum(density_delta[..., :-1], axis=-1)], axis=-1))
    weights = alpha * trans
    return weights, alpha, trans


def render_mip(rgbs: jnp.ndarray, weights: jnp.ndarray, tdist: jnp.ndarray,
               bg_rgbs, compute_depth: bool = False):
    """MipNeRF-360 final compositing (reference mipnerf360/helper.py:264-274),
    extended with optional expected-depth output over interval midpoints."""
    acc = jnp.sum(weights, axis=-1)
    bg_w = jnp.maximum(0.0, 1.0 - acc[..., None])
    rgb = jnp.sum(weights[..., None] * rgbs, axis=-2) + bg_w * bg_rgbs
    out = {"rgb": rgb, "acc": acc}
    if compute_depth:
        t_mids = 0.5 * (tdist[..., 1:] + tdist[..., :-1])
        out["depth"] = jnp.sum(weights * t_mids, axis=-1)
    return out
