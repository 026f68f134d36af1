"""Ray sampling: stratified, inverse-CDF (PDF) and NeRF++ fg/bg variants.

Parity notes (all re-derived, TPU-first):
  - stratified sampling over [near, far], optionally in inverse depth
    (reference vanilla_nerf/helper.py:415-442).
  - inverse-CDF resampling with the eps=1e-5 weight padding and the masked
    max/min bin lookup (reference vanilla_nerf/helper.py:567-607). On TPU the
    masked formulation is a dense (bins x samples) elementwise reduce — ideal
    VPU work, no gathers, fully differentiable-free (samples are detached).
  - NeRF++ background sampling in inverted sphere depth s in [0,1] with the
    flipped ordering + a parallel *linear* t in [far, far_uncontracted] used
    only for feature indexing (reference neo360/helper.py:24-75, 218-249).

All functions are shape-static and take explicit PRNG keys.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from neo360_tpu.core.spherical import depth2pts_outside

_FLOAT_MIN_EPS = 2.0 ** -32


def cast_rays(t_vals: jnp.ndarray, origins: jnp.ndarray,
              directions: jnp.ndarray) -> jnp.ndarray:
    """points[..., i, :] = o + t_i * d  (reference vanilla_nerf/helper.py:20)."""
    return origins[..., None, :] + t_vals[..., None] * directions[..., None, :]


def _stratify(t_vals: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Jitter bin edges uniformly within adjacent-midpoint intervals."""
    mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
    upper = jnp.concatenate([mids, t_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([t_vals[..., :1], mids], axis=-1)
    t_rand = jax.random.uniform(key, t_vals.shape, dtype=t_vals.dtype)
    return lower + (upper - lower) * t_rand


def sample_along_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    num_samples: int,
    near,
    far,
    randomized: bool,
    lindisp: bool,
    key: Optional[jax.Array] = None,
):
    """Stratified samples: returns (t_vals (B, N+1), coords (B, N+1, 3)).

    Parity with reference vanilla_nerf/helper.py:415-442.
    """
    bsz = rays_o.shape[0]
    t_vals = jnp.linspace(0.0, 1.0, num_samples + 1, dtype=rays_o.dtype)
    if lindisp:
        t_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        t_vals = near * (1.0 - t_vals) + far * t_vals
    t_vals = jnp.broadcast_to(t_vals, (bsz, num_samples + 1))

    if randomized:
        t_vals = _stratify(t_vals, key)

    return t_vals, cast_rays(t_vals, rays_o, rays_d)


def sorted_piecewise_constant_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    randomized: bool,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Inverse-CDF sampling of a piecewise-constant PDF over sorted bins.

    Dense masked max/min formulation (no searchsorted/gather): for B rays,
    N bins, M samples this is an elementwise (B, N, M) reduce — layout-friendly
    VPU work on TPU. Parity with reference vanilla_nerf/helper.py:567-607.
    """
    eps = 1e-5
    weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
    padding = jnp.maximum(0.0, eps - weight_sum)
    weights = weights + padding / weights.shape[-1]
    weight_sum = weight_sum + padding

    pdf = weights / weight_sum
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf[..., :-1], axis=-1))
    cdf = jnp.concatenate(
        [jnp.zeros_like(cdf[..., :1]), cdf, jnp.ones_like(cdf[..., :1])],
        axis=-1,
    )

    if randomized:
        u = jax.random.uniform(
            key, cdf.shape[:-1] + (num_samples,), dtype=cdf.dtype)
    else:
        u = jnp.linspace(0.0, 1.0 - _FLOAT_MIN_EPS, num_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (num_samples,))

    mask = u[..., None, :] >= cdf[..., :, None]  # (B, N+1, M)

    def masked_max(x):
        return jnp.max(jnp.where(mask, x[..., None], x[..., :1, None]), axis=-2)

    def masked_min(x):
        return jnp.min(jnp.where(mask, x[..., -1:, None], x[..., None]), axis=-2)

    bin0 = masked_max(bins)
    bin1 = masked_min(bins)
    cdf0 = masked_max(cdf)
    cdf1 = masked_min(cdf)

    denom = cdf1 - cdf0
    t = jnp.where(denom > 0, (u - cdf0) / jnp.where(denom == 0, 1.0, denom), 0.0)
    t = jnp.clip(jnp.nan_to_num(t, nan=0.0), 0.0, 1.0)
    return bin0 + t * (bin1 - bin0)


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_vals: jnp.ndarray,
    num_samples: int,
    randomized: bool,
    key: Optional[jax.Array] = None,
):
    """Fine-level resampling: merge PDF samples with coarse t_vals and sort.

    Parity with reference vanilla_nerf/helper.py:610-616. Samples are detached
    (stop_gradient) like the reference's `.detach()`.
    """
    t_samples = sorted_piecewise_constant_pdf(
        bins, weights, num_samples, randomized, key)
    t_samples = jax.lax.stop_gradient(t_samples)
    t_vals = jnp.sort(jnp.concatenate([t_vals, t_samples], axis=-1), axis=-1)
    return t_vals, cast_rays(t_vals, origins, directions)


# ---------------------------------------------------------------------------
# NeRF++ foreground / background sampling (NeO-360)
# ---------------------------------------------------------------------------

def sample_along_rays_nerfpp(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    num_samples: int,
    near,
    far,
    randomized: bool,
    lindisp: bool,
    in_sphere: bool,
    far_uncontracted: float = 4.0,
    key: Optional[jax.Array] = None,
):
    """NeO-360 sampling (reference neo360/helper.py:24-75).

    in_sphere=True: like `sample_along_rays` with per-ray scalar `far`
      (the unit-sphere exit depth); returns (t_vals, coords).
    in_sphere=False: samples s in [0, 1] (inverted sphere depth), flips to
      descending order, lifts to 4D (x', y', z', 1/r) via `depth2pts_outside`,
      and also returns *linear* 3D points at t in [far_uncontracted .. far]
      (flipped) used only for feature indexing; returns
      (t_vals, coords4d, coords_linear).
    """
    bsz = rays_o.shape[0]
    t_vals = jnp.linspace(0.0, 1.0, num_samples + 1, dtype=rays_o.dtype)

    if in_sphere:
        if lindisp:
            t_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
        else:
            t_vals = near * (1.0 - t_vals) + far * t_vals
    t_vals = jnp.broadcast_to(t_vals, (bsz, num_samples + 1))

    if randomized:
        t_vals = _stratify(t_vals, key)

    if in_sphere:
        return t_vals, cast_rays(t_vals, rays_o, rays_d)

    t_vals_linear = far * (1.0 - t_vals) + far_uncontracted * t_vals
    t_vals = jnp.flip(t_vals, axis=-1)              # 1.0 -> 0.0
    t_vals_linear = jnp.flip(t_vals_linear, axis=-1)  # far_uncontracted -> far
    coords_linear = cast_rays(t_vals_linear, rays_o, rays_d)
    coords = depth2pts_outside(rays_o, rays_d, t_vals)
    return t_vals, coords, coords_linear


def sample_pdf_nerfpp(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_vals: jnp.ndarray,
    num_samples: int,
    randomized: bool,
    in_sphere: bool,
    far=None,
    far_uncontracted: float = 3.0,
    key: Optional[jax.Array] = None,
    merge: bool = True,
):
    """Fine-level NeRF++ resampling (reference neo360/helper.py:218-249).

    merge=False skips the union with the coarse edges (MipNeRF-360-style
    proposal resampling: the fine level evaluates ONLY the resampled points;
    used by the `use_proposal` fast path of models/neo360.py). num_samples+1
    points are drawn so the point-at-edges convention (S samples -> S+1
    points) matches the merge=True path."""
    t_samples = sorted_piecewise_constant_pdf(
        bins, weights, num_samples if merge else num_samples + 1,
        randomized, key)
    t_samples = jax.lax.stop_gradient(t_samples)
    if merge:
        t_vals = jnp.sort(jnp.concatenate([t_vals, t_samples], axis=-1),
                          axis=-1)
    else:
        t_vals = jnp.sort(t_samples, axis=-1)

    if in_sphere:
        return t_vals, cast_rays(t_vals, origins, directions)

    t_vals_linear = far * (1.0 - t_vals) + far_uncontracted * t_vals
    t_vals = jnp.flip(t_vals, axis=-1)
    coords = depth2pts_outside(origins, directions, t_vals)
    t_vals_linear = jnp.flip(t_vals_linear, axis=-1)
    coords_linear = cast_rays(t_vals_linear, origins, directions)
    return t_vals, coords, coords_linear
