"""Loss primitives: MSE/PSNR, Charbonnier, MipNeRF-360 interlevel and
distortion losses.

The distortion loss ships in two forms:
  - `lossfun_distortion`: the O(S^2) reference formula
    (neo360/helper.py:111-118, mipnerf360/helper.py:141-148) — kept as the
    correctness oracle.
  - `eff_distloss`: an O(S) prefix-sum reformulation replacing the reference's
    third-party CUDA kernel (`torch_efficient_distloss.eff_distloss`,
    neo360/model.py:34,1258-1259). For sorted midpoints m and weights w:
        sum_ij w_i w_j |m_i - m_j| = 2 * sum_i w_i (m_i * cumW_i - cumWM_i)
    where cum* are exclusive prefix sums — two cumsums + elementwise math,
    which XLA fuses into a handful of VPU ops (no Pallas needed; the op is
    bandwidth-trivial at NeRF sample counts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1.1920929e-07


def img2mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def charbonnier_loss(x: jnp.ndarray, y: jnp.ndarray,
                     eps: float = 1e-3) -> jnp.ndarray:
    """sqrt((x-y)^2 + eps^2), mean-reduced (MipNeRF-360 data loss)."""
    return jnp.mean(jnp.sqrt((x - y) ** 2 + eps ** 2))


# ---------------------------------------------------------------------------
# Interlevel (proposal) loss
# ---------------------------------------------------------------------------

def _searchsorted(a: jnp.ndarray, v: jnp.ndarray):
    """Indices of the last a <= v and first a > v, per the reference's dense
    formulation (mipnerf360/helper.py:108-113)."""
    i = jnp.arange(a.shape[-1])
    v_ge_a = v[..., None, :] >= a[..., :, None]
    idx_lo = jnp.max(
        jnp.where(v_ge_a, i[:, None], i[:1, None]), axis=-2)
    idx_hi = jnp.min(
        jnp.where(~v_ge_a, i[:, None], i[-1:, None]), axis=-2)
    return idx_lo, idx_hi


def inner_outer(t0: jnp.ndarray, t1: jnp.ndarray, y1: jnp.ndarray):
    """Construct inner/outer measures on (t1, y1) of t0 intervals."""
    cy1 = jnp.concatenate(
        [jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1)
    idx_lo, idx_hi = _searchsorted(t1, t0)

    cy1_lo = jnp.take_along_axis(cy1, idx_lo, axis=-1)
    cy1_hi = jnp.take_along_axis(cy1, idx_hi, axis=-1)

    y0_outer = cy1_hi[..., 1:] - cy1_lo[..., :-1]
    y0_inner = jnp.where(
        idx_hi[..., :-1] <= idx_lo[..., 1:],
        cy1_lo[..., 1:] - cy1_hi[..., :-1], 0.0)
    return y0_inner, y0_outer


def lossfun_outer(t: jnp.ndarray, w: jnp.ndarray,
                  t_env: jnp.ndarray, w_env: jnp.ndarray) -> jnp.ndarray:
    """Proposal histogram must upper-bound the NeRF histogram
    (reference mipnerf360/helper.py:135-137)."""
    _, w_outer = inner_outer(t, t_env, w_env)
    return jnp.maximum(0.0, w - w_outer) ** 2 / (w + EPS)


# ---------------------------------------------------------------------------
# Distortion loss
# ---------------------------------------------------------------------------

def lossfun_distortion(t: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """O(S^2) reference formula; per-ray loss (B,)."""
    ut = 0.5 * (t[..., 1:] + t[..., :-1])
    dut = jnp.abs(ut[..., :, None] - ut[..., None, :])
    loss_inter = jnp.sum(w * jnp.sum(w[..., None, :] * dut, axis=-1), axis=-1)
    loss_intra = jnp.sum(w ** 2 * (t[..., 1:] - t[..., :-1]), axis=-1) / 3
    return loss_inter + loss_intra


def eff_distloss(w: jnp.ndarray, m: jnp.ndarray,
                 interval) -> jnp.ndarray:
    """O(S) distortion loss, mean over rays (drop-in for the reference's CUDA
    `eff_distloss(w, m, interval)`; w (B,S) weights, m (B,S) sorted midpoints,
    interval scalar or (B,S) lengths)."""
    cum_w = jnp.cumsum(w, axis=-1) - w          # exclusive prefix of w
    cum_wm = jnp.cumsum(w * m, axis=-1) - w * m  # exclusive prefix of w*m
    loss_inter = 2.0 * jnp.sum(w * (m * cum_w - cum_wm), axis=-1)
    loss_intra = jnp.sum(w ** 2 * interval, axis=-1) / 3.0
    return jnp.mean(loss_inter + loss_intra)


def distortion_loss(t: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """O(S) per-ray distortion equal to `lossfun_distortion` (same t/w
    convention: t (B,S+1) sorted edges, w (B,S))."""
    ut = 0.5 * (t[..., 1:] + t[..., :-1])
    cum_w = jnp.cumsum(w, axis=-1) - w
    cum_wm = jnp.cumsum(w * ut, axis=-1) - w * ut
    loss_inter = 2.0 * jnp.sum(w * (ut * cum_w - cum_wm), axis=-1)
    loss_intra = jnp.sum(w ** 2 * (t[..., 1:] - t[..., :-1]), axis=-1) / 3
    return loss_inter + loss_intra
