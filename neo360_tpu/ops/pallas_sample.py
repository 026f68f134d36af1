"""Pallas TPU kernel: bilinear row-gather (the grid_sample hot path).

Why: XLA lowers the 4-corner gathers of `ops/interpolate.grid_sample_2d` to
generic gathers running at ~60 GB/s on v5e (~7% of HBM bandwidth); profiling
showed the tri-plane + pixel-latent indexing is ~87% of a NeO-360 train step.
This kernel keeps the feature map (block) resident in VMEM and streams point
tiles through it, so the 4 corner reads are VMEM loads instead of HBM
gathers.

Semantics: identical to grid_sample_2d(..., padding_mode="zeros"|"border"),
i.e. torch F.grid_sample bilinear align_corners=True. Forward + custom VJP
(gradient w.r.t. the feature maps; uv receives zero gradient — in all call
sites uv derives from camera poses and stop-gradient'd sample positions).

Layout: grid = (B, channel_blocks, point_tiles); the feature-map block
(H, W, CB) maps to VMEM once per (image, channel-block) and is reused across
all point tiles (Pallas keeps a block resident while its index is unchanged).
The backward kernel accumulates plane gradients in the output block across
sequential point-tile steps (TPU grid steps execute sequentially per core).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 1024
MAX_VMEM_BLOCK_BYTES = 8 * 1024 * 1024  # feature-map block budget


def _choose_channel_block(h: int, w: int, c: int, dtype) -> int:
    """Largest channel block (multiple of 128, or c) fitting the budget."""
    bytes_per = jnp.dtype(dtype).itemsize
    cb = c
    while cb > 128 and h * w * cb * bytes_per > MAX_VMEM_BLOCK_BYTES:
        cb //= 2
    return cb


def _fwd_kernel(uv_ref, img_ref, out_ref, *, h, w, tile, border):
    def body(i, _):
        u = uv_ref[i, 0]
        v = uv_ref[i, 1]
        ix = (u + 1.0) * 0.5 * (w - 1)
        iy = (v + 1.0) * 0.5 * (h - 1)
        if border:
            ix = jnp.clip(ix, 0.0, w - 1.0)
            iy = jnp.clip(iy, 0.0, h - 1.0)
        x0f = jnp.floor(ix)
        y0f = jnp.floor(iy)
        fx = ix - x0f
        fy = iy - y0f
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        x1 = x0 + 1
        y1 = y0 + 1

        w00 = (1.0 - fx) * (1.0 - fy)
        w01 = fx * (1.0 - fy)
        w10 = (1.0 - fx) * fy
        w11 = fx * fy
        if not border:
            # zeros padding: out-of-range corners contribute nothing
            w00 = jnp.where((x0 >= 0) & (x0 < w) & (y0 >= 0) & (y0 < h),
                            w00, 0.0)
            w01 = jnp.where((x1 >= 0) & (x1 < w) & (y0 >= 0) & (y0 < h),
                            w01, 0.0)
            w10 = jnp.where((x0 >= 0) & (x0 < w) & (y1 >= 0) & (y1 < h),
                            w10, 0.0)
            w11 = jnp.where((x1 >= 0) & (x1 < w) & (y1 >= 0) & (y1 < h),
                            w11, 0.0)
        x0c = jnp.clip(x0, 0, w - 1)
        x1c = jnp.clip(x1, 0, w - 1)
        y0c = jnp.clip(y0, 0, h - 1)
        y1c = jnp.clip(y1, 0, h - 1)

        out_ref[i, :] = (img_ref[y0c, x0c, :] * w00
                         + img_ref[y0c, x1c, :] * w01
                         + img_ref[y1c, x0c, :] * w10
                         + img_ref[y1c, x1c, :] * w11)
        return 0

    jax.lax.fori_loop(0, tile, body, 0)


def _bwd_kernel(uv_ref, g_ref, dimg_ref, *, h, w, tile, border):
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        dimg_ref[...] = jnp.zeros_like(dimg_ref)

    def body(i, _):
        u = uv_ref[i, 0]
        v = uv_ref[i, 1]
        ix = (u + 1.0) * 0.5 * (w - 1)
        iy = (v + 1.0) * 0.5 * (h - 1)
        if border:
            ix = jnp.clip(ix, 0.0, w - 1.0)
            iy = jnp.clip(iy, 0.0, h - 1.0)
        x0f = jnp.floor(ix)
        y0f = jnp.floor(iy)
        fx = ix - x0f
        fy = iy - y0f
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        x1 = x0 + 1
        y1 = y0 + 1

        w00 = (1.0 - fx) * (1.0 - fy)
        w01 = fx * (1.0 - fy)
        w10 = (1.0 - fx) * fy
        w11 = fx * fy
        if not border:
            w00 = jnp.where((x0 >= 0) & (x0 < w) & (y0 >= 0) & (y0 < h),
                            w00, 0.0)
            w01 = jnp.where((x1 >= 0) & (x1 < w) & (y0 >= 0) & (y0 < h),
                            w01, 0.0)
            w10 = jnp.where((x0 >= 0) & (x0 < w) & (y1 >= 0) & (y1 < h),
                            w10, 0.0)
            w11 = jnp.where((x1 >= 0) & (x1 < w) & (y1 >= 0) & (y1 < h),
                            w11, 0.0)
        x0c = jnp.clip(x0, 0, w - 1)
        x1c = jnp.clip(x1, 0, w - 1)
        y0c = jnp.clip(y0, 0, h - 1)
        y1c = jnp.clip(y1, 0, h - 1)

        g = g_ref[i, :]
        dimg_ref[y0c, x0c, :] += g * w00
        dimg_ref[y0c, x1c, :] += g * w01
        dimg_ref[y1c, x0c, :] += g * w10
        dimg_ref[y1c, x1c, :] += g * w11
        return 0

    jax.lax.fori_loop(0, tile, body, 0)


def _pad_points(uv, tile):
    n = uv.shape[1]
    n_pad = ((n + tile - 1) // tile) * tile
    if n_pad != n:
        # pad far outside: zeros-mode weights vanish; border-mode reads are
        # clamped but the rows are dropped after the call
        pad = jnp.full((uv.shape[0], n_pad - n, 2), -10.0, uv.dtype)
        uv = jnp.concatenate([uv, pad], axis=1)
    return uv, n, n_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def bilinear_gather(images: jnp.ndarray, uv: jnp.ndarray,
                    padding_mode: str = "zeros",
                    tile: int = DEFAULT_TILE) -> jnp.ndarray:
    """images (B, H, W, C); uv (B, N, 2) in [-1, 1] -> (B, N, C)."""
    return _forward(images, uv, padding_mode, tile)


def _forward(images, uv, padding_mode, tile):
    b, h, w, c = images.shape
    border = padding_mode == "border"
    uv_p, n, n_pad = _pad_points(uv, tile)
    cb = _choose_channel_block(h, w, c, images.dtype)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, w=w, tile=tile, border=border),
        grid=(b, c // cb, n_pad // tile),
        in_specs=[
            pl.BlockSpec((None, tile, 2), lambda bi, ci, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, h, w, cb), lambda bi, ci, ti: (bi, 0, 0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, tile, cb),
                               lambda bi, ci, ti: (bi, ti, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), images.dtype),
    )(uv_p, images)
    return out[:, :n]


def _forward_fwd(images, uv, padding_mode, tile):
    return _forward(images, uv, padding_mode, tile), (images, uv)


def _forward_bwd(padding_mode, tile, residuals, g):
    images, uv = residuals
    b, h, w, c = images.shape
    border = padding_mode == "border"
    uv_p, n, n_pad = _pad_points(uv, tile)
    g_p = jnp.zeros((b, n_pad, c), g.dtype).at[:, :n].set(g)
    cb = _choose_channel_block(h, w, c, images.dtype)

    dimg = pl.pallas_call(
        functools.partial(_bwd_kernel, h=h, w=w, tile=tile, border=border),
        grid=(b, c // cb, n_pad // tile),
        in_specs=[
            pl.BlockSpec((None, tile, 2), lambda bi, ci, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile, cb), lambda bi, ci, ti: (bi, ti, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, h, w, cb),
                               lambda bi, ci, ti: (bi, 0, 0, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), images.dtype),
    )(uv_p, g_p)
    return dimg, jnp.zeros_like(uv)


bilinear_gather.defvjp(_forward_fwd, _forward_bwd)
