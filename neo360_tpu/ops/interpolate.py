"""Bilinear sampling and resizing (the reference's `F.grid_sample` /
`F.interpolate` surface, re-built for TPU).

`grid_sample_2d` matches torch.nn.functional.grid_sample(mode="bilinear",
align_corners=True) for padding_mode in {"zeros", "border"} — the exact
semantics used at the reference's three call sites (encoder_pn.py:144-150,
encoder_tp_fusion_conv.py:180-202, vanilla_nerf/encoder.py:123-130).
Golden-tested against torch-CPU in tests/test_interpolate.py.

TPU design notes:
  - images are NHWC; the four corner fetches are one take_along_axis gather
    each over a (B, H*W, C) view. XLA lowers these to dynamic-gathers; the
    arithmetic (lerp weights, masks) fuses around them.
  - `resize_bilinear_align_corners` deliberately does NOT gather: bilinear
    resize is separable, so it is two dense matmuls with interpolation
    matrices — MXU work instead of scatter/gather, which is the fast path for
    the encoder pyramid upsample (reference encoder_pn.py:196-202) and the
    floorplan Upsample (encoder_tp_fusion_conv.py:375-453).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_rows_sorted_bwd(flat: jnp.ndarray, idx: jnp.ndarray,
                            n_rows: int) -> jnp.ndarray:
    """Row gather whose BACKWARD is sort + sorted segment_sum instead of
    XLA's scatter-add (round-4 scatter-floor attack, BASELINE.md: the
    fine-level table scatter-adds are ~28% of the adopted train step and
    run at XLA scatter's ~45-51 GB/s ceiling). Sorting the cotangent rows
    by destination first makes the accumulation a segment reduction over
    contiguous runs, which can lower without the scatter's read-modify-write
    ordering. Forward is identical to `flat.at[idx].get()`; enable via
    NEO360_SORTED_SCATTER=1 (measured on TPU by scripts/bench_scatter.py
    before any adoption)."""
    return flat.at[idx].get(mode="promise_in_bounds")


def _gather_sorted_fwd(flat, idx, n_rows):
    return flat.at[idx].get(mode="promise_in_bounds"), idx


def _gather_sorted_bwd(n_rows, idx, g):
    order = jnp.argsort(idx)
    g_sorted = g.at[order].get(mode="promise_in_bounds")
    grad_flat = jax.ops.segment_sum(
        g_sorted, idx.at[order].get(mode="promise_in_bounds"),
        num_segments=n_rows, indices_are_sorted=True)
    return grad_flat.astype(g.dtype), None


_gather_rows_sorted_bwd.defvjp(_gather_sorted_fwd, _gather_sorted_bwd)


def grid_sample_2d(image: jnp.ndarray, uv: jnp.ndarray,
                   padding_mode: str = "zeros") -> jnp.ndarray:
    """Bilinear sample NHWC images at normalized coords (align_corners=True).

    Args:
      image: (B, H, W, C).
      uv: (B, N, 2) with x=u, y=v in [-1, 1]; (-1,-1) is pixel (0,0)'s center.
      padding_mode: "zeros" | "border".

    Returns:
      (B, N, C) samples.
    """
    b, h, w, c = image.shape
    ix = (uv[..., 0] + 1.0) * 0.5 * (w - 1)
    iy = (uv[..., 1] + 1.0) * 0.5 * (h - 1)

    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, w - 1)
        iy = jnp.clip(iy, 0.0, h - 1)
    elif padding_mode != "zeros":
        raise ValueError(f"padding_mode {padding_mode!r} not supported")

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    w00 = (x1 - ix) * (y1 - iy)   # top-left  (x0, y0)
    w01 = (ix - x0) * (y1 - iy)   # top-right (x1, y0)
    w10 = (x1 - ix) * (iy - y0)   # bottom-left
    w11 = (ix - x0) * (iy - y0)   # bottom-right

    # single flattened axis-0 row gather: one global index per (image, point,
    # corner); measurably faster on TPU than take_along_axis, whose index
    # broadcast to (B, N, C) costs as much traffic as the payload.
    flat = image.reshape(b * h * w, c)
    base = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None]
    n = uv.shape[1]

    def fetch(xi, yi, wgt):
        if padding_mode == "zeros":
            valid = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
            wgt = jnp.where(valid, wgt, 0.0)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = base + yc * w + xc                             # (B, N)
        vals = flat.at[idx.reshape(-1)].get(
            mode="promise_in_bounds").reshape(b, n, c)
        return vals * wgt[..., None]

    out = (fetch(x0, y0, w00) + fetch(x1, y0, w01)
           + fetch(x0, y1, w10) + fetch(x1, y1, w11))
    return out


def build_corner_table(image: jnp.ndarray, padding_mode: str = "zeros",
                       dtype=None) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H+1,W+1,4C) table of 2x2 corner neighborhoods.

    T[b, y0+1, x0+1] = concat(P[y0,x0], P[y0,x1], P[y1,x0], P[y1,x1]) over a
    one-pixel pad (zeros or edge per `padding_mode`), so `table_sample` needs
    ONE row-gather per point instead of grid_sample_2d's four. Profiled on
    v5e (scripts/bench_gather.py): exact vs grid_sample_2d; fwd+bwd 41->22 ms
    at the NeO-360 fine-level shape (the backward scatter-add issues 4x fewer
    descriptors and the corner fold is dense). Build cost is 4 dense shifted
    copies — amortized per encode, negligible per step.
    """
    b, h, w, c = image.shape
    if padding_mode == "zeros":
        pad = jnp.pad(image, ((0, 0), (1, 1), (1, 1), (0, 0)))
    elif padding_mode == "border":
        pad = jnp.pad(image, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    else:
        raise ValueError(f"padding_mode {padding_mode!r} not supported")
    table = jnp.concatenate([
        pad[:, 0:h + 1, 0:w + 1],      # corner (y0, x0)
        pad[:, 0:h + 1, 1:w + 2],      # corner (y0, x1)
        pad[:, 1:h + 2, 0:w + 1],      # corner (y1, x0)
        pad[:, 1:h + 2, 1:w + 2],      # corner (y1, x1)
    ], axis=-1)
    if dtype is not None:
        table = table.astype(dtype)
    return table


def table_sample(table: jnp.ndarray, uv: jnp.ndarray, hw: tuple,
                 padding_mode: str = "zeros",
                 out_dtype=jnp.float32,
                 view_offset=None, total_views: int = None) -> jnp.ndarray:
    """Bilinear sample via one row-gather from a `build_corner_table` table.

    Semantically identical to grid_sample_2d(image, uv, padding_mode) where
    `table = build_corner_table(image, padding_mode)` and hw = image (H, W);
    golden-tested in tests/test_interpolate.py. The table may be bf16 (faster
    rows on v5e); lerp weights are computed in f32 and the output is cast to
    `out_dtype`.

    Multi-scene flat mode (`total_views` set): `table` holds total_views
    view-slices flattened along axis 0 and `uv` addresses the `b` slices
    starting at `view_offset` (a traced scalar). Under `jax.vmap` over
    scenes (the SCENE-MIXED stage trainer) the table stays UNBATCHED and
    only uv/view_offset are batched, so XLA lowers ONE flat row-gather (and
    one flat backward scatter-add) over the concatenated row axis — a
    batched gather-with-batch-dims measured ~2.6x slower in the round-3
    xplane profile.
    """
    b = uv.shape[0]
    c4 = table.shape[-1]
    c = c4 // 4
    h, w = hw
    ix = (uv[..., 0] + 1.0) * 0.5 * (w - 1)
    iy = (uv[..., 1] + 1.0) * 0.5 * (h - 1)
    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, w - 1.0)
        iy = jnp.clip(iy, 0.0, h - 1.0)
    elif padding_mode != "zeros":
        raise ValueError(f"padding_mode {padding_mode!r} not supported")
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = ix - x0
    fy = iy - y0
    w00 = (1 - fx) * (1 - fy)
    w01 = fx * (1 - fy)
    w10 = (1 - fx) * fy
    w11 = fx * fy
    if padding_mode == "zeros":
        # points beyond the one-pixel pad would fetch a clamped (live) row:
        # zero all four weights there. Inside the pad the table's zero pad
        # already realizes zeros-mode per corner.
        inside = ((x0 >= -1) & (x0 <= w - 1) & (y0 >= -1) & (y0 <= h - 1))
        w00 = jnp.where(inside, w00, 0.0)
        w01 = jnp.where(inside, w01, 0.0)
        w10 = jnp.where(inside, w10, 0.0)
        w11 = jnp.where(inside, w11, 0.0)
    xb = jnp.clip(x0.astype(jnp.int32) + 1, 0, w)
    yb = jnp.clip(y0.astype(jnp.int32) + 1, 0, h)

    hp, wp = h + 1, w + 1
    n_rows = (b if total_views is None else total_views) * hp * wp
    flat = table.reshape(n_rows, c4)
    views = jnp.arange(b, dtype=jnp.int32)
    if view_offset is not None:
        views = views + view_offset
        if total_views is not None:
            # an out-of-range offset would otherwise feed a
            # promise_in_bounds gather silent garbage; clipping the tiny
            # (B,) view ids is free and keeps the no-select lowering
            views = jnp.clip(views, 0, total_views - 1)
    base = (views * (hp * wp))[:, None]
    idx = base + yb * wp + xb
    n = uv.shape[1]
    # promise_in_bounds: xb/yb are clipped above, so XLA can skip the
    # OOB select_n it otherwise fuses after the gather (12 ms/step on the
    # 786k-row encoder lift). Flat (B*N, 4C) shapes throughout: the 3-D
    # (B, N, 4C) form made XLA pick a points-in-lanes layout for the
    # downstream matmul and insert two full-size layout copies.
    if os.environ.get("NEO360_SORTED_SCATTER", "0") == "1":
        rows = _gather_rows_sorted_bwd(flat, idx.reshape(-1), n_rows)
    else:
        rows = flat.at[idx.reshape(-1)].get(mode="promise_in_bounds")
    # weighted corner fold in the TABLE's dtype via 2-D slices of the flat
    # {1,0}-layout rows (a (B,N,4C) reshape here makes XLA materialize a
    # retiled copy, 13 ms/step on the encoder lift; casting rows to f32 up
    # front materializes a 3 GB temp at the 8k-ray fine level). For f32
    # tables this is exact; for bf16 tables precision is already bounded by
    # the rows.
    acc = rows.dtype
    wf = [w.reshape(b * n, 1).astype(acc) for w in (w00, w01, w10, w11)]
    out = (rows[:, :c] * wf[0] + rows[:, c:2 * c] * wf[1]
           + rows[:, 2 * c:3 * c] * wf[2] + rows[:, 3 * c:] * wf[3])
    return out.reshape(b, n, c).astype(out_dtype)


def in_bounds_mask(uv: jnp.ndarray) -> jnp.ndarray:
    """|uv| <= 1 per coordinate, shape (B, N, 2) bool (parity with
    encoder_pn.py:122)."""
    return jnp.abs(uv) <= 1.0


def _interp_matrix(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) align_corners=True bilinear interpolation matrix."""
    if n_in == 1:
        return np.ones((n_out, 1), dtype=np.float32)
    if n_out == 1:
        pos = np.zeros((1,))
    else:
        pos = np.linspace(0.0, n_in - 1, n_out)
    lo = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 1)
    hi = np.clip(lo + 1, 0, n_in - 1)
    frac = (pos - lo).astype(np.float32)
    m = np.zeros((n_out, n_in), dtype=np.float32)
    rows = np.arange(n_out)
    m[rows, lo] += 1.0 - frac
    m[rows, hi] += frac
    return m


def resize_bilinear_align_corners(image: jnp.ndarray,
                                  out_hw: tuple) -> jnp.ndarray:
    """Resize (..., H, W, C) -> (..., H', W', C) via two interpolation
    matmuls (align_corners=True semantics, matching F.interpolate)."""
    h_out, w_out = out_hw
    h_in, w_in = image.shape[-3], image.shape[-2]
    if (h_in, w_in) == (h_out, w_out):
        return image
    # interp matrices in the image's dtype: a f32 matrix would silently
    # promote a bf16 pyramid to f32, doubling every downstream feature map
    # (and the encoder's 6 GB grid-lift gather rows at 8k-ray batches)
    mh = jnp.asarray(_interp_matrix(h_out, h_in), dtype=image.dtype)
    mw = jnp.asarray(_interp_matrix(w_out, w_in), dtype=image.dtype)
    out = jnp.einsum("oh,...hwc->...owc", mh, image)
    out = jnp.einsum("ow,...hwc->...hoc", mw, out)
    return out
