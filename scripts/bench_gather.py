"""Microbenchmark: bilinear plane-gather strategies on the real TPU.

The NeO-360 step is dominated by `index_grid` / `index_latent` feature
indexing (BASELINE.md attribution: ~760 ms of a ~1.05 s step). This script
compares, at the real fine-level shapes, the candidate implementations:

  A. current `grid_sample_2d` — 4 corner row-gathers of C floats each
  B. quad-layout — one gather of a 4C row from a precomputed (H+1,W+1,4C)
     neighborhood table (4x fewer gather descriptors, same payload bytes)
  C. B with a bf16 table
  D. backward variants: XLA scatter-add (autodiff of A and B)

Timing is synced by fetching a scalar to the host (block_until_ready does
not wait for remote execution under the axon tunnel).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from neo360_tpu.ops.interpolate import grid_sample_2d


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
        float(jnp.sum(r) if isinstance(r, jnp.ndarray) else sum(
            jnp.sum(x) for x in jax.tree_util.tree_leaves(r)))
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    s = float(jnp.sum(r) if isinstance(r, jnp.ndarray) else sum(
        jnp.sum(x) for x in jax.tree_util.tree_leaves(r)))
    dt = (time.time() - t0) / n
    return dt, s


def build_quad(plane, mode="zeros"):
    """(B,H,W,C) -> (B,H+1,W+1,4C) table of 2x2 neighborhoods.

    Q[b,y,x] = concat(P[y-1,x-1], P[y-1,x], P[y,x-1], P[y,x]) over a
    one-pixel pad (zeros or edge), so a point with floor coords (y0,x0)
    reads Q[y0+1, x0+1] and gets all four corners in slice order
    (y0x0, y0x1, y1x0, y1x1)... constructed via shifted pads below.
    """
    b, h, w, c = plane.shape
    if mode == "zeros":
        pad = jnp.pad(plane, ((0, 0), (1, 1), (1, 1), (0, 0)))
    else:
        pad = jnp.pad(plane, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    # base (y0+1, x0+1) in padded coords; corners at offsets (0,0),(0,1),
    # (1,0),(1,1) relative to (y0,x0) => padded rows y0+1+dy, cols x0+1+dx
    q = jnp.concatenate([
        pad[:, 0:h + 1, 0:w + 1],      # (y0, x0)
        pad[:, 0:h + 1, 1:w + 2],      # (y0, x1)
        pad[:, 1:h + 2, 0:w + 1],      # (y1, x0)
        pad[:, 1:h + 2, 1:w + 2],      # (y1, x1)
    ], axis=-1)
    return q


def quad_sample(quad, uv, h, w, mode="zeros"):
    """Bilinear sample via one row-gather from the quad table."""
    b = quad.shape[0]
    c4 = quad.shape[-1]
    c = c4 // 4
    ix = (uv[..., 0] + 1.0) * 0.5 * (w - 1)
    iy = (uv[..., 1] + 1.0) * 0.5 * (h - 1)
    if mode == "border":
        ix = jnp.clip(ix, 0.0, w - 1.0)
        iy = jnp.clip(iy, 0.0, h - 1.0)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = ix - x0
    fy = iy - y0
    w00 = (1 - fx) * (1 - fy)
    w01 = fx * (1 - fy)
    w10 = (1 - fx) * fy
    w11 = fx * fy
    if mode == "zeros":
        # out-of-table points (beyond one-pixel pad) must not fetch live rows
        inside = ((x0 >= -1) & (x0 <= w - 1) & (y0 >= -1) & (y0 <= h - 1))
        w00 = jnp.where(inside, w00, 0.0)
        w01 = jnp.where(inside, w01, 0.0)
        w10 = jnp.where(inside, w10, 0.0)
        w11 = jnp.where(inside, w11, 0.0)
    xb = jnp.clip(x0.astype(jnp.int32) + 1, 0, w)
    yb = jnp.clip(y0.astype(jnp.int32) + 1, 0, h)

    hp, wp = h + 1, w + 1
    flat = quad.reshape(b * hp * wp, c4)
    base = (jnp.arange(b, dtype=jnp.int32) * (hp * wp))[:, None]
    idx = base + yb * wp + xb
    rows = jnp.take(flat, idx.reshape(-1), axis=0).reshape(
        b, uv.shape[1], c4)
    out = (rows[..., :c] * w00[..., None]
           + rows[..., c:2 * c] * w01[..., None]
           + rows[..., 2 * c:3 * c] * w10[..., None]
           + rows[..., 3 * c:] * w11[..., None])
    return out


def main():
    print(jax.devices())
    B, H, W, C = 3, 120, 160, 128
    N = 196_608  # 512 rays x 384 fine samples
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    uv = jnp.asarray(rng.uniform(-1.05, 1.05, (B, N, 2)), jnp.float32)

    # -- correctness: quad vs reference sampler
    q = build_quad(plane, "zeros")
    a = grid_sample_2d(plane, uv, "zeros")
    bq = quad_sample(q, uv, H, W, "zeros")
    err = float(jnp.max(jnp.abs(a - bq)))
    print("quad vs grid_sample max err (zeros):", err)
    qb = build_quad(plane, "border")
    ab = grid_sample_2d(plane, uv, "border")
    bb = quad_sample(qb, uv, H, W, "border")
    print("quad vs grid_sample max err (border):",
          float(jnp.max(jnp.abs(ab - bb))))

    payload_gb = B * N * 4 * C * 4 / 1e9

    # -- forward
    f_a = jax.jit(lambda p, u: grid_sample_2d(p, u, "zeros"))
    f_b = jax.jit(lambda q, u: quad_sample(q, u, H, W, "zeros"))
    f_bq = jax.jit(lambda p, u: quad_sample(
        build_quad(p, "zeros"), u, H, W, "zeros"))
    dt, _ = timeit(f_a, plane, uv)
    print(f"fwd A (4-gather)   : {dt * 1e3:8.2f} ms  "
          f"{payload_gb / dt:6.1f} GB/s")
    dt, _ = timeit(f_b, q, uv)
    print(f"fwd B (quad)       : {dt * 1e3:8.2f} ms  "
          f"{payload_gb / dt:6.1f} GB/s")
    dt, _ = timeit(f_bq, plane, uv)
    print(f"fwd B+build        : {dt * 1e3:8.2f} ms")
    qh = q.astype(jnp.bfloat16)
    f_c = jax.jit(lambda q_, u: quad_sample(q_, u, H, W, "zeros"))
    dt, _ = timeit(f_c, qh, uv)
    print(f"fwd C (quad bf16)  : {dt * 1e3:8.2f} ms  "
          f"{payload_gb / 2 / dt:6.1f} GB/s")

    # -- forward+backward (grad wrt plane/table)
    g_a = jax.jit(jax.grad(lambda p, u: jnp.sum(grid_sample_2d(
        p, u, "zeros")) * 1e-6))
    g_b = jax.jit(jax.grad(lambda q_, u: jnp.sum(quad_sample(
        q_, u, H, W, "zeros")) * 1e-6))
    g_bq = jax.jit(jax.grad(lambda p, u: jnp.sum(quad_sample(
        build_quad(p, "zeros"), u, H, W, "zeros")) * 1e-6))
    dt, _ = timeit(g_a, plane, uv, n=5)
    print(f"fwd+bwd A          : {dt * 1e3:8.2f} ms")
    dt, _ = timeit(g_b, q, uv, n=5)
    print(f"fwd+bwd B (dQ)     : {dt * 1e3:8.2f} ms")
    dt, _ = timeit(g_bq, plane, uv, n=5)
    print(f"fwd+bwd B+fold(dP) : {dt * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()


def extra():
    B, H, W, C = 3, 120, 160, 128
    N = 196_608
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    uv = jnp.asarray(rng.uniform(-1.05, 1.05, (B, N, 2)), jnp.float32)
    payload_gb = B * N * 4 * C * 4 / 1e9

    # bf16 quad forward+backward, grad wrt the f32 plane (build+cast inside)
    def loss_bq16(p, u):
        q = build_quad(p, "zeros").astype(jnp.bfloat16)
        out = quad_sample(q, u, H, W, "zeros")
        return jnp.sum(out.astype(jnp.float32)) * 1e-6
    g = jax.jit(jax.grad(loss_bq16))
    dt, _ = timeit(g, plane, uv, n=5)
    print(f"fwd+bwd bf16 quad (build+fold inside): {dt*1e3:8.2f} ms")

    # bf16 4-gather forward (the 'bf16 gathers are slower' claim)
    p16 = plane.astype(jnp.bfloat16)
    f = jax.jit(lambda p, u: grid_sample_2d(p, u, "zeros"))
    dt, _ = timeit(f, p16, uv)
    print(f"fwd A bf16 (4-gather): {dt*1e3:8.2f} ms {payload_gb/2/dt:6.1f} GB/s")

    # quad bf16 fwd only with table prebuilt
    q16 = build_quad(plane, "zeros").astype(jnp.bfloat16)
    f2 = jax.jit(lambda q_, u: quad_sample(q_, u, H, W, "zeros"))
    dt, _ = timeit(f2, q16, uv)
    print(f"fwd quad bf16 (table prebuilt): {dt*1e3:8.2f} ms")

    # sorted-indices gather: sort points by row id first (upper bound check)
    def sorted_gather(q_, u):
        ix = (u[..., 0] + 1.0) * 0.5 * (W - 1)
        iy = (u[..., 1] + 1.0) * 0.5 * (H - 1)
        xb = jnp.clip(jnp.floor(ix).astype(jnp.int32) + 1, 0, W)
        yb = jnp.clip(jnp.floor(iy).astype(jnp.int32) + 1, 0, H)
        idx = yb * (W + 1) + xb
        sidx = jnp.sort(idx, axis=-1)
        flat = q_.reshape(B, (H + 1) * (W + 1), 4 * C)
        return jnp.take_along_axis(
            flat, sidx[..., None], axis=1)
    f3 = jax.jit(sorted_gather)
    dt, _ = timeit(f3, q16, uv)
    print(f"fwd quad bf16 SORTED idx (incl sort): {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    extra()
