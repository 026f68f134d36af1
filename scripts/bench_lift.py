"""Microbenchmark: the encoder grid-lift gather at its real shape.

Shape: corner table (3, 121, 161, 2048) bf16 (120x160 pixel latent, 512 ch
x 4 corners), 262,144 grid points per view (64^3). Questions:
  1. What bandwidth does XLA's row gather actually hit at 4 KB rows?
  2. Does index coherence help (grid order is already pillar-coherent;
     fully sorted is the upper bound)?
  3. fwd+bwd cost (the scatter-add side).
  4. f32 vs bf16 rows.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_lift.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=8, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0][:1]))
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0][:1]))
    return (time.time() - t0) / n


def main():
    print(jax.devices())
    NV, HP, WP, C4 = 3, 121, 161, 2048
    G = 64 ** 3
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((NV, HP * WP, C4)) * 0.1,
                        jnp.bfloat16)
    # plausible projected uv: a perspective projection of the regular grid.
    # emulate with smooth per-pillar index paths: base row + small walk.
    xs = rng.uniform(0, WP - 1, (NV, 64, 64, 1))
    ys = rng.uniform(0, HP - 1, (NV, 64, 64, 1))
    dx = rng.uniform(-0.3, 0.3, (NV, 64, 64, 1))
    dy = rng.uniform(-0.3, 0.3, (NV, 64, 64, 1))
    z = np.arange(64)[None, None, None, :]
    xi = np.clip(xs + dx * z, 0, WP - 1).astype(np.int32)
    yi = np.clip(ys + dy * z, 0, HP - 1).astype(np.int32)
    idx_coh = jnp.asarray((yi * WP + xi).reshape(NV, G))       # pillar-coherent
    idx_rand = jnp.asarray(rng.integers(0, HP * WP, (NV, G)), jnp.int32)

    base = (jnp.arange(NV, dtype=jnp.int32) * (HP * WP))[:, None]
    flat = table.reshape(NV * HP * WP, C4)

    gb = NV * G * C4 * 2 / 1e9  # bf16 payload

    def gather(idx):
        return jnp.take(flat, (base + idx).reshape(-1), axis=0)

    f = jax.jit(gather)
    dt = timeit(f, idx_rand)
    print(f"fwd random   : {dt*1e3:8.2f} ms  {gb/dt:6.1f} GB/s")
    dt = timeit(f, idx_coh)
    print(f"fwd coherent : {dt*1e3:8.2f} ms  {gb/dt:6.1f} GB/s")
    idx_sorted = jnp.sort(idx_rand, axis=-1)
    dt = timeit(f, idx_sorted)
    print(f"fwd sorted   : {dt*1e3:8.2f} ms  {gb/dt:6.1f} GB/s")

    def gather_sortfirst(idx):
        s = jnp.argsort(idx, axis=-1)
        si = jnp.take_along_axis(idx, s, axis=-1)
        return gather(si), s
    dt = timeit(jax.jit(gather_sortfirst), idx_rand)
    print(f"fwd sort+gath: {dt*1e3:8.2f} ms  {gb/dt:6.1f} GB/s (incl argsort)")

    # fwd+bwd (scatter-add of cotangent into the table)
    def loss(tab, idx):
        fl = tab.reshape(NV * HP * WP, C4)
        rows = jnp.take(fl, (base + idx).reshape(-1), axis=0)
        return jnp.sum(rows.astype(jnp.float32) ** 2) * 1e-6
    g = jax.jit(jax.grad(loss), static_argnums=())
    dt = timeit(g, table, idx_rand, n=4)
    print(f"fwd+bwd rand : {dt*1e3:8.2f} ms")
    dt = timeit(g, table, idx_coh, n=4)
    print(f"fwd+bwd coh  : {dt*1e3:8.2f} ms")

    # f32 table for comparison
    table32 = table.astype(jnp.float32)
    flat32 = table32.reshape(NV * HP * WP, C4)
    f32 = jax.jit(lambda idx: jnp.take(flat32, (base + idx).reshape(-1),
                                       axis=0))
    dt = timeit(f32, idx_rand)
    print(f"fwd random f32: {dt*1e3:8.2f} ms  {2*gb/dt:6.1f} GB/s")

    # narrow rows (512 ch = 1 KB): the post-MLP unsort shape
    flat_n = flat[:, :512]
    fn_ = jax.jit(lambda idx: jnp.take(flat_n, (base + idx).reshape(-1),
                                       axis=0))
    dt = timeit(fn_, idx_rand)
    print(f"fwd random 512ch: {dt*1e3:8.2f} ms  {gb/4/dt:6.1f} GB/s")


if __name__ == "__main__":
    main()
