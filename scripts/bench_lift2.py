"""Gather rate vs element dtype at fixed row BYTES (grid-lift shape).

Hypothesis from bench_lift.py: XLA's row gather is descriptor/lane-rate
limited, and bf16 lanes are slower than f32 lanes at the same byte width.
If so, packing bf16 pairs into f32 lanes (bitcast, no data change) speeds
the gather for free.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_lift2.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=8, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
        float(jnp.sum(r[:1].astype(jnp.float32)))
        r.delete()
    t0 = time.time()
    for k in range(n):
        r = fn(*args)
        if k < n - 1:
            r.delete()          # free HBM; dispatch is async regardless
    float(jnp.sum(r[:1].astype(jnp.float32)))
    r.delete()
    return (time.time() - t0) / n


def main():
    print(jax.devices())
    NV, R, C4 = 3, 121 * 161, 2048
    G = 64 ** 3
    rng = np.random.default_rng(0)
    tab16 = jnp.asarray(rng.standard_normal((NV * R, C4)) * 0.1, jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, NV * R, (NV * G,)), jnp.int32)
    gb = NV * G * C4 * 2 / 1e9

    take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))

    dt = timeit(take, tab16, idx)
    print(f"bf16 rows ({C4} lanes, 4KB)    : {dt*1e3:8.2f} ms {gb/dt:6.1f} GB/s")

    tab32p = jax.jit(lambda t: jax.lax.bitcast_convert_type(
        t.reshape(NV * R, C4 // 2, 2), jnp.float32).reshape(NV * R, C4 // 2))(tab16)
    dt = timeit(take, tab32p, idx)
    print(f"f32-packed rows (1024 lanes, 4KB): {dt*1e3:8.2f} ms {gb/dt:6.1f} GB/s")

    # packed + unpack back to bf16 after gather (the real usage)
    def take_unpack(t, i):
        rows = jnp.take(t, i, axis=0)
        return jax.lax.bitcast_convert_type(rows, jnp.bfloat16).reshape(
            -1, C4)
    dt = timeit(jax.jit(take_unpack), tab32p, idx)
    print(f"f32-packed + unpack to bf16     : {dt*1e3:8.2f} ms {gb/dt:6.1f} GB/s")

    # narrow rows: 512ch bf16 (1KB) vs 256 f32 lanes (1KB)
    tabn16 = tab16[:, :512]
    idx_n = idx
    gbn = NV * G * 512 * 2 / 1e9
    dt = timeit(take, tabn16, idx_n)
    print(f"bf16 rows (512 lanes, 1KB)     : {dt*1e3:8.2f} ms {gbn/dt:6.1f} GB/s")
    tabn32 = jax.jit(lambda t: jax.lax.bitcast_convert_type(
        t.reshape(NV * R, 256, 2), jnp.float32).reshape(NV * R, 256))(tabn16)
    dt = timeit(take, tabn32, idx_n)
    print(f"f32-packed (256 lanes, 1KB)    : {dt*1e3:8.2f} ms {gbn/dt:6.1f} GB/s")

    # scatter-add (the backward side) bf16 vs f32 accumulate
    def scat16(g, i):
        z = jnp.zeros((NV * R, C4), jnp.bfloat16)
        return z.at[i].add(g)
    g16 = jnp.ones((NV * G, C4), jnp.bfloat16)
    dt = timeit(jax.jit(scat16), g16, idx, n=4)
    print(f"scatter-add bf16 rows          : {dt*1e3:8.2f} ms {gb/dt:6.1f} GB/s")

    def scat32(g, i):
        z = jnp.zeros((NV * R, C4), jnp.float32)
        return z.at[i].add(g.astype(jnp.float32)).astype(jnp.bfloat16)
    dt = timeit(jax.jit(scat32), g16, idx, n=4)
    print(f"scatter-add f32 accum          : {dt*1e3:8.2f} ms {gb/dt:6.1f} GB/s")

    # 2D-block take: rows as (2, 1024) f32 blocks (8KB per descriptor)
    tab2d = tab32p.reshape(NV * R // 2, 2 * (C4 // 2))
    idx_half = idx // 2   # fake: just rate-test 393k descriptors of 8KB
    take2 = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    dt = timeit(take2, tab2d, idx_half[: NV * G // 2])
    print(f"f32 8KB rows (393k descriptors) : {dt*1e3:8.2f} ms {gb/dt:6.1f} GB/s")


if __name__ == "__main__":
    main()
