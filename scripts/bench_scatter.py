"""Scatter-floor attack microbench (round-4 VERDICT item 5).

The round-3 xplane profile puts the fine-level corner-table scatter-adds
(the VJP of `ops.interpolate.table_sample`'s row gather) at ~18.3 ms +
8.6 ms grid-lift = 28% of the adopted 97 ms step; XLA scatter-add runs at
~45-51 GB/s on v5e (scripts/bench_lift2.py round-2 study). This measures
every known alternative formulation of "accumulate N cotangent rows into a
T-row table" at the production fine-level shape:

  a) plain scatter-add         — zeros.at[idx].add(cot)   (XLA's own VJP)
  b) sorted scatter-add        — sort idx, gather rows into sorted order,
                                 scatter with indices_are_sorted=True
  c) sorted segment_sum        — jax.ops.segment_sum(..., sorted=True):
                                 the output IS dL/dtable (no final scatter)
  d) one-hot MXU matmul        — one_hot(idx, T)^T @ cot: trades the
                                 scatter for a dense (N, T) operand + MXU
                                 contraction (viable only for small T)

Timing protocol per axon rules: scalar fetch is the only sync point.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_scatter.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
        _ = float(jnp.sum(out[0, :1]) if out.ndim > 1 else jnp.sum(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        _ = float(jnp.sum(out[0, :1]) if out.ndim > 1 else jnp.sum(out))
    return (time.time() - t0) / iters


def main():
    print("devices:", jax.devices())
    # production fine-level shape (BASELINE.md xplane row): ~58k cotangent
    # rows of 512 feats scattering into a ~66k-row flat table
    n_pts = int(os.environ.get("NPTS", "58443"))
    n_rows = int(os.environ.get("NROWS", "66560"))
    c = int(os.environ.get("C", "512"))
    dt = jnp.bfloat16 if os.environ.get("DTYPE", "bf16") == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    cot = jnp.asarray(rng.normal(size=(n_pts, c)), dt)
    idx = jnp.asarray(rng.integers(0, n_rows, size=(n_pts,)), jnp.int32)
    bytes_payload = n_pts * c * cot.dtype.itemsize

    @jax.jit
    def scatter_add(cot, idx):
        return jnp.zeros((n_rows, c), cot.dtype).at[idx].add(cot)

    @jax.jit
    def sorted_scatter(cot, idx):
        order = jnp.argsort(idx)
        si = idx[order]
        sc = cot.at[order].get(mode="promise_in_bounds")
        return jnp.zeros((n_rows, c), cot.dtype).at[si].add(
            sc, indices_are_sorted=True)

    @jax.jit
    def sorted_segsum(cot, idx):
        order = jnp.argsort(idx)
        si = idx[order]
        sc = cot.at[order].get(mode="promise_in_bounds")
        return jax.ops.segment_sum(sc, si, num_segments=n_rows,
                                   indices_are_sorted=True)

    @jax.jit
    def onehot_matmul(cot, idx):
        oh = jax.nn.one_hot(idx, n_rows, dtype=cot.dtype)      # (N, T)
        return jax.lax.dot_general(
            oh, cot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cot.dtype)

    ref = np.asarray(scatter_add(cot, idx), np.float32)
    for name, fn in [("scatter_add", scatter_add),
                     ("sorted_scatter", sorted_scatter),
                     ("sorted_segsum", sorted_segsum),
                     ("onehot_matmul", onehot_matmul)]:
        if name == "onehot_matmul" and n_rows > 20000 \
                and os.environ.get("ONEHOT", "0") != "1":
            print(f"{name:>16}: skipped (T={n_rows} one-hot operand "
                  f"{n_pts * n_rows * cot.dtype.itemsize / 1e9:.1f} GB)")
            continue
        try:
            got = np.asarray(fn(cot, idx), np.float32)
            # bf16 accumulation orders differ; loose tolerance
            err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
            dt_s = timeit(fn, cot, idx)
            print(f"{name:>16}: {dt_s * 1e3:8.2f} ms   "
                  f"{bytes_payload / dt_s / 1e9:6.1f} GB/s payload   "
                  f"rel_err {err:.3g}")
        except Exception as e:
            print(f"{name:>16}: FAILED {type(e).__name__}: {e}")

    # ---- end-to-end: table_sample fwd+bwd with each backward lowering ----
    # (the production op this feeds: ops/interpolate.table_sample; env
    # NEO360_SORTED_SCATTER=1 swaps the gather VJP for sort+segment_sum)
    from neo360_tpu.ops.interpolate import build_corner_table, table_sample
    hw = (64, 64)   # production fine-level plane table per view
    nv, n_pts_ts = 3, 8 * 65 * 24   # ~B*S points per view-row set
    img = jnp.asarray(rng.normal(size=(nv, hw[0], hw[1], 128)), dt)
    table = build_corner_table(img, "zeros")
    uv = jnp.asarray(rng.uniform(-1, 1, size=(nv, n_pts_ts, 2)), jnp.float32)

    def make_vjp_fn():
        @jax.jit
        def f(tbl, uv):
            return jax.grad(
                lambda t: jnp.sum(table_sample(t, uv, hw, "zeros") ** 2)
            )(tbl)
        return f

    for mode in ("0", "1"):
        os.environ["NEO360_SORTED_SCATTER"] = mode
        f = make_vjp_fn()
        dt_s = timeit(f, table, uv)
        label = "sorted_segsum" if mode == "1" else "scatter_add"
        print(f"table_sample vjp [{label:>13}]: {dt_s * 1e3:8.2f} ms")
    os.environ.pop("NEO360_SORTED_SCATTER", None)


if __name__ == "__main__":
    main()
