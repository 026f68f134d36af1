"""Device-op profile of the NeO-360 train step: trace one staged dispatch
with jax.profiler and print the top XLA ops by device time.

The xplane trace is parsed locally (tensorflow.tsl xplane proto — no
tensorboard UI needed; works over the axon tunnel, which reports device ops
in the "/device:TPU" planes).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_step.py
Env:
  NEO360_PROF_RAYS (default 512), NEO360_PROF_MODE (proposal|reference),
  NEO360_PROF_TOP (default 40), NEO360_PROF_DIR (default /tmp/prof)
"""

import collections
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scripts.bench_attr import full_step, make_batches, N_STEPS  # noqa: E402
from neo360_tpu.models.neo360 import NeRFTP  # noqa: E402
from neo360_tpu.train import loop as tl  # noqa: E402
from __graft_entry__ import _example_inputs  # noqa: E402


def summarize_xspace(log_dir: str, top: int = 40):
    """Per-line EXCLUSIVE busy-time attribution.

    Events on one xplane line nest (a fusion contains its sub-ops) and async
    pairs (copy-start/copy-done) span their whole in-flight window, so naive
    duration sums overstate wildly. Per line we sweep events in start order
    and charge each op its self time (duration minus children), then report
    the top ops of the busiest line — on TPU that is the TensorCore line,
    whose busy total ~= wall step time.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane.pb found under", log_dir)
        return
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    lines = {}      # (plane, line) -> Counter(op -> exclusive ps)
    busy = {}       # (plane, line) -> merged-interval busy ps
    for plane in space.planes:
        name = plane.name
        if "TPU" not in name and "device" not in name.lower():
            continue
        if "host" in name.lower():
            continue
        events = plane.event_metadata
        for line in plane.lines:
            evs = []
            for ev in line.events:
                meta = events.get(ev.metadata_id)
                if meta is None or ev.duration_ps <= 0:
                    continue
                evs.append((ev.offset_ps, ev.offset_ps + ev.duration_ps,
                            meta.name))
            if not evs:
                continue
            evs.sort()
            key = (name, line.name or f"line{line.id}")
            per_op = lines.setdefault(key, collections.Counter())
            # exclusive time: subtract any nested child spans via a stack
            stack = []  # (start, end, op, child_ps)
            b = 0
            merged_end = 0
            for s, e, op in evs:
                b += max(0, e - max(s, merged_end))
                merged_end = max(merged_end, e)
                while stack and s >= stack[-1][1]:
                    st = stack.pop()
                    per_op[st[2]] += (st[1] - st[0]) - st[3]
                    if stack:
                        stack[-1][3] += st[1] - st[0]
                stack.append([s, e, op, 0])
            while stack:
                st = stack.pop()
                per_op[st[2]] += (st[1] - st[0]) - st[3]
                if stack:
                    stack[-1][3] += st[1] - st[0]
            busy[key] = b

    if not lines:
        print("no device events found")
        return
    for key in sorted(busy, key=lambda k: -busy[k]):
        plane, line = key
        print(f"\n== {plane} :: {line}  busy {busy[key] / 1e9:.2f} ms ==")
        per_op = lines[key]
        tot = sum(per_op.values())
        if busy[key] < 1e9:        # skip near-idle lines
            continue
        print(f"{'op (exclusive)':70s} {'ms':>9s} {'%':>6s}")
        for name, ps in per_op.most_common(top):
            print(f"{name[:70]:70s} {ps / 1e9:9.2f} {100 * ps / tot:6.1f}")


def main():
    n_rays = int(os.environ.get("NEO360_PROF_RAYS", "512"))
    mode = os.environ.get("NEO360_PROF_MODE", "proposal")
    log_dir = os.environ.get("NEO360_PROF_DIR", "/tmp/prof")
    top = int(os.environ.get("NEO360_PROF_TOP", "40"))

    batch = _example_inputs(n_rays=n_rays, hw=(240, 320), seed=0)
    batches = make_batches(batch)
    g = [int(v) for v in os.environ.get(
        "NEO360_PROF_GRID", "64,64,32").split(",")]
    grid = tuple(g * 3 if len(g) == 1 else g)
    model = NeRFTP(compute_dtype=jnp.bfloat16,
                   use_proposal=(mode == "proposal"), num_prop_samples=64,
                   remat_encoder=False, lift_dim=128, grid_size=grid,
                   num_fine_samples=64 if mode == "proposal" else 256)
    step, state = full_step(model, batch, mode=mode)
    staged = tl.make_staged_trainer(step)

    key = jax.random.PRNGKey(7)
    state, m = staged(state, batches, key)        # compile + warm
    float(jax.tree_util.tree_leaves(m)[0])

    t0 = time.time()
    state, m = staged(state, batches, jax.random.fold_in(key, 1))
    float(jax.tree_util.tree_leaves(m)[0])
    dt = (time.time() - t0) / N_STEPS
    print(f"step: {dt * 1e3:.1f} ms ({n_rays / dt:.0f} rays/s)", flush=True)

    with jax.profiler.trace(log_dir):
        state, m = staged(state, batches, jax.random.fold_in(key, 2))
        float(jax.tree_util.tree_leaves(m)[0])

    summarize_xspace(log_dir, top)


if __name__ == "__main__":
    main()
