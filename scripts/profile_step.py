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
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane.pb found under", log_dir)
        return
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    per_op = collections.Counter()
    total_ps = 0
    for plane in space.planes:
        name = plane.name
        if "TPU" not in name and "device" not in name.lower():
            continue
        if "host" in name.lower():
            continue
        stats = {sid: s.name for sid, s in plane.stat_metadata.items()}
        events = plane.event_metadata
        for line in plane.lines:
            # XLA Ops / XLA TraceMe lines carry per-op device events
            for ev in line.events:
                meta = events.get(ev.metadata_id)
                if meta is None:
                    continue
                per_op[meta.name] += ev.duration_ps
                total_ps += ev.duration_ps
        print(f"plane: {name}  lines: {len(plane.lines)}")
    if not per_op:
        print("no device events found")
        return
    print(f"\n{'op':70s} {'ms':>9s} {'%':>6s}")
    for name, ps in per_op.most_common(top):
        print(f"{name[:70]:70s} {ps / 1e9:9.2f} {100 * ps / total_ps:6.1f}")
    print(f"{'TOTAL (summed event time; lines may overlap)':70s} "
          f"{total_ps / 1e9:9.2f}")


def main():
    n_rays = int(os.environ.get("NEO360_PROF_RAYS", "512"))
    mode = os.environ.get("NEO360_PROF_MODE", "proposal")
    log_dir = os.environ.get("NEO360_PROF_DIR", "/tmp/prof")
    top = int(os.environ.get("NEO360_PROF_TOP", "40"))

    batch = _example_inputs(n_rays=n_rays, hw=(240, 320), seed=0)
    batches = make_batches(batch)
    model = NeRFTP(compute_dtype=jnp.bfloat16,
                   use_proposal=(mode == "proposal"), num_prop_samples=64,
                   remat_encoder=False, lift_dim=128,
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
