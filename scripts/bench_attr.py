"""Step-time attribution for the NeO-360 proposal-mode train step.

Times (fetch-synced, staged 16-step dispatches, 512 rays unless overridden):
  A. full train step (encoder + ray branch, fwd+bwd+adam)
  B. encoder-only step (fwd+bwd+adam of encode() through a scalar loss)
  C. ray-branch-heavy step with a tiny 8^3 grid (encoder ~free)
so encoder share ~= A - C, and B cross-checks it.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_attr.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from neo360_tpu.models.neo360 import (NeRFTP, neo360_distortion_loss,
                                      neo360_interlevel_loss)
from neo360_tpu.ops import losses as L
from neo360_tpu.train import loop as tl
from __graft_entry__ import _example_inputs

RAY_KEYS = ("rays_o", "rays_d", "viewdirs", "src_imgs", "src_poses",
            "src_focal", "src_c")
N_STEPS = 16


def timed_staged(step, state, batches, label):
    staged = tl.make_staged_trainer(step)
    key = jax.random.PRNGKey(7)
    state, m = staged(state, batches, key)   # compile (state is donated)
    float(jax.tree_util.tree_leaves(m)[0])
    t0 = time.time()
    state, m = staged(state, batches, jax.random.fold_in(key, 1))
    float(jax.tree_util.tree_leaves(m)[0])
    dt = (time.time() - t0) / N_STEPS
    print(f"{label:36s} {dt * 1e3:8.1f} ms/step", flush=True)
    return dt


def make_batches(batch):
    rng = np.random.default_rng(1)
    return {k: jnp.stack([v for _ in range(N_STEPS)]) for k, v in batch.items()}


def full_step(model, batch, mode="proposal"):
    rays = {k: batch[k] for k in RAY_KEYS}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, True, False, train=False)
    opt = optax.chain(optax.clip_by_global_norm(0.05), optax.adam(5e-4))

    def loss_fn(params, model_state, b, key):
        rays = {k: b[k] for k in RAY_KEYS}
        out, new_state = model.apply(
            {"params": params, "batch_stats": model_state},
            rays, True, False, train=True, rngs={"sampling": key},
            mutable=["batch_stats"])
        l1 = L.img2mse(out[1]["rgb"], b["target"])
        loss = l1 + neo360_distortion_loss(out)
        if mode == "proposal":
            loss = loss + neo360_interlevel_loss(out)
        else:
            loss = loss + L.img2mse(out[0]["rgb"], b["target"])
        return loss, ({"mse": l1}, new_state["batch_stats"])

    step = tl.make_train_step(loss_fn, opt, with_model_state=True)
    state = tl.create_train_state(variables["params"], opt,
                                  variables["batch_stats"])
    return step, state


def encoder_step(model, batch):
    rays = {k: batch[k] for k in RAY_KEYS}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, True, False, train=False)
    opt = optax.adam(5e-4)

    def loss_fn(params, model_state, b, key):
        out, new_state = model.apply(
            {"params": params, "batch_stats": model_state},
            b["src_imgs"], b["src_poses"], b["src_focal"], b["src_c"], True,
            method=NeRFTP.encode, mutable=["batch_stats"])
        plane_tables, local_tables, _ = out
        loss = sum(jnp.mean(jnp.square(t.astype(jnp.float32)))
                   for t in plane_tables)
        loss += sum(jnp.mean(jnp.square(t.astype(jnp.float32)))
                    for t in local_tables.values())
        return loss, ({"loss": loss}, new_state["batch_stats"])

    step = tl.make_train_step(loss_fn, opt, with_model_state=True)
    state = tl.create_train_state(variables["params"], opt,
                                  variables["batch_stats"])
    return step, state


def main():
    n_rays = int(os.environ.get("NEO360_ATTR_RAYS", "512"))
    batch = _example_inputs(n_rays=n_rays, hw=(240, 320), seed=0)
    batches = make_batches(batch)
    print(f"n_rays={n_rays}  (prop 64 + fine 64, bf16)")

    kw = dict(compute_dtype=jnp.bfloat16, use_proposal=True,
              num_prop_samples=64, num_fine_samples=64, remat_encoder=False)

    model = NeRFTP(**kw)
    a = timed_staged(*full_step(model, batch), batches=batches,
                     label="A. full step (64^3 grid)")

    b = timed_staged(*encoder_step(model, batch), batches=batches,
                     label="B. encoder-only (64^3 grid)")

    tiny = NeRFTP(**{**kw, "grid_size": (8, 8, 8)})
    c = timed_staged(*full_step(tiny, batch), batches=batches,
                     label="C. full step (8^3 grid)")

    print(f"\nencoder share (A-C): {(a - c) * 1e3:.1f} ms;  "
          f"encoder-only: {b * 1e3:.1f} ms;  ray branch ~= {c * 1e3:.1f} ms")


def encoder_sweep():
    """Encoder-only cost vs grid size: isolates grid-lift+pillar (scales
    with G^3) from ResNet/pyramid/corner-table builds (constant)."""
    batch = _example_inputs(n_rays=64, hw=(240, 320), seed=0)
    batches = make_batches(batch)
    for g in (64, 48, 32, 16):
        model = NeRFTP(compute_dtype=jnp.bfloat16, use_proposal=True,
                       num_prop_samples=64, num_fine_samples=64,
                       remat_encoder=False, grid_size=(g, g, g))
        timed_staged(*encoder_step(model, batch), batches=batches,
                     label=f"encoder-only grid {g}^3")


if __name__ == "__main__" and os.environ.get("NEO360_ATTR_SWEEP"):
    encoder_sweep()
elif __name__ == "__main__":
    main()
