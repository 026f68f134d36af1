"""Does the data-parallel TRAIN step actually partition per-device compute?

Same method as mesh_render_scaling.py (which caught GSPMD replicating the
whole NeRFTP render body): on 8 virtual CPU devices serialized on one
physical core, a correctly partitioned dp step with the SAME total batch
costs ~= the 1-device wall (plus the gradient all-reduce); a replicated
one costs ~8x. The production dp path (cli.run_train / dryrun phase 1)
shards the ray axis of the batch via NamedSharding and leaves the
partitioning to GSPMD propagation through fwd+bwd+adam.

Run CPU-only (must not touch the TPU grant):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  PYTHONPATH=/root/repo python scripts/mesh_train_scaling.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np
import optax


def main():
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g
    from neo360_tpu.models.neo360 import NeRFTP, neo360_distortion_loss
    from neo360_tpu.ops import losses as L
    from neo360_tpu.parallel import sharding as sh
    from neo360_tpu.train import loop as tl

    assert jax.device_count() == 8, jax.devices()
    n_rays = int(os.environ.get("MT_RAYS", "2048"))
    batch = g._example_inputs(n_rays=n_rays, hw=(24, 32))
    ray_keys = ("rays_o", "rays_d", "viewdirs", "src_imgs", "src_poses",
                "src_focal", "src_c")
    model = NeRFTP(num_coarse_samples=8, num_fine_samples=8,
                   grid_size=(16, 16, 8), lift_dim=32, plane_dim=32,
                   local_proj_dim=32, encoder_width=64,
                   remat_encoder=False)
    rays = {k: batch[k] for k in ray_keys}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, True, False)
    opt = optax.adam(1e-3)

    def loss_fn(params, batch, key):
        rays = {k: batch[k] for k in ray_keys}
        out = model.apply(
            {"params": params["params"],
             "batch_stats": variables["batch_stats"]},
            rays, True, False, rngs={"sampling": key})
        mse = L.img2mse(out[-1]["rgb"], batch["target"])
        return mse + neo360_distortion_loss(out), {"mse": mse}

    step = tl.make_train_step(loss_fn, opt)

    def timed(mesh, n_rep=3):
        state = tl.create_train_state(dict(variables), opt)
        if mesh is not None:
            state = sh.replicate_tree(state, mesh)
            b = sh.shard_batch(batch, mesh)
        else:
            b = batch
        jstep = jax.jit(step)
        key = jax.random.PRNGKey(2)
        state, m = jstep(state, b, key)           # compile + warm
        float(m["mse"])
        t0 = time.time()
        for _ in range(n_rep):
            state, m = jstep(state, b, key)
            float(m["mse"])
        return (time.time() - t0) / n_rep

    t1 = timed(None)
    t8 = timed(sh.make_mesh({"data": 8}))
    print(f"dp train step, 1 device  : {t1 * 1e3:8.1f} ms/step")
    print(f"dp train step, 8 sharded : {t8 * 1e3:8.1f} ms/step "
          f"(same 1 physical core, same total batch)")
    print(f"TRAIN_SCALING: t1={t1:.3f}s t8={t8:.3f}s ratio={t8 / t1:.2f}")


if __name__ == "__main__":
    main()
