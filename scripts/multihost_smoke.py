"""Two-process multi-host smoke (SURVEY §5 distributed backend, last line).

Spawns TWO real `jax.distributed` CPU processes (1 local device each) on
this host and exercises, against the REAL process topology rather than an
injected process_index:

  1. per-host scene sharding — each host's NeRDS360AE train split sees a
     disjoint half of the scenes (nerds360_ae.py round-robin shard);
  2. a cross-process data-parallel train step — global batch assembled with
     make_array_from_process_local_data over a 2-process mesh, jit inserts
     the gradient all-reduce over the (here loopback) DCN;
  3. rank-0 IO guards — MetricsLogger writes only on process 0 while both
     call it; CheckpointManager.save is entered by BOTH processes (orbax
     coordinates; primary writes) and both restore the same checkpoint
     after a sync_global_devices barrier.

Parent mode (no MH_RANK): builds the fixture, spawns children, checks their
stdout + artifacts, prints PASS/FAIL. Child mode (MH_RANK set): runs the
checks and prints machine-checkable lines.

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
       PYTHONPATH=/root/repo python scripts/multihost_smoke.py
(The PALLAS_AXON_POOL_IPS unset keeps the children from claiming the TPU
grant at interpreter start; this smoke is CPU-only by design.)
"""

import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def child():
    rank = int(os.environ["MH_RANK"])
    port = os.environ["MH_PORT"]
    root = os.environ["MH_ROOT"]
    exp_dir = os.environ["MH_EXP"]

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=rank)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 1, jax.local_devices()
    assert jax.device_count() == 2, jax.device_count()
    print(f"[rank {rank}] distributed up: {jax.device_count()} global / "
          f"{len(jax.local_devices())} local devices", flush=True)

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    # 1) per-host scene sharding against the REAL process_index
    from neo360_tpu.data.nerds360_ae import NeRDS360AE
    ds = NeRDS360AE(root, "train", (32, 24), 2, 8)
    print(f"[rank {rank}] scenes: {sorted(ds.scene_ids)}", flush=True)
    assert ds.process_count == 2 and ds.process_index == rank

    # 2) cross-process dp train step: global (2, 8) batch, one row per host
    from neo360_tpu.train import loop as tl
    mesh = Mesh(np.asarray(jax.devices()).reshape(2), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    rng = np.random.default_rng(7)          # same on both ranks
    w_true = rng.normal(size=(8, 1)).astype(np.float32)
    x_local = np.ascontiguousarray(
        rng.normal(size=(2, 8)).astype(np.float32) + rank)
    y_local = x_local @ w_true
    xg = jax.make_array_from_process_local_data(sharding, x_local, (4, 8))
    yg = jax.make_array_from_process_local_data(sharding, y_local, (4, 1))

    def loss_fn(params, batch, key):
        pred = batch["x"] @ params["w"]
        mse = jnp.mean((pred - batch["y"]) ** 2)
        return mse, {"mse": mse}

    opt = optax.adam(1e-2)
    params = {"w": jnp.zeros((8, 1), jnp.float32)}
    state = tl.create_train_state(params, opt)
    step = jax.jit(tl.make_train_step(loss_fn, opt),
                   out_shardings=(NamedSharding(mesh, P()), None))
    state, metrics = step(state, {"x": xg, "y": yg}, jax.random.PRNGKey(0))
    mse0 = float(metrics["mse"])
    for i in range(40):
        state, metrics = step(state, {"x": xg, "y": yg},
                              jax.random.PRNGKey(i))
    mse1 = float(metrics["mse"])
    assert mse1 < mse0, (mse0, mse1)
    print(f"[rank {rank}] dp step across processes: mse {mse0:.4f} -> "
          f"{mse1:.4f}", flush=True)

    # 3) rank-0 IO guards: both ranks log + save; only rank 0 writes
    from neo360_tpu.train.checkpoints import CheckpointManager
    from neo360_tpu.train.logging import MetricsLogger
    logger = MetricsLogger(exp_dir)
    logger.log(1, {"mse": mse1})
    # params came back replicated (out_shardings P()): every process holds
    # the full value in its addressable shard — no allgather needed
    host_state = jax.tree_util.tree_map(
        lambda x: np.asarray(x.addressable_data(0)), state.params)
    # SHARED checkpoint dir (this host's disk stands in for shared
    # storage): BOTH ranks enter save — orbax coordinates internally and
    # the primary host writes (checkpoints.py save docstring; skipping
    # non-primary desyncs orbax's barriers, the bug this smoke caught)
    ckpt = CheckpointManager(os.environ["MH_CKPT"], primary=rank == 0)
    ckpt.save(1, {"w_all": host_state["w"]}, {"val_psnr": 1.0})
    ckpt.wait()
    multihost_utils.sync_global_devices("ckpt_written")
    raw = ckpt.restore_raw()
    assert raw is not None and raw["w_all"].shape == host_state["w"].shape
    print(f"[rank {rank}] ckpt save+restore ok across processes",
          flush=True)
    multihost_utils.sync_global_devices("done")
    print(f"[rank {rank}] OK", flush=True)


def parent():
    from neo360_tpu.data.fixtures import make_multi_scene_root
    tmp = tempfile.mkdtemp(prefix="mh_smoke_")
    root = make_multi_scene_root(os.path.join(tmp, "scenes"), n_scenes=4,
                                 n_train=101, n_val=1, wh=(32, 24))
    port = 29876
    procs, logs = [], []
    for rank in range(2):
        env = dict(os.environ, MH_RANK=str(rank), MH_PORT=str(port),
                   MH_ROOT=root, MH_EXP=os.path.join(tmp, f"exp_r{rank}"),
                   MH_CKPT=os.path.join(tmp, "shared_orbax"),
                   JAX_PLATFORMS="cpu")
        env.pop("PALLAS_AXON_POOL_IPS", None)   # never claim the TPU grant
        env.pop("XLA_FLAGS", None)              # exactly 1 device per proc
        # children write to FILES, not pipes: with pipes the parent would
        # read rank 0 first, and a rank-1 pipe fill (>64 KB of warnings)
        # would stall rank 1 mid-collective and deadlock both ranks
        logs.append(open(os.path.join(tmp, f"rank{rank}.log"), "w+b"))
        procs.append(subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__)],
            stdout=logs[rank], stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    deadline = time.time() + 1200
    outs = []
    for rank, p in enumerate(procs):
        try:
            p.wait(timeout=max(10, deadline - time.time()))
        except subprocess.TimeoutExpired:
            p.kill()
            p.wait()
        logs[rank].flush()
        logs[rank].seek(0)
        outs.append(logs[rank].read().decode())
        logs[rank].close()
        print(f"----- rank {rank} (rc={p.returncode}) -----")
        print("\n".join(l for l in outs[rank].splitlines()
                        if not l.startswith("WARNING")))
    ok = all(p.returncode == 0 for p in procs) \
        and all(f"[rank {r}] OK" in outs[r] for r in range(2))
    # disjoint scene shards covering all 4 fixture scenes
    import re
    shards = [set(re.search(r"scenes: \[(.*)\]", o).group(1).split(", "))
              for o in outs if "scenes:" in o]
    ok = ok and len(shards) == 2 and not (shards[0] & shards[1]) \
        and len(shards[0] | shards[1]) == 4
    # rank-0-only IO: rank 0's exp dir has metrics + ckpt, rank 1's has no
    # metrics file (MetricsLogger guard) — each rank had its OWN exp dir so
    # the guard (not path collision) is what's tested
    m0 = os.path.exists(os.path.join(tmp, "exp_r0", "metrics.jsonl"))
    m1 = os.path.exists(os.path.join(tmp, "exp_r1", "metrics.jsonl"))
    ok = ok and m0 and not m1
    print(f"metrics.jsonl: rank0={m0} rank1={m1} (guard wants True/False)")
    print("MULTIHOST SMOKE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(child() if "MH_RANK" in os.environ else parent())
