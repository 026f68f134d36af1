"""Multi-device tests on the 8-device virtual CPU mesh (replaces the
reference's untestable DDP path, SURVEY §4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neo360_tpu.parallel import sharding as sh


def test_make_mesh_shapes():
    mesh = sh.make_mesh()
    assert mesh.shape == {"data": 8}
    mesh2 = sh.make_mesh({"data": 4, "model": 2})
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        sh.make_mesh({"data": 3})


def test_shard_batch_placement():
    mesh = sh.make_mesh()
    batch = {"rays": jnp.zeros((16, 3)), "src": jnp.zeros((3, 8, 8, 3))}
    out = sh.shard_batch(batch, mesh)
    # rays divisible by 8 -> sharded; src (leading 3) -> replicated
    assert not out["rays"].sharding.is_fully_replicated
    assert out["src"].sharding.is_fully_replicated


def test_tp_param_shardings():
    mesh = sh.make_mesh({"data": 4, "model": 2})
    params = {"big": {"kernel": jnp.zeros((256, 1024)),
                      "bias": jnp.zeros((1024,))},
              "small": {"kernel": jnp.zeros((16, 16)),
                        "bias": jnp.zeros((16,))}}
    shardings = sh.tp_param_shardings(params, mesh)
    assert shardings["big"]["kernel"].spec == jax.sharding.PartitionSpec(
        None, "model")
    assert shardings["small"]["kernel"].spec == jax.sharding.PartitionSpec()


def test_dp_training_matches_single_device():
    """A dp-sharded train step must produce the same update as single-device
    (the psum'd mean-grad equals the global-batch grad)."""
    mesh = sh.make_mesh()

    def loss_fn(params, batch, key):
        pred = batch["x"] @ params["w"]
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, {"loss": loss}

    from neo360_tpu.train import loop as tl
    opt = optax.sgd(0.1)
    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.normal(size=(4, 2)), jnp.float32)}
    batch = {"x": jnp.asarray(rng.normal(size=(16, 4)), jnp.float32),
             "y": jnp.asarray(rng.normal(size=(16, 2)), jnp.float32)}
    step = tl.make_train_step(loss_fn, opt)

    state1 = tl.create_train_state(params, opt)
    state1, m1 = jax.jit(step)(state1, batch, jax.random.PRNGKey(0))

    state2 = sh.replicate_tree(tl.create_train_state(params, opt), mesh)
    sharded = sh.shard_batch(batch, mesh)
    state2, m2 = jax.jit(step)(state2, sharded, jax.random.PRNGKey(0))

    np.testing.assert_allclose(np.asarray(state1.params["w"]),
                               np.asarray(state2.params["w"]), atol=1e-6)


def test_graft_entry_dryrun(monkeypatch):
    """The driver's multi-chip dry run must pass on the virtual mesh.

    Phase 3 (cli-on-mesh subprocess) is forced to skip via a tiny budget:
    its cold 8-partition compile takes tens of minutes on 1-CPU hosts, and
    the same path is covered by the 2-device cli smokes in test_cli.py."""
    import __graft_entry__ as ge
    monkeypatch.setenv("NEO360_DRYRUN_BUDGET", "1")
    ge.dryrun_multichip(8)


def test_multihost_scene_sharding(multi_scene_root):
    """SURVEY §5 per-host scene sharding: the train split partitions scene
    ids round-robin over hosts; val keeps the full list; a host left with
    zero scenes is an error."""
    from neo360_tpu.data.nerds360_ae import NeRDS360AE

    full = NeRDS360AE(multi_scene_root, "train", (16, 12)).scene_ids
    assert len(full) == 3
    shards = [NeRDS360AE(multi_scene_root, "train", (16, 12),
                         process_index=i, process_count=2).scene_ids
              for i in range(2)]
    assert sorted(shards[0] + shards[1]) == full
    assert set(shards[0]).isdisjoint(shards[1])
    val = NeRDS360AE(multi_scene_root, "val", (16, 12),
                     process_index=1, process_count=2).scene_ids
    assert val == full
    with pytest.raises(ValueError):
        NeRDS360AE(multi_scene_root, "train", (16, 12),
                   process_index=3, process_count=4)


def test_rank0_io_guards(tmp_path):
    """Non-primary hosts write no logs, images, or checkpoints (reference
    interface.py:199 rank-zero guards)."""
    import jax
    import optax
    from neo360_tpu.train import loop as tl
    from neo360_tpu.train.checkpoints import CheckpointManager
    from neo360_tpu.train.logging import MetricsLogger, is_primary_process

    assert is_primary_process()      # single-process test run

    lg = MetricsLogger(str(tmp_path / "lg"), primary=False)
    lg.log(1, {"mse": 0.5})
    assert lg.log_image(1, "grid", np.zeros((4, 4, 3))) is None
    lg.close()
    assert not os.path.exists(str(tmp_path / "lg" / "metrics.jsonl"))

    state = tl.create_train_state({"w": jnp.zeros(3)}, optax.adam(1e-3))
    mgr = CheckpointManager(str(tmp_path / "ck"), primary=False)
    mgr.save(1, jax.device_get(state), {"val_psnr": 1.0})
    mgr.wait()
    assert mgr.latest_step() is None
    mgr.close()

    # primary default writes normally
    lg2 = MetricsLogger(str(tmp_path / "lg2"))
    lg2.log(1, {"mse": 0.5})
    lg2.close()
    assert os.path.exists(str(tmp_path / "lg2" / "metrics.jsonl"))


@pytest.mark.slow
def test_graft_entry_single_chip_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (64, 3)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_two_process_multihost_smoke():
    """REAL jax.distributed 2-process run (SURVEY §5's last line): scene
    sharding by true process_index, cross-process dp step, rank-0 logger
    guard, orbax save entered by all processes. Runs the standalone smoke
    (scripts/multihost_smoke.py) in subprocesses — ~5 min on the 1-core
    host (two concurrent CPU compiles)."""
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, "-u",
         os.path.join(repo, "scripts", "multihost_smoke.py")],
        env=env, cwd=repo, capture_output=True, timeout=1500, text=True)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert "MULTIHOST SMOKE: PASS" in r.stdout
