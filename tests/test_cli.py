import os

import numpy as np
import pytest

from neo360_tpu import cli
from neo360_tpu.config import preset


def test_presets_match_reference():
    v = preset("vanilla")
    assert (v.lr_init, v.lr_final, v.lr_delay_steps) == (5e-4, 5e-6, 2500)
    m = preset("mipnerf360")
    assert (m.lr_init, m.lr_final, m.lr_delay_steps) == (2e-3, 2e-5, 512)
    n = preset("triplanar_nocs_fusion_conv_scene")   # reference alias
    assert n.exp_type == "neo360"
    assert n.grad_max_norm == 0.05
    with pytest.raises(ValueError):
        preset("bogus")


def test_parse_args_roundtrip(tmp_path):
    cfg = cli.parse_args([
        "--exp_type", "vanilla", "--root_dir", str(tmp_path),
        "--img_wh", "64", "48", "--batch_size", "128",
        "--run_max_steps", "50", "--exp_name", "t"])
    assert cfg.exp_type == "vanilla"
    assert cfg.img_wh == (64, 48)
    assert cfg.batch_size == 128
    assert cfg.run_max_steps == 50


@pytest.mark.slow
def test_vanilla_train_then_eval(micro_scene, tmp_path, monkeypatch):
    """Full CLI path: train a tiny vanilla NeRF, checkpoint, then eval."""
    from neo360_tpu.models.vanilla import VanillaNeRF

    def tiny_build(cfg):
        assert cfg.exp_type == "vanilla"
        return VanillaNeRF(num_coarse_samples=8, num_fine_samples=8)

    monkeypatch.setattr(cli, "build_model", tiny_build)
    args = ["--exp_type", "vanilla", "--root_dir", micro_scene,
            "--img_wh", "40", "30", "--batch_size", "256",
            "--run_max_steps", "200", "--exp_name", "t",
            "--ckpt_dir", str(tmp_path),
            "--save_every_steps", "100", "--chunk", "600"]
    cfg = cli.parse_args(args)
    cfg = cfg.replace(steps_per_call=100)
    state = cli.run_train(cfg)
    assert int(state.step) == 200

    metrics_file = os.path.join(str(tmp_path), "t", "metrics.jsonl")
    assert os.path.exists(metrics_file)

    cfg_eval = cli.parse_args(args + ["--eval_mode", "full_eval"])
    cfg_eval = cfg_eval.replace(chunk=600)
    summary = cli.run_eval(cfg_eval)
    assert "psnr" in summary and "ssim" in summary
    assert np.isfinite(summary["psnr"])
    out_dir = os.path.join(str(tmp_path), "t", "3views")
    assert any(f.endswith(".jpg") for f in os.listdir(out_dir))
    assert os.path.exists(os.path.join(str(tmp_path), "t", "results.json"))


@pytest.mark.slow
def test_neo360_cli_train_smoke(multi_scene_root, tmp_path, monkeypatch):
    from neo360_tpu.models.neo360 import NeRFTP

    def tiny_build(cfg):
        return NeRFTP(num_coarse_samples=6, num_fine_samples=6,
                      grid_size=(8, 8, 8), remat_encoder=False,
                      num_src_views=cfg.num_src_views)

    monkeypatch.setattr(cli, "build_model", tiny_build)
    cfg = cli.parse_args([
        "--exp_type", "neo360", "--root_dir", multi_scene_root,
        "--img_wh", "40", "30", "--run_max_steps", "12",
        "--ray_batch_size", "64", "--exp_name", "n",
        "--ckpt_dir", str(tmp_path), "--save_every_steps", "1000"])
    state = cli.run_train(cfg)
    metrics_file = os.path.join(str(tmp_path), "n", "metrics.jsonl")
    assert os.path.exists(metrics_file)


def test_neo360_cli_optimize_cached_latents(multi_scene_root, tmp_path,
                                            monkeypatch, capsys):
    """Optimize mode through cli.run_train caches the frozen spatial-encoder
    latents once per scene and trains against them (the ResNet fwd+bwd drops
    out of the step); training still advances and logs. Reference freeze
    protocol neo360/model.py:957-981."""
    from neo360_tpu.models.neo360 import NeRFTP

    def tiny_build(cfg):
        # remat off: the remat'd optimize step costs >40 min of XLA:CPU
        # compile; encode_images through the remat wrapper is covered by
        # test_neo360.py::test_encode_images_under_remat
        return NeRFTP(num_coarse_samples=4, num_fine_samples=4,
                      grid_size=(8, 8, 8), remat_encoder=False,
                      num_src_views=cfg.num_src_views)

    monkeypatch.setattr(cli, "build_model", tiny_build)
    # single device: an 8-partition SPMD compile of the optimize step takes
    # tens of minutes on XLA:CPU; the mesh wiring is covered by the other
    # cli smokes — this test is about the cached-latent path
    monkeypatch.setattr(cli, "_make_mesh_if_multichip", lambda: None)
    cfg = cli.parse_args([
        "--exp_type", "neo360", "--root_dir", multi_scene_root,
        "--img_wh", "40", "30", "--run_max_steps", "2",
        "--ray_batch_size", "16", "--exp_name", "o", "--is_optimize",
        "--ckpt_dir", str(tmp_path), "--save_every_steps", "1000"])
    # steps_per_call=1 takes the scanless dispatch (train/loop.py): a
    # scan-wrapped step costs >10 min of XLA:CPU compile even on 1 device
    cfg = cfg.replace(steps_per_call=1)
    state = cli.run_train(cfg)
    assert int(np.asarray(state.step)) == 2
    assert "cached frozen spatial-encoder latents" in capsys.readouterr().out
    assert os.path.exists(os.path.join(str(tmp_path), "o", "metrics.jsonl"))


@pytest.mark.slow
def test_neo360_cli_stage_train_smoke(multi_scene_root, tmp_path,
                                      monkeypatch):
    """Scene-stage (encode-once) production path through cli.run_train:
    --stage_k/--stage_scenes select make_scene_stage_trainer with mixed
    stages; steps advance and metrics log as in per-step mode."""
    from neo360_tpu.models.neo360 import NeRFTP

    def tiny_build(cfg):
        return NeRFTP(num_coarse_samples=4, num_fine_samples=4,
                      grid_size=(8, 8, 8), remat_encoder=False,
                      num_src_views=cfg.num_src_views)

    monkeypatch.setattr(cli, "build_model", tiny_build)
    # 2-device mesh: with 8 partitions on a 1-CPU host every collective
    # rendezvous degenerates to minutes of spin-wait starvation (the stage
    # program has dozens), making the full-mesh variant unrunnable; 2
    # partitions still exercise sharded batches + grad all-reduce.
    from neo360_tpu.parallel import sharding as sh

    def two_dev_mesh():
        import jax
        return sh.make_mesh({"data": 2}, jax.devices()[:2])

    monkeypatch.setattr(cli, "_make_mesh_if_multichip", two_dev_mesh)
    cfg = cli.parse_args([
        "--exp_type", "neo360", "--root_dir", multi_scene_root,
        "--img_wh", "16", "12", "--run_max_steps", "4",
        "--ray_batch_size", "16", "--exp_name", "s",
        "--stage_k", "2", "--stage_scenes", "2",
        "--ckpt_dir", str(tmp_path), "--save_every_steps", "100"])
    cfg = cfg.replace(steps_per_call=4)
    state = cli.run_train(cfg)
    assert int(np.asarray(state.step)) == 4
    assert os.path.exists(os.path.join(str(tmp_path), "s", "metrics.jsonl"))
    # the merged params view keeps render/checkpoint compatibility
    assert "encoder" in state.params


@pytest.mark.slow
def test_neo360_cli_stage_warmup(multi_scene_root, tmp_path, monkeypatch):
    """Hybrid schedule through run_train: --stage_warmup_steps trains
    per-step-encode first, then switches to scene stages; the final step
    count covers both phases."""
    from neo360_tpu.models.neo360 import NeRFTP

    def tiny_build(cfg):
        return NeRFTP(num_coarse_samples=4, num_fine_samples=4,
                      grid_size=(8, 8, 8), remat_encoder=False,
                      num_src_views=cfg.num_src_views)

    monkeypatch.setattr(cli, "build_model", tiny_build)
    # single device: compiling BOTH the per-step and the stage trainer for
    # an SPMD mesh took ~75 min of XLA:CPU on a 1-core host; the mesh path
    # is covered by test_neo360_cli_stage_train_smoke (2-device)
    monkeypatch.setattr(cli, "_make_mesh_if_multichip", lambda: None)
    cfg = cli.parse_args([
        "--exp_type", "neo360", "--root_dir", multi_scene_root,
        "--img_wh", "16", "12", "--run_max_steps", "8",
        "--ray_batch_size", "16", "--exp_name", "w",
        "--stage_k", "4", "--stage_scenes", "2",
        "--stage_warmup_steps", "4",
        "--ckpt_dir", str(tmp_path), "--save_every_steps", "100"])
    cfg = cfg.replace(steps_per_call=4)
    state = cli.run_train(cfg)
    assert int(np.asarray(state.step)) >= 8
    log = os.path.join(str(tmp_path), "w", "metrics.jsonl")
    assert os.path.exists(log)


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    import optax
    from neo360_tpu.train import loop as tl
    from neo360_tpu.train.checkpoints import CheckpointManager

    params = {"w": jnp.arange(4.0), "b": jnp.ones((2, 2))}
    opt = optax.adam(1e-3)
    state = tl.create_train_state(params, opt)
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    import jax
    mgr.save(1, jax.device_get(state), {"val_psnr": 10.0})
    mgr.save(2, jax.device_get(state), {"val_psnr": 20.0})
    mgr.wait()
    assert mgr.latest_step() == 2
    restored = mgr.restore(jax.device_get(state))
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.arange(4.0))
    # template-free raw restore: field-name-keyed tree of arrays
    raw = mgr.restore_raw()
    assert int(raw["step"]) == 0
    np.testing.assert_allclose(np.asarray(raw["params"]["w"]),
                               np.arange(4.0))
    mgr.close()


def test_eval_restores_scene_stage_checkpoint(tmp_path):
    """A checkpoint written by the scene-stage trainer (enc/ray split) must
    be consumable by the eval path's _restore — merged params view, no
    optimizer template needed."""
    import jax
    import jax.numpy as jnp
    import optax
    from neo360_tpu.train import loop as tl
    from neo360_tpu.train.checkpoints import CheckpointManager

    params = {"encoder": {"w": jnp.ones(2)},
              "local_proj_fine": {"k": jnp.full(2, 2.0)},
              "fine_mlp": {"b": jnp.full(3, 3.0)}}
    opt = optax.adam(1e-3)
    sstate = tl.create_scene_stage_state(params, opt, opt,
                                         model_state={"bn": jnp.zeros(1)})
    sstate = sstate.replace(step=jnp.asarray(4, jnp.int32))
    exp_dir = str(tmp_path / "exp")
    mgr = CheckpointManager(os.path.join(exp_dir, "orbax"))
    mgr.save(4, jax.device_get(sstate), {"val_psnr": 1.0})
    mgr.wait()
    mgr.close()

    cfg = preset("neo360", ckpt_dir=str(tmp_path))
    variables = {"params": params, "batch_stats": {"bn": jnp.zeros(1)}}
    state = cli._restore(cfg, exp_dir, variables, opt)
    assert int(state.step) == 4
    assert set(state.params) == set(params)
    np.testing.assert_allclose(np.asarray(state.params["fine_mlp"]["b"]),
                               3.0)
    assert state.model_state is not None


def test_warm_start_from_scene_stage_checkpoint(tmp_path):
    """run_train's weights-only warm start (--ckpt_path, reference
    run.py:84-102 finetune resume): params/batch_stats come from another
    run's checkpoint — in EITHER trainer layout — while step and optimizer
    state start fresh (the stage-2 pinned-lr protocol)."""
    import jax
    import jax.numpy as jnp
    import optax
    from neo360_tpu.train import loop as tl
    from neo360_tpu.train.checkpoints import CheckpointManager

    params = {"encoder": {"w": jnp.ones(2)},
              "local_proj_fine": {"k": jnp.full(2, 2.0)},
              "fine_mlp": {"b": jnp.full(3, 3.0)}}
    opt = optax.adam(1e-3)
    sstate = tl.create_scene_stage_state(params, opt, opt,
                                         model_state={"bn": jnp.full(1, 5.0)})
    sstate = sstate.replace(step=jnp.asarray(1408, jnp.int32))
    orbax_dir = str(tmp_path / "stage1" / "orbax")
    mgr = CheckpointManager(orbax_dir)
    mgr.save(1408, jax.device_get(sstate), {"val_psnr": 1.0})
    mgr.wait()
    mgr.close()

    fresh = {"params": jax.tree.map(jnp.zeros_like, params),
             "batch_stats": {"bn": jnp.zeros(1)}}
    cfg = preset("neo360", finetune_lpips=True, ckpt_path=orbax_dir)
    out = cli._maybe_warm_start(cfg, fresh)
    np.testing.assert_allclose(np.asarray(out["params"]["fine_mlp"]["b"]),
                               3.0)
    np.testing.assert_allclose(np.asarray(out["params"]["encoder"]["w"]),
                               1.0)
    np.testing.assert_allclose(np.asarray(out["batch_stats"]["bn"]), 5.0)
    # no ckpt_path -> identity; missing ckpt -> loud failure, not silent
    # fresh-init training
    assert cli._maybe_warm_start(cfg.replace(ckpt_path=None), fresh) is fresh
    with pytest.raises(FileNotFoundError):
        cli._maybe_warm_start(
            cfg.replace(ckpt_path=str(tmp_path / "nope")), fresh)


def test_io_outputs(tmp_path):
    from neo360_tpu.utils import io
    rgbs = [np.random.default_rng(i).uniform(size=(8, 10, 3))
            for i in range(3)]
    depths = [np.random.default_rng(i).uniform(0, 5, size=(8, 10))
              for i in range(3)]
    paths = io.store_image(str(tmp_path), rgbs)
    assert len(paths) == 3 and all(os.path.exists(p) for p in paths)
    io.store_depth_img(str(tmp_path), depths)
    io.store_depth_raw(str(tmp_path), depths)
    stats = io.write_stats(str(tmp_path / "results.json"),
                           psnr={"test": 20.0}, ssim=0.9, lpips=None)
    assert os.path.exists(stats)
    vid = io.store_video(str(tmp_path), rgbs)
    assert os.path.exists(vid)


def test_eval_helpers():
    from neo360_tpu.train.eval import object_psnr, spiral_pose, trajectory_360
    rgb = np.full((8, 8, 3), 0.5)
    tgt = np.full((8, 8, 3), 0.6)
    mask = np.zeros((8, 8), bool)
    assert object_psnr(rgb, tgt, mask) is None
    mask[2:5, 3:6] = True
    val = object_psnr(rgb, tgt, mask)
    np.testing.assert_allclose(val, 20.0, rtol=1e-5)

    pose = np.eye(4)
    traj = trajectory_360(pose, 10)
    assert traj.shape == (10, 4, 4)
    assert not np.allclose(traj[0], traj[1])
    # rotation untouched
    np.testing.assert_allclose(traj[3][:3, :3], np.eye(3))


@pytest.mark.slow
def test_optimize_freezes_spatial_encoder():
    """Reference parity (neo360/model.py:957-981): is_optimize/finetune
    freezes the SpatialEncoder params (lr pinned 5e-6) while the rest of the
    model trains."""
    import flax
    import jax
    import jax.numpy as jnp
    from neo360_tpu.models.neo360 import NeRFTP
    from neo360_tpu.train import loop as tl
    from __graft_entry__ import _example_inputs

    cfg = preset("neo360", is_optimize=True, run_max_steps=10)
    model = NeRFTP(num_coarse_samples=4, num_fine_samples=4,
                   grid_size=(8, 8, 8), remat_encoder=False)
    batch = {k: jnp.asarray(v)
             for k, v in _example_inputs(n_rays=16, hw=(24, 32)).items()}
    variables = cli._init_variables(cfg, model, batch)
    optimizer = cli.build_optimizer(cfg, variables["params"])
    loss_fn = cli.make_loss_fn(cfg, model, variables)
    step_fn = jax.jit(tl.make_train_step(loss_fn, optimizer,
                                         with_model_state=True))
    state = tl.create_train_state(variables["params"], optimizer,
                                  variables["batch_stats"])
    for i in range(2):
        state, _ = step_fn(state, batch, jax.random.PRNGKey(i))
    before = flax.traverse_util.flatten_dict(
        jax.device_get(variables["params"]))
    after = flax.traverse_util.flatten_dict(jax.device_get(state.params))
    moved = 0
    for k in before:
        same = np.array_equal(np.asarray(before[k]), np.asarray(after[k]))
        if "spatial_encoder" in k:
            assert same, f"frozen SpatialEncoder param moved: {k}"
        elif not same:
            moved += 1
    assert moved > 0, "no non-encoder params trained"


def test_finetune_lpips_requires_weights(tmp_path):
    """--finetune_lpips without pretrained LPIPS weights must hard-fail:
    the LPIPS term IS stage 2 (reference run.py:93-97) — silently training
    without it would run stage 1 at a pinned 5e-6 lr."""
    cfg = preset("neo360", root_dir=str(tmp_path), finetune_lpips=True,
                 ckpt_dir=str(tmp_path / "ck"))
    with pytest.raises(ValueError, match="lpips_weights"):
        cli.run_train(cfg)


@pytest.mark.slow
def test_run_eval_heterogeneous_test_splits(tmp_path, monkeypatch):
    """run_eval iterates each scene's OWN test-view count (reference
    nerds360_ae.py:501-511); a scene with fewer val/ views must not raise."""
    from neo360_tpu.data.fixtures import make_micro_scene
    from neo360_tpu.models.neo360 import NeRFTP
    import neo360_tpu.train.eval as ev

    root = str(tmp_path / "scenes")
    make_micro_scene(os.path.join(root, "scene_a"), n_val=4, wh=(16, 12),
                     seed=100)
    make_micro_scene(os.path.join(root, "scene_b"), n_val=2, wh=(16, 12),
                     seed=101)

    def tiny_build(cfg):
        return NeRFTP(num_coarse_samples=4, num_fine_samples=4,
                      grid_size=(8, 8, 8), remat_encoder=False,
                      num_src_views=cfg.num_src_views)

    monkeypatch.setattr(cli, "build_model", tiny_build)
    counted = []

    def fake_eval(render_fn, samples, img_wh, out_dir, lpips_model=None,
                  **kw):
        counted.extend(s["rays_o"].shape for s in samples)
        return {"psnr": float(len(counted))}

    monkeypatch.setattr(ev, "evaluate_and_save", fake_eval)
    cfg = preset("neo360", root_dir=root, img_wh=(16, 12),
                 eval_mode="full_eval", exp_name="h",
                 ckpt_dir=str(tmp_path / "ck"))
    summary = cli.run_eval(cfg)
    # scene_a contributes 4 test views, scene_b only 2
    assert summary["psnr"] == 6.0 and len(counted) == 6


@pytest.mark.slow
def test_run_eval_init_uses_few_rays(tmp_path, monkeypatch):
    """run_eval must init the model on a FEW rays, never the full test
    image: a W*H-ray init forward measured 26.8 G of conditioned-point
    gather arguments at 320x240 on v5e (HBM OOM). Fixture images are small
    enough to hide the bug, so assert on the example shape directly."""
    from neo360_tpu.data.fixtures import make_micro_scene
    from neo360_tpu.models.neo360 import NeRFTP
    import neo360_tpu.train.eval as ev

    root = str(tmp_path / "scenes")
    make_micro_scene(os.path.join(root, "scene_a"), n_val=2, wh=(16, 12),
                     seed=102)

    def tiny_build(cfg):
        return NeRFTP(num_coarse_samples=4, num_fine_samples=4,
                      grid_size=(8, 8, 8), remat_encoder=False,
                      num_src_views=cfg.num_src_views)

    monkeypatch.setattr(cli, "build_model", tiny_build)
    seen = {}
    real_init = cli._init_variables

    def spying(cfg, model, example):
        seen.update({k: v.shape for k, v in example.items()})
        return real_init(cfg, model, example)

    monkeypatch.setattr(cli, "_init_variables", spying)
    monkeypatch.setattr(ev, "evaluate_and_save",
                        lambda *a, **kw: {"psnr": 0.0})
    cfg = preset("neo360", root_dir=root, img_wh=(16, 12),
                 eval_mode="full_eval", exp_name="fr",
                 ckpt_dir=str(tmp_path / "ck"))
    cli.run_eval(cfg)
    for k in ("rays_o", "rays_d", "viewdirs", "target"):
        assert seen[k][0] <= 4, f"{k} initialized with {seen[k][0]} rays"
    # per-view source entries stay whole (encoder init needs real images)
    assert seen["src_imgs"][0] == cfg.num_src_views


@pytest.mark.slow
def test_render_fn_built_once_per_train(multi_scene_root, tmp_path,
                                        monkeypatch):
    """One renderer construction (= one compile) per run_train even across
    multiple validations — the reference compiles nothing per val
    (neo360/model.py:822-907)."""
    from neo360_tpu.models.neo360 import NeRFTP

    def tiny_build(cfg):
        return NeRFTP(num_coarse_samples=4, num_fine_samples=4,
                      grid_size=(8, 8, 8), remat_encoder=False,
                      num_src_views=cfg.num_src_views)

    monkeypatch.setattr(cli, "build_model", tiny_build)
    calls = []
    real = cli.make_render_fn

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(cli, "make_render_fn", counting)
    cfg = cli.parse_args([
        "--exp_type", "neo360", "--root_dir", multi_scene_root,
        "--img_wh", "16", "12", "--run_max_steps", "8",
        "--ray_batch_size", "32", "--exp_name", "rc",
        "--ckpt_dir", str(tmp_path), "--save_every_steps", "4",
        "--chunk", "192"])
    cfg = cfg.replace(steps_per_call=4)
    cli.run_train(cfg)    # 2 validations at steps 4 and 8
    assert len(calls) == 1, f"renderer rebuilt {len(calls)} times"


def test_scene_pack_cache_unit():
    """_scene_pack_cache: one build per scene_key run, one scene resident,
    keyless samples always rebuild."""
    built = []

    def build(variables, sample):
        built.append(sample.get("scene_key"))
        return {"n": len(built)}

    get = cli._scene_pack_cache(build)
    v = {}
    assert get(v, {"scene_key": 0})["n"] == 1
    assert get(v, {"scene_key": 0})["n"] == 1      # cached
    assert get(v, {"scene_key": 1})["n"] == 2      # new scene rebuilds
    assert get(v, {"scene_key": 0})["n"] == 3      # only one scene resident
    get(v, {})
    get(v, {})                                     # keyless: always build
    assert len(built) == 5


@pytest.mark.slow
def test_render_fn_scene_cache_encodes_once(tmp_path, monkeypatch):
    """scene_cache=True encodes a scene ONCE for all of its views (the
    per-view eager re-encode measured ~2 s/view through the axon relay —
    the dominant term of the round-4 eval gap), re-encodes on scene change,
    and is bitwise-identical to the uncached path."""
    import jax

    from neo360_tpu.data.fixtures import make_micro_scene
    from neo360_tpu.data.nerds360_ae import NeRDS360AE
    from neo360_tpu.models import neo360 as neo_mod

    root = str(tmp_path / "scenes")
    make_micro_scene(os.path.join(root, "scene_a"), n_val=2, wh=(16, 12),
                     seed=110)
    make_micro_scene(os.path.join(root, "scene_b"), n_val=2, wh=(16, 12),
                     seed=111)
    model = neo_mod.NeRFTP(num_coarse_samples=4, num_fine_samples=4,
                           grid_size=(8, 8, 8), remat_encoder=False,
                           num_src_views=3)
    ds = NeRDS360AE(root, "test", (16, 12), 3)
    s0a = dict(ds.sample_test(0, 0), scene_key=0)
    s0b = dict(ds.sample_test(0, 1), scene_key=0)
    s1 = dict(ds.sample_test(1, 0), scene_key=1)
    ray_like = ("rays_o", "rays_d", "viewdirs", "radii", "target",
                "nocs_2d", "instance_mask")
    example = {k: (np.asarray(v)[:4] if k in ray_like else np.asarray(v))
               for k, v in s0a.items() if k not in ("img_wh", "scene_key")}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        example, True, False, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    calls = []
    real_enc = neo_mod.NeRFTP.encode

    def counting(self, *a, **kw):
        calls.append(1)
        return real_enc(self, *a, **kw)

    monkeypatch.setattr(neo_mod.NeRFTP, "encode", counting)
    cfg = preset("neo360", root_dir=root, img_wh=(16, 12), chunk=96)
    rf_cached = cli.make_render_fn(cfg, model, scene_cache=True)
    rf_plain = cli.make_render_fn(cfg, model)

    rf_cached(variables, s0a)
    n_first = len(calls)
    assert n_first >= 1
    out_b = rf_cached(variables, s0b)
    assert len(calls) == n_first, "same scene_key must not re-encode"
    rf_cached(variables, s1)
    assert len(calls) > n_first, "new scene_key must re-encode"
    out_plain = rf_plain(variables, s0b)
    np.testing.assert_array_equal(np.asarray(out_b["rgb"]),
                                  np.asarray(out_plain["rgb"]))


def test_build_optimizer_freeze_needs_params():
    cfg = preset("neo360", is_optimize=True)
    with pytest.raises(ValueError):
        cli.build_optimizer(cfg)


@pytest.mark.slow
def test_mip_train_frac_threaded():
    """The train step threads state.step into the mip loss so the proposal
    anneal (reference mipnerf360/model.py:433-437) is active — the loss must
    depend on the step."""
    import jax
    import jax.numpy as jnp
    from neo360_tpu.models.mipnerf360 import MipNeRF360
    from __graft_entry__ import _example_inputs

    cfg = preset("mipnerf360")
    model = MipNeRF360(num_prop_samples=4, num_nerf_samples=4,
                       nerf_netwidth=32, prop_netwidth=16, prop_netdepth=2)
    batch = {k: jnp.asarray(v)
             for k, v in _example_inputs(n_rays=8, hw=(24, 32)).items()}
    variables = cli._init_variables(cfg, model, batch)
    loss_fn = cli.make_loss_fn(cfg, model, variables)
    key = jax.random.PRNGKey(0)
    l0, _ = loss_fn(variables["params"], batch, key, jnp.int32(0))
    l1, _ = loss_fn(variables["params"], batch, key, jnp.int32(500_000))
    assert float(l0) != float(l1), "train_frac anneal has no effect"


def test_shard_staged_batch_and_rounding():
    import jax
    from neo360_tpu.parallel import sharding as sh

    mesh = sh.make_mesh()
    assert mesh.shape["data"] == jax.device_count() == 8
    batches = {
        "rays_o": np.zeros((4, 16, 3), np.float32),     # sharded on axis 1
        "src_imgs": np.zeros((4, 3, 8, 8, 3), np.float32),  # replicated
    }
    placed = sh.shard_staged_batch(batches, mesh)
    spec_rays = placed["rays_o"].sharding.spec
    assert tuple(spec_rays) == (None, "data")
    assert placed["src_imgs"].sharding.is_fully_replicated

    cfg = preset("neo360", ray_batch_size=500)
    cfg = cli._round_to_devices(cfg, "ray_batch_size", 8)
    assert cfg.ray_batch_size == 504


def test_render_trajectory_vanilla(micro_scene, tmp_path):
    """vis_only 360 flythrough: spiral poses -> rays -> video file."""
    from neo360_tpu.data.nerds360 import NeRDS360

    cfg = preset("vanilla", root_dir=micro_scene, img_wh=(16, 12))
    ds = NeRDS360(micro_scene, "test", (16, 12))
    calls = []

    def render_fn(sample):
        assert sample["rays_o"].shape == (16 * 12, 3)
        calls.append(1)
        return {"rgb": np.full((16 * 12, 3), 0.5, np.float32)}

    path = cli._render_trajectory(cfg, render_fn, ds, str(tmp_path),
                                  n_frames=4)
    assert os.path.exists(path) and len(calls) == 4


def test_render_trajectory_fewshot(multi_scene_root, tmp_path):
    from neo360_tpu.data.nerds360_ae import NeRDS360AE

    cfg = preset("neo360", root_dir=multi_scene_root, img_wh=(16, 12))
    ds = NeRDS360AE(multi_scene_root, "test", (16, 12), 3)
    seen = []

    def render_fn(sample):
        # spiral samples must carry the few-shot conditioning stack
        for k in ("src_imgs", "src_poses", "src_focal", "src_c", "radii"):
            assert k in sample, k
        seen.append(np.asarray(sample["rays_o"][0]))
        return {"rgb": np.full((16 * 12, 3), 0.25, np.float32)}

    path = cli._render_trajectory(cfg, render_fn, ds, str(tmp_path),
                                  n_frames=3)
    assert os.path.exists(path) and len(seen) == 3
    # the spiral actually moves the camera
    assert not np.allclose(seen[0], seen[1])


def test_num_src_views_from_render_name(tmp_path):
    """Reference parity: '5views...' render_name sets num_src_views=5 when
    the flag is absent (neo360/model.py:606-616); explicit flag wins."""
    base = ["--exp_type", "neo360", "--root_dir", str(tmp_path)]
    cfg = cli.parse_args(base + ["--render_name", "5views_lpips"])
    assert cfg.num_src_views == 5
    cfg = cli.parse_args(base)                       # default name "3views"
    assert cfg.num_src_views == 3
    cfg = cli.parse_args(base + ["--render_name", "5views",
                                 "--num_src_views", "3"])
    assert cfg.num_src_views == 3


def test_optimize_latents_use_restored_params(multi_scene_root):
    """Regression (round-4 self-review): the optimize latent cache must be
    built from the RESTORED train state, not the fresh init — optimize runs
    warm-start from trained checkpoints."""
    import jax
    import jax.numpy as jnp
    from neo360_tpu.data.nerds360_ae import NeRDS360AE
    from neo360_tpu.models.neo360 import NeRFTP
    from neo360_tpu.train import loop as tl

    ds = NeRDS360AE(multi_scene_root, "train", (40, 30), 3, 8,
                    optimize=True)
    model = NeRFTP(num_coarse_samples=4, num_fine_samples=4,
                   grid_size=(8, 8, 8), remat_encoder=False)
    src = ds.optimize_source_stack(0)
    rng = np.random.default_rng(0)
    sample = {k: jnp.asarray(v) for k, v in ds.sample_train(rng).items()}
    rays = {k: sample[k] for k in
            ("rays_o", "rays_d", "viewdirs", "src_imgs", "src_poses",
             "src_focal", "src_c")}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, True, False)
    # "restored" params: perturbed copy standing in for a trained checkpoint
    restored = jax.tree_util.tree_map(lambda x: x * 1.5,
                                      variables["params"])
    state = tl.TrainState(step=jnp.asarray(10), params=restored,
                          opt_state=None,
                          model_state=variables["batch_stats"])
    const = cli._optimize_latents(model, state, variables, ds)
    expect = model.apply({"params": restored,
                          "batch_stats": variables["batch_stats"]},
                         jnp.asarray(src["src_imgs"]),
                         method=NeRFTP.encode_images)
    np.testing.assert_array_equal(
        np.asarray(const["pixel_latents"][0]), np.asarray(expect))
    # and it must NOT equal the fresh-init latents (the round-4 bug)
    fresh = model.apply(variables, jnp.asarray(src["src_imgs"]),
                        method=NeRFTP.encode_images)
    assert not np.allclose(np.asarray(const["pixel_latents"][0]),
                           np.asarray(fresh))
