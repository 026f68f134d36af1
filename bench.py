"""Benchmark: NeO-360 training throughput (rays/sec/chip) on real hardware.

Workload = the reference's default generalizable-training step (SURVEY §6 /
BASELINE.md): 3 source views at 320x240, 500-ray batch, fg+bg x (128 coarse
+ 256 fine) samples, 64^3 tri-plane grid, MSE + distortion loss, full
forward+backward+adam update.

Baseline: the reference publishes no throughput numbers (BASELINE.md). We use
a documented estimate of the PyTorch reference on one A100: Lightning step
time ~0.3s at 500 rays => ~1,667 rays/s/GPU (BASELINE.md "north star" asks
for >= 5x at matched PSNR). vs_baseline reports our rays/s/chip over that
estimate; re-measure the reference if hardware becomes available.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REFERENCE_RAYS_PER_SEC_A100 = 1667.0  # documented estimate, see docstring


def _stamp(msg, _t0=[None]):
    import sys
    if _t0[0] is None:
        _t0[0] = time.time()
    print(f"[bench +{time.time() - _t0[0]:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    # Backend-init watchdog: a dead axon tunnel makes the first jax call
    # block forever inside PJRT client creation (observed 2026-08-21 after
    # a relay crash), which would surface as an undiagnosable rc=124. The
    # watchdog thread turns that into an explicit one-line failure.
    import os
    import sys
    import threading
    init_done = threading.Event()
    init_budget = float(os.environ.get("NEO360_BENCH_INIT_TIMEOUT", "300"))

    def _watchdog():
        if not init_done.wait(init_budget):
            print(json.dumps({
                "metric": "neo360_train_rays_per_sec_per_chip",
                "value": 0.0, "unit": "rays/s", "vs_baseline": 0.0,
                "error": f"TPU backend init exceeded {init_budget:.0f}s "
                         f"(axon tunnel down?)"}), flush=True)
            sys.stderr.flush()
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp
    import optax
    jax.devices()
    init_done.set()

    # Persistent compilation cache: the staged NeO-360 trainer is a large
    # program (remote compile can take minutes cold); warm runs load the
    # serialized executable instead.
    import os as _os
    cache_dir = _os.environ.get("NEO360_JAX_CACHE", "/root/repo/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    _stamp("start")

    from neo360_tpu.models.neo360 import NeRFTP, neo360_distortion_loss
    from neo360_tpu.ops import losses as L
    from neo360_tpu.train import loop as tl
    from __graft_entry__ import _example_inputs

    import os
    # reference uses 500 rays/step; default pads to the lane-friendly 512
    n_rays = int(os.environ.get("NEO360_BENCH_RAYS", "512"))
    batch = _example_inputs(n_rays=n_rays, hw=(240, 320), seed=0)
    # NEO360_BENCH_FIXTURE=1: draw the bench batch from a real NERDS360-
    # layout fixture scene instead of random poses on a sphere — identical
    # shapes/dtypes (same compiled program), but real camera ray geometry
    # (sphere-hit distribution, source-view frusta). Answers whether the
    # synthetic batch biases the throughput reading; BASELINE.md records
    # the A/B.
    if os.environ.get("NEO360_BENCH_FIXTURE", "0") == "1":
        import tempfile
        from neo360_tpu.data.fixtures import make_multi_scene_root
        from neo360_tpu.data.nerds360_ae import NeRDS360AE
        root = os.environ.get(
            "NEO360_BENCH_FIXROOT",
            os.path.join(tempfile.gettempdir(), "neo360_bench_fix_320"))
        marker = os.path.join(root, ".complete")
        if not os.path.exists(marker):
            make_multi_scene_root(root, n_scenes=1, wh=(320, 240))
            open(marker, "w").close()
        ds = NeRDS360AE(root, "train", (320, 240), 3, n_rays)
        fix = ds.sample_train(np.random.default_rng(0))
        batch = {k: jnp.asarray(fix[k]) if k in fix else v
                 for k, v in batch.items()}
        _stamp("fixture batch drawn (real ray geometry)")
    ray_keys = ("rays_o", "rays_d", "viewdirs", "src_imgs", "src_poses",
                "src_focal", "src_c")

    bf16 = os.environ.get("NEO360_BENCH_BF16", "1") != "0"
    # NEO360_BENCH_MODE=reference: the reference's exact sampling budget
    # (conditioned 128 coarse + merged 256 fine, fg+bg).
    # =proposal (default): the neo360_fast production preset (unconditioned
    # 64-sample PropMLP level + 64 conditioned fine samples) —
    # quality-validated against reference-mode sampling at EQUAL WALL CLOCK
    # on the fixture drive (BASELINE.md: 22.47 vs 22.97 PSNR, within noise).
    mode = os.environ.get("NEO360_BENCH_MODE", "proposal")
    remat = os.environ.get("NEO360_BENCH_REMAT", "0") != "0"
    # lift 128 = neo360_fast production default (quality-validated on the
    # fixture drive: 25.79 vs 23.87 val PSNR at matched steps vs the 512-ch
    # reference lift); NEO360_BENCH_LIFT=0 restores the reference lift.
    default_lift = "0" if mode == "reference" else "128"
    lift = int(os.environ.get("NEO360_BENCH_LIFT", default_lift)) or None
    # encoder width: quality-gated fast-preset knob (see NeRFTP.encoder_width
    # and BASELINE.md fixture A/Bs); reference mode keeps the reference 512.
    encw = int(os.environ.get(
        "NEO360_BENCH_ENCW", "512" if mode == "reference" else "512"))
    # pillar hidden width (NeRFTP.pillar_width); 0 = reference parity
    pillw = int(os.environ.get("NEO360_BENCH_PILLW", "0")) or None
    # tri-plane grid resolution (reference 64^3); quality-gated fast knob.
    # Accepts "gx,gy,gz". Proposal default = the ADOPTED anisotropic
    # (64,64,32): halving z costs no fixture PSNR (BASELINE.md 2026-08-18,
    # 26.59 vs 25.53 control) and halves grid points.
    default_grid = "64" if mode == "reference" else "64,64,32"
    g = [int(v) for v in os.environ.get(
        "NEO360_BENCH_GRID", default_grid).split(",")]
    grid = tuple(g * 3 if len(g) == 1 else g)
    # DepthPillarEncoder hidden layers (2 = reference parity)
    depthl = int(os.environ.get("NEO360_BENCH_DEPTHL", "2"))
    # tri-plane / local-latent widths (128/128 = reference parity)
    planed = int(os.environ.get("NEO360_BENCH_PLANED", "128"))
    locald = int(os.environ.get("NEO360_BENCH_LOCALD", "128"))
    # NEO360_BENCH_FINE: conditioned fine-sample count (quality-gated fast
    # knob; 60 = the adopted preset — fixture A/B 26.74 vs 25.39 control
    # at matched steps; 256 = reference parity)
    n_fine = int(os.environ.get(
        "NEO360_BENCH_FINE", "60" if mode == "proposal" else "256"))
    model = NeRFTP(compute_dtype=jnp.bfloat16 if bf16 else jnp.float32,
                   use_proposal=(mode == "proposal"),
                   num_prop_samples=64, remat_encoder=remat, lift_dim=lift,
                   encoder_width=encw, pillar_width=pillw,
                   grid_size=grid, depth_fc_layers=depthl,
                   plane_dim=planed, local_proj_dim=locald,
                   num_fine_samples=n_fine)
    rays = {k: batch[k] for k in ray_keys}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, True, False, train=False)
    _stamp("model.init done")
    opt = optax.chain(optax.clip_by_global_norm(0.05), optax.adam(5e-4))

    from neo360_tpu.models.neo360 import neo360_interlevel_loss

    def loss_fn(params, model_state, batch, key):
        rays = {k: batch[k] for k in ray_keys}
        out, new_state = model.apply(
            {"params": params, "batch_stats": model_state},
            rays, True, False, train=True, rngs={"sampling": key},
            mutable=["batch_stats"])
        l1 = L.img2mse(out[1]["rgb"], batch["target"])
        if mode == "proposal":
            loss = l1 + neo360_interlevel_loss(out) \
                + neo360_distortion_loss(out)
        else:
            loss = (L.img2mse(out[0]["rgb"], batch["target"]) + l1
                    + neo360_distortion_loss(out))
        return loss, ({"mse": l1}, new_state["batch_stats"])

    # NEO360_BENCH_PHASE=render: steady-state full-image render throughput
    # (the eval-protocol workload: one 320x240 view = 76,800 rays, encoder
    # run ONCE per scene, rays tiled by lax.map). The north-star render
    # target (99 views < 60 s, BASELINE.md) needs >=126,720 rays/s here.
    if os.environ.get("NEO360_BENCH_PHASE", "train") == "render":
        from neo360_tpu.train import loop as tl2
        h, w = 240, 320
        src = {k: batch[k] for k in ("src_imgs", "src_poses", "src_focal",
                                     "src_c")}
        variables_f = {"params": variables["params"],
                       "batch_stats": variables["batch_stats"]}
        encoded = model.apply(variables_f, src["src_imgs"],
                              src["src_poses"], src["src_focal"],
                              src["src_c"], method=NeRFTP.encode)

        # everything device-resident rides the `pack` argument: arrays closed
        # over by the chunk fn would be embedded as HLO constants (the
        # tri-plane tables alone are ~100 MB, which breaks remote compile)
        def render_chunk(pack, rays):
            rays = dict(rays, **pack["src"])
            out = model.apply(
                {"params": pack["params"], "batch_stats": pack["bs"]},
                rays, False, False, out_depth=True, encoded=pack["enc"])
            return {"rgb": out[1]["rgb"], "depth": out[1]["depth"]}

        # small tiles keep per-tile conditioned-point intermediates
        # (~tile x 65 x 3 points x 128ch) VMEM-resident instead of spilling
        # to HBM between fusions; the knee was re-measured at 256 on
        # 2026-08-20 (62.7k rays/s vs 37.8k at 512, BASELINE.md).
        chunk = int(os.environ.get("NEO360_BENCH_RENDER_CHUNK", "256"))
        renderer = tl2.make_image_renderer(render_chunk, chunk)
        pack = {"params": variables["params"],
                "bs": variables["batch_stats"], "enc": encoded, "src": src}
        full = _example_inputs(n_rays=h * w, hw=(h, w), seed=1)
        rays_full = {k: full[k] for k in ("rays_o", "rays_d", "viewdirs")}
        out = renderer(pack, rays_full)                      # compile
        float(out["rgb"][0, 0])
        t0 = time.time()
        n_imgs = int(os.environ.get("NEO360_BENCH_RENDER_IMGS", "3"))
        for _ in range(n_imgs):
            out = renderer(pack, rays_full)
        float(out["rgb"][0, 0])                              # host sync
        dt = (time.time() - t0) / n_imgs
        rays_per_sec = h * w / dt
        # reference render baseline: 1024-ray chunks re-encoding per chunk
        # (neo360/model.py:266-273,825-843) at ~0.3 s/chunk on A100 => ~22.5
        # s/image => ~3,413 rays/s (documented estimate, as for training)
        print(json.dumps({
            "metric": "neo360_render_rays_per_sec_per_chip",
            "value": round(float(rays_per_sec), 1),
            "unit": "rays/s",
            "vs_baseline": round(float(rays_per_sec) / 3413.0, 3),
            "sec_per_image": round(dt, 3),
        }))
        return

    # K distinct staged batches per dispatch; timing is synced by fetching
    # the final metric to the host (block_until_ready alone does not wait
    # for remote execution under the axon tunnel).
    # 64 steps/dispatch amortizes the ~50 ms axon relay dispatch overhead
    # (~1.2% at the adopted config); production uses prefetch-overlapped
    # dispatches of steps_per_call=100, so larger dispatches are the
    # honest approximation of the pipelined trainer.
    n_steps = int(os.environ.get("NEO360_BENCH_STEPS", "64"))
    rng = np.random.default_rng(1)
    batches = {
        k: jnp.stack([v + (rng.standard_normal(v.shape) * 1e-4
                           ).astype(np.float32)
                      if v.dtype == jnp.float32 else v
                      for _ in range(n_steps)])
        for k, v in batch.items()}

    # NEO360_BENCH_STAGE=K / NEO360_BENCH_SCENES=S: scene-stage (encode-once)
    # trainer — S scenes encoded once per K-step stage, every step mixing
    # rays from all S (train/loop.py make_scene_stage_trainer). DEFAULT is
    # the ADOPTED production shape K=32, S=2 (config.py neo360_fast):
    # quality-gated on the fixture drive at matched steps (round-3
    # BASELINE.md 6-view A/B — mean val PSNR 26.86 vs 25.39 per-step
    # control). STAGE=0 measures the reference-style per-step trainer.
    default_stage = "0" if mode == "reference" else "32"
    stage_k = int(os.environ.get("NEO360_BENCH_STAGE", default_stage))
    n_mix = int(os.environ.get("NEO360_BENCH_SCENES",
                               "2" if stage_k > 1 else "1"))
    key = jax.random.PRNGKey(7)
    if stage_k:
        from neo360_tpu.models.neo360 import SRC_KEYS, make_scene_stage_fns
        assert n_steps % stage_k == 0 and n_rays % n_mix == 0
        n_stages = n_steps // stage_k
        encode_fn, stage_loss = make_scene_stage_fns(model, mixed=n_mix > 1)
        enc_opt = optax.chain(optax.clip_by_global_norm(0.05),
                              optax.adam(5e-4))
        ray_opt = optax.chain(optax.clip_by_global_norm(0.05),
                              optax.adam(5e-4))
        # NEO360_BENCH_COT=bf16: bf16 cotangent accumulator (see
        # make_scene_stage_trainer docstring; quality-gated in BASELINE.md)
        cot = (jnp.bfloat16
               if os.environ.get("NEO360_BENCH_COT", "f32").startswith("bf")
               else jnp.float32)
        runner = tl.make_scene_stage_trainer(
            encode_fn, stage_loss, enc_opt, ray_opt, multi_stage=True,
            cot_dtype=cot)
        state = tl.create_scene_stage_state(
            variables["params"], enc_opt, ray_opt, variables["batch_stats"])
        if n_mix > 1:
            srcs = {k: jnp.stack([jnp.stack([batch[k]] * n_mix)] * n_stages)
                    for k in SRC_KEYS}
            rbs = {k: batches[k].reshape(
                       (n_stages, stage_k, n_mix, n_rays // n_mix)
                       + batch[k].shape[1:])
                   for k in ("rays_o", "rays_d", "viewdirs", "target")}
        else:
            srcs = {k: jnp.stack([batch[k]] * n_stages) for k in SRC_KEYS}
            rbs = {k: batches[k].reshape(
                       (n_stages, stage_k) + batch[k].shape)
                   for k in ("rays_o", "rays_d", "viewdirs", "target")}
        _stamp(f"compiling scene-stage trainer (K={stage_k})")
        state, m = runner(state, srcs, rbs, key)              # compile
        float(m["mse"])
        _stamp("scene-stage trainer compiled + warm dispatch done")
        t0 = time.time()
        state, m = runner(state, srcs, rbs, jax.random.fold_in(key, 1))
        float(m["mse"])                                        # host sync
        dt = time.time() - t0
        # NEO360_BENCH_PROFILE=<dir>: xplane-trace one dispatch and print
        # the per-op exclusive device-time table (scripts/profile_step.py)
        prof_dir = os.environ.get("NEO360_BENCH_PROFILE")
        if prof_dir:
            with jax.profiler.trace(prof_dir):
                state, m = runner(state, srcs, rbs,
                                  jax.random.fold_in(key, 2))
                float(m["mse"])
            import sys as _sys
            _sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "scripts"))
            from profile_step import summarize_xspace
            summarize_xspace(prof_dir, int(
                os.environ.get("NEO360_PROF_TOP", "40")))
    else:
        step = tl.make_train_step(loss_fn, opt, with_model_state=True)
        staged = tl.make_staged_trainer(step)
        state = tl.create_train_state(variables["params"], opt,
                                      variables["batch_stats"])
        _stamp("staged batches built; compiling staged trainer")
        state, m = staged(state, batches, key)      # compile
        float(m["mse"])
        _stamp("staged trainer compiled + warm step done")
        t0 = time.time()
        state, m = staged(state, batches, jax.random.fold_in(key, 1))
        float(m["mse"])                              # host sync
        dt = time.time() - t0

    rays_per_sec = n_steps * n_rays / dt
    print(json.dumps({
        "metric": "neo360_train_rays_per_sec_per_chip",
        "value": round(float(rays_per_sec), 1),
        "unit": "rays/s",
        "vs_baseline": round(float(rays_per_sec)
                             / REFERENCE_RAYS_PER_SEC_A100, 3),
    }))


if __name__ == "__main__":
    main()
