"""Verify drive: NeO-360 few-shot training + render on the real TPU.

Builds fixture scenes, trains the generalizable model briefly (staged
trainer), renders a held-out view from 3 source views, reports PSNR and
rays/s, saves GT|pred side-by-side. Healthy: loss falls steadily, render is
a recognizable blob scene (not gray fog), PSNR rises well above the ~11-13
gray-fog floor within a few hundred steps.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/drive_neo360.py
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from neo360_tpu.data.fixtures import make_multi_scene_root
from neo360_tpu.data.nerds360_ae import NeRDS360AE
from neo360_tpu.models.neo360 import NeRFTP, neo360_distortion_loss
from neo360_tpu.ops import losses as L
from neo360_tpu.train import loop as tl
from neo360_tpu.train.metrics import psnr as psnr_fn
from neo360_tpu.utils.io import to8b

RAY_KEYS = ("rays_o", "rays_d", "viewdirs", "src_imgs", "src_poses",
            "src_focal", "src_c")


def main():
    print("devices:", jax.devices())
    # NEO360_DRIVE_FIXTURE_SCENES: fixture scene count (scene-mixed stages
    # draw NEO360_DRIVE_SCENES distinct scenes per stage, so need >= that)
    n_fix = int(os.environ.get("NEO360_DRIVE_FIXTURE_SCENES", "2"))
    # NEO360_DRIVE_SEED: seeds init + data sampling + train keys (fixture
    # scenes stay fixed so every seed shares the same val protocol). Keys
    # are data, not compile constants — all seeds share compiled programs.
    seed = int(os.environ.get("NEO360_DRIVE_SEED", "0"))
    root = make_multi_scene_root(tempfile.mkdtemp(prefix="neo360_drive_"),
                                 n_scenes=n_fix, wh=(64, 48))
    # NEO360_DRIVE_RAYS: large-batch A/B (LR scaled ~sqrt of batch ratio)
    n_rays = int(os.environ.get("NEO360_DRIVE_RAYS", "512"))
    ds = NeRDS360AE(root, split="train", img_wh=(64, 48),
                    ray_batch_size=n_rays, dest_views_per_sample=8)

    proposal = os.environ.get("NEO360_DRIVE_PROPOSAL", "0") == "1"
    lift = int(os.environ.get("NEO360_DRIVE_LIFT", "0")) or None
    encw = int(os.environ.get("NEO360_DRIVE_ENCW", "512"))
    pillw = int(os.environ.get("NEO360_DRIVE_PILLW", "0")) or None
    # fixture analogue of the 64^3 production grid is 32^3; NEO360_DRIVE_GRID
    # scales it for grid-resolution quality A/Bs (24 ~ production 48).
    # Accepts "gx,gy,gz" for anisotropic grids (e.g. "32,32,16").
    grid_s = os.environ.get("NEO360_DRIVE_GRID", "32")
    g = [int(v) for v in grid_s.split(",")]
    grid = tuple(g * 3 if len(g) == 1 else g)
    depthl = int(os.environ.get("NEO360_DRIVE_DEPTHL", "2"))
    planed = int(os.environ.get("NEO360_DRIVE_PLANED", "128"))
    locald = int(os.environ.get("NEO360_DRIVE_LOCALD", "128"))
    # NEO360_DRIVE_FINE: fixture fine-sample count (48 ~ production 64;
    # sample-budget quality A/Bs scale it by the same ratio)
    n_fine = int(os.environ.get("NEO360_DRIVE_FINE", "48"))
    model = NeRFTP(num_coarse_samples=32, num_fine_samples=n_fine,
                   grid_size=grid, compute_dtype=jnp.bfloat16,
                   use_proposal=proposal, num_prop_samples=32,
                   lift_dim=lift, encoder_width=encw, pillar_width=pillw,
                   depth_fc_layers=depthl, plane_dim=planed,
                   local_proj_dim=locald)
    print("proposal mode:", proposal)

    rng = np.random.default_rng(seed)
    s0 = {k: jnp.asarray(v) for k, v in ds.sample_train(rng).items()}
    rays0 = {k: s0[k] for k in RAY_KEYS}
    variables = model.init(
        {"params": jax.random.PRNGKey(seed),
         "sampling": jax.random.PRNGKey(seed + 1)},
        rays0, True, False, train=False)
    lr = 1e-3 * float(np.sqrt(n_rays / 512.0))
    opt = optax.chain(optax.clip_by_global_norm(0.05), optax.adam(lr))
    state = tl.create_train_state(variables["params"], opt,
                                  variables["batch_stats"])

    def loss_fn(params, model_state, batch, key):
        rays = {k: batch[k] for k in RAY_KEYS}
        out, new_state = model.apply(
            {"params": params, "batch_stats": model_state},
            rays, True, False, train=True, rngs={"sampling": key},
            mutable=["batch_stats"])
        l1 = L.img2mse(out[1]["rgb"], batch["target"])
        if proposal:
            from neo360_tpu.models.neo360 import neo360_interlevel_loss
            loss = (l1 + neo360_interlevel_loss(out)
                    + neo360_distortion_loss(out))
        else:
            l0 = L.img2mse(out[0]["rgb"], batch["target"])
            loss = l0 + l1 + neo360_distortion_loss(out)
        return loss, ({"mse": l1}, new_state["batch_stats"])

    # NEO360_DRIVE_STAGE=K: scene-stage (encode-once) trainer A/B — the
    # encoder runs once per K consecutive steps on one scene
    # (train/loop.py make_scene_stage_trainer). 0 = reference per-step
    # encoding via the plain staged trainer.
    stage_k = int(os.environ.get("NEO360_DRIVE_STAGE", "0"))
    k_steps = max(16, stage_k)          # steps per dispatch
    n_dispatch = int(os.environ.get("NEO360_DRIVE_DISPATCHES", "30"))
    key = jax.random.PRNGKey(7 + 1000 * seed)
    tot_t = 0.0
    n_timed = 0        # dispatches actually counted into tot_t

    # NEO360_DRIVE_SCENES=S (>1): SCENE-MIXED stages — S scenes encoded once
    # per stage, each step's rays drawn from all S scenes (fixes the
    # same-scene block-correlation quality loss: K=8 single-scene stages
    # measured 15.4 val PSNR vs 26.6 control).
    n_mix = int(os.environ.get("NEO360_DRIVE_SCENES", "1"))
    if stage_k:
        from neo360_tpu.models.neo360 import SRC_KEYS, make_scene_stage_fns
        assert k_steps % stage_k == 0, "steps/dispatch must split into stages"
        n_stages = k_steps // stage_k
        encode_fn, stage_loss = make_scene_stage_fns(model, mixed=n_mix > 1)
        # Enc lr scale 1 is the production setting: the stage's accumulated
        # mean cotangent is a LOWER-noise gradient, and the round-3 sweep
        # showed the old x stage_k "travel matching" rule destabilizes
        # training monotonically (BASELINE.md: 11.3 val PSNR at x16 vs 23.0
        # at x1, K=16 S=2).
        enc_lr = lr * float(os.environ.get("NEO360_DRIVE_ENC_LR_SCALE", "1"))
        # inject_hyperparams: the enc lr rides the optimizer STATE (a traced
        # array), so every scale in a sweep shares ONE compiled trainer
        # (baked-constant lrs forced a ~20 min remote recompile per value)
        enc_opt = optax.chain(optax.clip_by_global_norm(0.05),
                              optax.inject_hyperparams(optax.adam)(
                                  learning_rate=enc_lr))
        ray_opt = optax.chain(optax.clip_by_global_norm(0.05),
                              optax.adam(lr))
        cot = (jnp.bfloat16
               if os.environ.get("NEO360_DRIVE_COT", "f32").startswith("bf")
               else jnp.float32)
        run_stages = tl.make_scene_stage_trainer(
            encode_fn, stage_loss, enc_opt, ray_opt, multi_stage=True,
            cot_dtype=cot)

        # NEO360_DRIVE_STAGE_WARMUP=W: hybrid schedule — W per-step-encode
        # steps first (fresh encoder gradients through the staleness-
        # sensitive early phase), then encode-once stages for the rest.
        # Total steps stay n_dispatch*16; enc/ray Adam moments restart at
        # the switch (documented, negligible at these step counts).
        warmup = int(os.environ.get("NEO360_DRIVE_STAGE_WARMUP", "0"))
        n_warm = warmup // k_steps
        if n_warm:
            step_fn = tl.make_train_step(loss_fn, opt, with_model_state=True)
            staged_w = tl.make_staged_trainer(step_fn)
            wstate = tl.create_train_state(variables["params"], opt,
                                           variables["batch_stats"])
            for d in range(n_warm):
                batches = [ds.sample_train(rng) for _ in range(k_steps)]
                stacked = {k: jnp.stack([jnp.asarray(b[k]) for b in batches])
                           for k in batches[0]}
                t0 = time.time()
                wstate, m = staged_w(wstate, stacked,
                                     jax.random.fold_in(key, 1000 + d))
                mse = float(m["mse"])
                dt = time.time() - t0
                if d > 0:
                    tot_t += dt
                    n_timed += 1
                print(f"warmup   {d:02d}  step {int(wstate.step):4d}  "
                      f"mse {mse:.4f}  psnr {-10*np.log10(mse):5.2f}  "
                      f"{dt:6.2f}s", flush=True)
            variables = {"params": wstate.params,
                         "batch_stats": wstate.model_state}

        sstate = tl.create_scene_stage_state(
            variables["params"], enc_opt, ray_opt, variables["batch_stats"])
        sstate = sstate.replace(step=jnp.asarray(n_warm * k_steps, jnp.int32))
        ray_ks = ("rays_o", "rays_d", "viewdirs", "target")
        for d in range(n_warm, n_dispatch):
            stages = [ds.sample_train_stage(rng, stage_k, n_scenes=n_mix)
                      for _ in range(n_stages)]
            srcs = {k: jnp.stack([jnp.asarray(s[k]) for s in stages])
                    for k in SRC_KEYS}
            rbs = {k: jnp.stack([jnp.asarray(s[k]) for s in stages])
                   for k in ray_ks}
            t0 = time.time()
            sstate, m = run_stages(sstate, srcs, rbs,
                                   jax.random.fold_in(key, d))
            mse = float(m["mse"])
            dt = time.time() - t0
            if d > n_warm:      # first stage dispatch includes the compile
                tot_t += dt
                n_timed += 1
            print(f"dispatch {d:02d}  step {int(sstate.step):4d}  "
                  f"mse {mse:.4f}  psnr {-10*np.log10(mse):5.2f}  "
                  f"{dt:6.2f}s", flush=True)
        state = tl.TrainState(step=sstate.step, params=sstate.params,
                              opt_state=None,
                              model_state=sstate.model_state)
    else:
        step = tl.make_train_step(loss_fn, opt, with_model_state=True)
        staged = tl.make_staged_trainer(step)
        for d in range(n_dispatch):
            batches = [ds.sample_train(rng) for _ in range(k_steps)]
            stacked = {k: jnp.stack([jnp.asarray(b[k]) for b in batches])
                       for k in batches[0]}
            t0 = time.time()
            state, m = staged(state, stacked, jax.random.fold_in(key, d))
            mse = float(m["mse"])
            dt = time.time() - t0
            if d > 0:
                tot_t += dt
                n_timed += 1
            print(f"dispatch {d:02d}  step {int(state.step):4d}  "
                  f"mse {mse:.4f}  psnr {-10*np.log10(mse):5.2f}  "
                  f"{dt:6.2f}s", flush=True)

    # numerator = dispatches actually timed (with a warmup phase, BOTH the
    # first warmup and the first stage dispatch are compile-excluded)
    rays_s = n_timed * k_steps * n_rays / tot_t
    print(f"train throughput (post-compile): {rays_s:,.0f} rays/s")

    # ---- render ALL held-out tail views of every scene (encode once per
    # scene, tile rays). A single val view measured +-4 dB run-to-run noise
    # in the round-3 stage A/Bs; the gate below averages n_scenes x tail
    # views, in BOTH BN eval modes (running stats vs train-mode batch stats
    # — the scene-stage trainer updates running stats K-fold less often).
    def render_chunk(pack, rays):
        # device arrays ride the pack argument (closure constants would be
        # embedded into the HLO and re-jit per scene — see cli.make_render_fn)
        rays = dict(rays, **pack["src"])
        out = model.apply({"params": pack["params"],
                           "batch_stats": pack["bs"]},
                          rays, False, False, out_depth=True,
                          encoded=pack["enc"])
        return {"rgb": out[1]["rgb"], "depth": out[1]["depth"]}

    renderer = tl.make_image_renderer(render_chunk, 256)
    vars_now = {"params": state.params, "batch_stats": state.model_state}
    psnrs_run, psnrs_bat = [], []
    pred = gt = None
    t0 = time.time()
    n_views = 0
    for s_idx in range(n_fix):
        val0 = ds.sample_val(s_idx, dest_offset=0)
        src = {k: jnp.asarray(val0[k]) for k in
               ("src_imgs", "src_poses", "src_focal", "src_c")}
        enc_run = model.apply(vars_now, src["src_imgs"], src["src_poses"],
                              src["src_focal"], src["src_c"],
                              method=NeRFTP.encode)
        (pt_b, lt_b, _), _ = model.apply(
            vars_now, src["src_imgs"], src["src_poses"], src["src_focal"],
            src["src_c"], True, method=NeRFTP.encode,
            mutable=["batch_stats"])
        enc_bat = (pt_b, lt_b, enc_run[2])
        n_tail = len(ds.scene_meta(ds.scene_ids[s_idx]).c2w_val_tail)
        for d_off in range(n_tail):
            val = val0 if d_off == 0 else ds.sample_val(s_idx,
                                                        dest_offset=d_off)
            rays = {k: jnp.asarray(val[k])
                    for k in ("rays_o", "rays_d", "viewdirs")}
            w, h = val["img_wh"]
            gt = np.asarray(val["target"], np.float32).reshape(h, w, 3)
            for enc, acc in ((enc_run, psnrs_run), (enc_bat, psnrs_bat)):
                pack = {"params": state.params, "bs": state.model_state,
                        "enc": enc, "src": src}
                rgb = np.asarray(renderer(pack, rays)["rgb"], np.float32)
                pred = np.clip(rgb.reshape(h, w, 3), 0, 1)
                acc.append(float(psnr_fn(jnp.asarray(pred),
                                         jnp.asarray(gt))))
            n_views += 1
    dt = time.time() - t0
    val_run = float(np.mean(psnrs_run))
    val_bat = float(np.mean(psnrs_bat))
    print(f"render {n_views} held-out views ({dt:.1f}s): "
          f"val PSNR {val_run:.2f} (running stats) / "
          f"{val_bat:.2f} (batch stats)")
    print("per-view (running):",
          " ".join(f"{p:.2f}" for p in psnrs_run))
    val_psnr = max(val_run, val_bat)

    side = np.concatenate([to8b(gt), to8b(pred)], axis=1)
    try:
        import cv2
        name = ("/tmp/neo360_drive_prop.png" if proposal
                else "/tmp/neo360_drive.png")
        cv2.imwrite(name, side[..., ::-1])
        print("saved", name)
    except Exception as e:  # pragma: no cover
        print("imwrite failed:", e)

    ok = val_psnr > 16.0
    print("VERDICT:", "PASS" if ok else "FAIL (psnr too low — gray fog?)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
