"""Command-line runner — the reference's run.py/opt.py surface
(reference run.py:33-173) on top of the TPU-native stack.

Usage:
    python -m neo360_tpu.cli --exp_type neo360 --root_dir <scenes> ...
    python -m neo360_tpu.cli --exp_type vanilla --root_dir <scene> \
        --eval_mode full_eval --ckpt_path ckpts/exp/...

exp_type: vanilla | mipnerf360 | pixelnerf | neo360 (alias
triplanar_nocs_fusion_conv_scene). Training runs fit the reference's four
presets; eval renders held-out views, computes PSNR/SSIM/LPIPS(+object) and
writes image/depth/video artifacts + results.json.
"""

from __future__ import annotations

import argparse
import functools
import os
from typing import Dict

import numpy as np

from neo360_tpu.config import Config, EXP_ALIASES, preset

RAY_KEYS_FEWSHOT = ("rays_o", "rays_d", "viewdirs", "src_imgs", "src_poses",
                    "src_focal", "src_c")


def parse_args(argv=None) -> Config:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp_type", required=True)
    p.add_argument("--root_dir", required=True)
    p.add_argument("--exp_name", default="exp")
    p.add_argument("--img_wh", nargs=2, type=int, default=[320, 240])
    p.add_argument("--white_back", action="store_true")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--ray_batch_size", type=int, default=500)
    # render tile size: small tiles keep per-tile conditioned-point
    # intermediates VMEM-resident; knee re-measured at 256 on v5e
    # (62.7k vs 37.8k rays/s at 512, BASELINE.md 2026-08-20). The
    # reference's --chunk default was 1024 (opt.py:195-200)
    p.add_argument("--chunk", type=int, default=256)
    p.add_argument("--num_src_views", type=int, default=None)
    p.add_argument("--run_max_steps", type=int, default=100000)
    p.add_argument("--lr_init", type=float, default=None)
    p.add_argument("--eval_mode", choices=["full_eval", "vis_only"],
                   default=None)
    p.add_argument("--render_name", default="3views")
    p.add_argument("--is_optimize", action="store_true")
    p.add_argument("--finetune_lpips", action="store_true")
    p.add_argument("--ckpt_dir", default="ckpts")
    p.add_argument("--ckpt_path", default=None)
    p.add_argument("--lpips_weights", default=None)
    p.add_argument("--resnet_weights", default=None)
    p.add_argument("--val_every_steps", type=int, default=5000)
    p.add_argument("--save_every_steps", type=int, default=5000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute in encoders/MLPs (params stay f32)")
    p.add_argument("--stage_k", type=int, default=None,
                   help="scene-stage trainer: steps per encode-once stage "
                        "(0/1 = per-step encoding)")
    p.add_argument("--stage_scenes", type=int, default=None,
                   help="scenes mixed per stage (requires stage_k > 1)")
    p.add_argument("--stage_warmup_steps", type=int, default=None,
                   help="per-step-encode steps before the first stage")
    p.add_argument("--eval_bn_mode", choices=["batch", "running"],
                   default=None,
                   help="few-shot eval encode BatchNorm statistics: 'batch' "
                        "= re-derive from the source stack (default, +1.3-"
                        "3.8 dB on fixtures); 'running' = the trained "
                        "running averages (the reference's torch .eval() "
                        "protocol — use for reference-comparable numbers)")
    a = p.parse_args(argv)

    # reference parity: the source-view count rides the render_name's
    # leading digit ("3views..."/"5views..."; neo360/model.py:606-616) when
    # --num_src_views is not given explicitly.
    if a.num_src_views is None and a.render_name[:1].isdigit():
        a.num_src_views = int(a.render_name[0])

    overrides = {k: v for k, v in vars(a).items()
                 if v is not None and k not in ("exp_type", "batch_size",
                                                "lr_init", "img_wh")}
    cfg = preset(a.exp_type, **overrides)
    cfg = cfg.replace(img_wh=tuple(a.img_wh))
    if a.batch_size is not None:
        cfg = cfg.replace(batch_size=a.batch_size)
    if a.lr_init is not None:
        cfg = cfg.replace(lr_init=a.lr_init)
    return cfg


# ---------------------------------------------------------------------------
# model / data builders
# ---------------------------------------------------------------------------

def build_model(cfg: Config):
    import jax.numpy as jnp
    dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
    # model-size overrides (capacity studies / tiny dryruns); None = the
    # reference constructor defaults
    size = {k: v for k, v in (
        ("num_coarse_samples", cfg.num_coarse_samples),
        ("num_fine_samples", cfg.num_fine_samples)) if v is not None}
    if cfg.exp_type == "vanilla":
        from neo360_tpu.models.vanilla import VanillaNeRF
        return VanillaNeRF(**size)
    if cfg.exp_type == "mipnerf360":
        from neo360_tpu.models.mipnerf360 import MipNeRF360
        return MipNeRF360(compute_dtype=dtype)
    if cfg.exp_type == "pixelnerf":
        from neo360_tpu.models.pixelnerf import PixelNeRF
        return PixelNeRF(num_src_views=cfg.num_src_views,
                         compute_dtype=dtype, **size)
    if cfg.exp_type == "neo360":
        from neo360_tpu.models.neo360 import NeRFTP
        if cfg.grid_size is not None:
            size["grid_size"] = tuple(cfg.grid_size)
        if cfg.remat_encoder is not None:
            size["remat_encoder"] = cfg.remat_encoder
        return NeRFTP(num_src_views=cfg.num_src_views, compute_dtype=dtype,
                      **size)
    if cfg.exp_type == "neo360_fast":
        from neo360_tpu.models.neo360 import NeRFTP
        # grid (64,64,32): quality-gated anisotropic cut — halving the z
        # axis of the 64^3 reference grid costs no held-out PSNR on the
        # fixture A/B (outdoor scenes are height-thin; BASELINE.md
        # 2026-08-18) and halves encoder gather/scatter/MLP work.
        return NeRFTP(num_src_views=cfg.num_src_views, compute_dtype=dtype,
                      use_proposal=True, num_prop_samples=64,
                      num_fine_samples=cfg.num_fine_samples or 64,
                      lift_dim=cfg.lift_dim,
                      grid_size=tuple(cfg.grid_size or (64, 64, 32)))
    raise ValueError(cfg.exp_type)


def build_optimizer(cfg: Config, params=None):
    """Optimizer for the run mode.

    Normal training: Adam on the warmup-sin x log-lerp schedule. Optimize /
    finetune-lpips runs (reference neo360/model.py:957-981, run.py:93-97):
    constant lr 5e-6 AND the SpatialEncoder subtree frozen — pass `params`
    so the frozen partition can be labeled (optax.multi_transform with
    set_to_zero); without `params` the freeze cannot be applied and these
    modes raise rather than silently training the encoder.
    """
    import optax
    from neo360_tpu.train.schedules import nerf_schedule
    freeze = cfg.is_optimize or cfg.finetune_lpips
    if freeze:
        sched = 5.0e-6     # pinned (reference neo360/model.py:959-963)
    else:
        sched = nerf_schedule(cfg.lr_init, cfg.lr_final, cfg.run_max_steps,
                              cfg.lr_delay_steps, cfg.lr_delay_mult)
    tx = optax.adam(sched)
    if cfg.grad_max_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_max_norm), tx)
    if freeze:
        if params is None:
            raise ValueError(
                "optimize/finetune modes need `params` to freeze the "
                "SpatialEncoder partition")
        import jax

        def label(path, _):
            keys = [getattr(p, "key", str(p)) for p in path]
            return "frozen" if "spatial_encoder" in keys else "train"

        labels = jax.tree_util.tree_map_with_path(label, params)
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, labels)
    return tx


def _maybe_load_resnet(cfg: Config, variables):
    """Splice converted torchvision ResNet34 weights into the encoder."""
    from neo360_tpu.nn.resnet import load_pretrained
    pretrained = load_pretrained(cfg.resnet_weights)
    if pretrained is None:
        return variables
    import flax
    flat = flax.traverse_util.flatten_dict(variables)
    pre_p = flax.traverse_util.flatten_dict(
        {"params": pretrained["params"]})
    pre_s = flax.traverse_util.flatten_dict(
        {"batch_stats": pretrained["batch_stats"]})
    n = 0
    for key in list(flat.keys()):
        if "backbone" in key:
            idx = key.index("backbone")
            sub = (key[0],) + key[idx + 1:]
            src = pre_p if key[0] == "params" else pre_s
            if sub in src and src[sub].shape == flat[key].shape:
                flat[key] = src[sub]
                n += 1
    print(f"loaded {n} pretrained ResNet34 arrays")
    return flax.traverse_util.unflatten_dict(flat)


# ---------------------------------------------------------------------------
# loss functions per experiment
# ---------------------------------------------------------------------------

def make_loss_fn(cfg: Config, model, variables, lpips_model=None):
    import jax.numpy as jnp
    from neo360_tpu.ops import losses as L

    if cfg.exp_type == "vanilla":
        def loss_fn(params, batch, key):
            rays = {k: batch[k] for k in ("rays_o", "rays_d", "viewdirs")}
            out = model.apply({"params": params}, rays, True,
                              cfg.white_back, 0.2, 3.0,
                              rngs={"sampling": key})
            l0 = L.img2mse(out[0]["rgb"], batch["target"])
            l1 = L.img2mse(out[1]["rgb"], batch["target"])
            return l0 + l1, {"mse": l1, "psnr": L.mse2psnr(l1)}
        return loss_fn

    if cfg.exp_type == "mipnerf360":
        from neo360_tpu.models.mipnerf360 import (distortion_loss,
                                                  interlevel_loss)

        def loss_fn(params, batch, key, step):
            # train_frac anneals the proposal logits over training
            # (reference mipnerf360/model.py:433-437: step / 1e6)
            train_frac = jnp.clip(step.astype(jnp.float32) / 1.0e6, 0.0, 1.0)
            rays = {k: batch[k] for k in ("rays_o", "rays_d", "viewdirs",
                                          "radii")}
            rend, hist = model.apply(
                {"params": params}, rays, train_frac, True, 0.2, 3.0,
                rngs={"sampling": key})
            mse = L.img2mse(rend[-1]["rgb"], batch["target"])
            loss = (jnp.sqrt(mse + 1e-6) + interlevel_loss(hist)
                    + 0.01 * distortion_loss(hist))
            return loss, {"mse": mse, "psnr": L.mse2psnr(mse)}
        return loss_fn

    if cfg.exp_type == "pixelnerf":
        # freeze_encoder: finetune/optimize modes keep BN in inference mode
        # (reference neo360/model.py:957-981)
        train_bn = not (cfg.is_optimize or cfg.finetune_lpips)

        def loss_fn(params, model_state, batch, key):
            rays = {k: batch[k] for k in RAY_KEYS_FEWSHOT}
            out, new_state = model.apply(
                {"params": params, "batch_stats": model_state},
                rays, True, cfg.white_back, 0.02, 3.0, train=train_bn,
                rngs={"sampling": key}, mutable=["batch_stats"])
            l0 = L.img2mse(out[0]["rgb"], batch["target"])
            l1 = L.img2mse(out[1]["rgb"], batch["target"])
            return l0 + l1, ({"mse": l1, "psnr": L.mse2psnr(l1)},
                             new_state.get("batch_stats", model_state))
        return loss_fn

    if cfg.exp_type in ("neo360", "neo360_fast"):
        from neo360_tpu.models.neo360 import (neo360_distortion_loss,
                                              neo360_interlevel_loss)
        train_bn = not (cfg.is_optimize or cfg.finetune_lpips)
        proposal = cfg.exp_type == "neo360_fast"

        def loss_fn(params, model_state, batch, key):
            rays = {k: batch[k] for k in RAY_KEYS_FEWSHOT}
            # optimize mode: the spatial encoder is frozen with BN eval
            # (reference neo360/model.py:957-981), so its per-scene output
            # is a run-constant — run_train caches it ("pixel_latents",
            # one row per scene) and the ResNet fwd+bwd drops out of the
            # step. The GridEncoder trunk still trains, exactly as in the
            # reference.
            pl = None
            if "pixel_latents" in batch:
                pl = batch["pixel_latents"][batch["scene_idx"]]
            out, new_state = model.apply(
                {"params": params, "batch_stats": model_state},
                rays, True, cfg.white_back, train=train_bn,
                pixel_latent=pl,
                rngs={"sampling": key}, mutable=["batch_stats"])
            l1 = L.img2mse(out[1]["rgb"], batch["target"])
            if proposal:
                # prop level renders no rgb: MSE on fine + histogram bound
                loss = l1 + neo360_interlevel_loss(out) \
                    + neo360_distortion_loss(out)
            else:
                l0 = L.img2mse(out[0]["rgb"], batch["target"])
                loss = l0 + l1 + neo360_distortion_loss(out)
            if cfg.finetune_lpips and lpips_model is not None \
                    and lpips_model.pretrained:
                n = batch["target"].shape[0]
                side = int(np.sqrt(n))
                assert side * side == n, (
                    f"LPIPS patch loss needs a square ray batch "
                    f"(patch_size**2), got {n} rays")
                pred = jnp.clip(out[1]["rgb"], 0, 1).reshape(
                    1, side, side, 3)
                gt = jnp.clip(batch["target"], 0, 1).reshape(
                    1, side, side, 3)
                loss = loss + 0.3 * jnp.mean(lpips_model(pred, gt))
            return loss, ({"mse": l1, "psnr": L.mse2psnr(l1)},
                          new_state.get("batch_stats", model_state))
        return loss_fn

    raise ValueError(cfg.exp_type)


# ---------------------------------------------------------------------------
# renderers (encode-once, tiled)
# ---------------------------------------------------------------------------

def _scene_pack_cache(build_pack, mesh=None):
    """Per-scene encode cache for eval-time render_fns.

    Few-shot source stacks are FIXED per scene (reference
    nerds360_ae.py:780-811), so the encoded latents are scene-constants —
    but the reference re-encodes them for every 1024-ray chunk of every
    view (neo360/model.py:831-836), and our pre-cache render_fn re-encoded
    eagerly once per view. Eager encoder dispatch through the axon relay
    measured ~2 s/view — the dominant term of the 99-view eval gap
    (BASELINE.md round-5 probe). Samples carrying a "scene_key" reuse the
    previous pack until the key changes; one scene stays resident at a
    time (scenes iterate sequentially in run_eval, and a 75-scene protocol
    must not accumulate 75 scenes' latents in HBM).

    Only valid while `variables` is fixed between calls — run_eval's
    situation. run_train's val path re-renders with fresh params each call
    and must NOT enable this."""
    cache = {}

    def get_pack(variables, sample):
        key = sample.get("scene_key")
        if key is not None and key in cache:
            return cache[key]
        pack = build_pack(variables, sample)
        if mesh is not None:
            # replicate the pack across the mesh ONCE per scene: a
            # non-replicated pack makes every sharded renderer call pay an
            # n-way host broadcast of the encoded tables (measured on the
            # 8-virtual-device mesh, scripts/mesh_render_scaling.py)
            from neo360_tpu.parallel.sharding import replicate_tree
            pack = replicate_tree(pack, mesh)
        if key is not None:
            cache.clear()
            cache[key] = pack
        return pack

    return get_pack


def make_render_fn(cfg: Config, model, mesh=None, scene_cache=False):
    """Returns render_fn(variables, sample) -> {"rgb","depth"} for full
    images. `variables` rides through as a jit ARGUMENT (never a closure
    constant), so ONE compiled renderer serves every validation/scene of a
    run — the reference likewise compiles nothing per val
    (neo360/model.py:822-907).

    With a `mesh`, every ray tile is sharded over the mesh's "data" axis
    (train/loop.py make_image_renderer): all chips render slices of the tile
    concurrently — the replacement for the reference's eval-time Lightning
    all_gather (interface.py:30-50).

    `scene_cache=True` (run_eval only — requires fixed variables) reuses
    the encoded per-scene latents across every view whose sample carries
    the same "scene_key" (_scene_pack_cache)."""
    import jax
    import jax.numpy as jnp
    from neo360_tpu.train.loop import make_image_renderer

    if cfg.exp_type in ("vanilla", "mipnerf360"):
        near, far = 0.2, 3.0

        def render_chunk(params, rays):
            if cfg.exp_type == "vanilla":
                out = model.apply({"params": params}, rays, False,
                                  cfg.white_back, near, far)
                return {"rgb": out[1]["rgb"], "depth": out[1]["depth"],
                        "acc": out[1]["acc"]}
            rend, _ = model.apply({"params": params}, rays, 1.0, False,
                                  near, far)
            out = {"rgb": rend[-1]["rgb"], "depth": rend[-1]["depth"]}
            if "acc" in rend[-1]:
                out["acc"] = rend[-1]["acc"]
            return out

        renderer = make_image_renderer(render_chunk, cfg.chunk, mesh=mesh)
        keys = (("rays_o", "rays_d", "viewdirs") if cfg.exp_type == "vanilla"
                else ("rays_o", "rays_d", "viewdirs", "radii"))

        def render_fn(variables, sample):
            rays = {k: jnp.asarray(sample[k]) for k in keys}
            return renderer(variables["params"], rays)
        return render_fn

    # few-shot models: encode once per scene, then tile rays
    # Few-shot models: encode once per scene, then tile rays. The per-scene
    # products (encoded latents, source views) ride the renderer's `pack`
    # argument rather than the chunk-fn closure: closed-over arrays would be
    # embedded as HLO constants (re-jit per scene + ~100 MB program uploads);
    # as arguments, ONE compiled renderer serves every scene.
    if cfg.exp_type == "pixelnerf":
        from neo360_tpu.models.pixelnerf import PixelNeRF

        def render_chunk(pack, rays):
            rays = dict(rays, **pack["src"])
            out = model.apply(
                {"params": pack["params"], "batch_stats": pack["bs"]},
                rays, False, cfg.white_back, 0.02, 3.0,
                latent=pack["enc"])
            return {"rgb": out[1]["rgb"], "depth": out[1]["depth"]}

        renderer = make_image_renderer(render_chunk, cfg.chunk, mesh=mesh)

        def build_pack(variables, sample):
            src = {k: jnp.asarray(sample[k]) for k in
                   ("src_imgs", "src_poses", "src_focal", "src_c")}
            if cfg.eval_bn_mode == "batch":
                latent, _ = model.apply(variables, src["src_imgs"], True,
                                        method=PixelNeRF.encode,
                                        mutable=["batch_stats"])
            else:
                latent = model.apply(variables, src["src_imgs"],
                                     method=PixelNeRF.encode)
            return {"params": variables["params"],
                    "bs": variables["batch_stats"], "enc": latent,
                    "src": src}

        get_pack = (_scene_pack_cache(build_pack) if scene_cache
                    else build_pack)

        def render_fn(variables, sample):
            rays = {k: jnp.asarray(sample[k]) for k in
                    ("rays_o", "rays_d", "viewdirs")}
            return renderer(get_pack(variables, sample), rays)
        return render_fn

    if cfg.exp_type in ("neo360", "neo360_fast"):
        from neo360_tpu.models.neo360 import NeRFTP

        def render_chunk(pack, rays):
            rays = dict(rays, **pack["src"])
            out = model.apply(
                {"params": pack["params"], "batch_stats": pack["bs"]},
                rays, False, cfg.white_back, out_depth=True,
                encoded=pack["enc"])
            # fg/bg decomposition tiles ride along for the val grids
            # (reference neo360/model.py:939-942, train_helper.py:246-272)
            return {"rgb": out[1]["rgb"], "depth": out[1]["depth"],
                    "fg_rgb": out[1]["fg_rgb"], "bg_rgb": out[1]["bg_rgb"],
                    "fg_acc": out[1]["fg_acc"], "bg_acc": out[1]["bg_acc"]}

        renderer = make_image_renderer(render_chunk, cfg.chunk, mesh=mesh)

        def build_pack(variables, sample):
            src = {k: jnp.asarray(sample[k]) for k in
                   ("src_imgs", "src_poses", "src_focal", "src_c")}
            if cfg.eval_bn_mode == "batch":
                # BN statistics from the source stack itself (config.py
                # eval_bn_mode): +3.8 dB mean val PSNR over running stats
                # on the fixture A/B; the mutated stats are discarded.
                encoded, _ = model.apply(
                    variables, src["src_imgs"], src["src_poses"],
                    src["src_focal"], src["src_c"], True,
                    method=NeRFTP.encode, mutable=["batch_stats"])
            else:
                encoded = model.apply(
                    variables, src["src_imgs"], src["src_poses"],
                    src["src_focal"], src["src_c"], method=NeRFTP.encode)
            return {"params": variables["params"],
                    "bs": variables["batch_stats"], "enc": encoded,
                    "src": src}

        get_pack = (_scene_pack_cache(build_pack) if scene_cache
                    else build_pack)

        def render_fn(variables, sample):
            rays = {k: jnp.asarray(sample[k]) for k in
                    ("rays_o", "rays_d", "viewdirs")}
            return renderer(get_pack(variables, sample), rays)
        return render_fn

    raise ValueError(cfg.exp_type)


# ---------------------------------------------------------------------------
# train / eval drivers
# ---------------------------------------------------------------------------

def _make_mesh_if_multichip():
    """1-D {"data": n} mesh over all local devices when more than one is
    present — the production analogue of the reference's `num_gpus>1` DDP
    switch (run.py:114,134,154). Returns None on a single chip."""
    import jax
    if jax.device_count() <= 1:
        return None
    from neo360_tpu.parallel import sharding as sh
    mesh = sh.make_mesh()
    print(f"data-parallel mesh over {jax.device_count()} devices")
    return mesh


def _round_to_devices(cfg: Config, field: str, n_dev: int) -> Config:
    """Round a batch-size field up to a multiple of the data-axis size so
    ray batches shard evenly (the reference's 500-ray batches would leave
    4 stray rays on 8 chips)."""
    value = getattr(cfg, field)
    if value % n_dev:
        rounded = -(-value // n_dev) * n_dev
        print(f"{field} {value} -> {rounded} (multiple of {n_dev} devices)")
        cfg = cfg.replace(**{field: rounded})
    return cfg


def _init_variables(cfg: Config, model, example_batch):
    import jax
    rngs = {"params": jax.random.PRNGKey(cfg.seed),
            "sampling": jax.random.PRNGKey(cfg.seed + 1)}
    if cfg.exp_type == "vanilla":
        rays = {k: example_batch[k] for k in ("rays_o", "rays_d", "viewdirs")}
        return model.init(rngs, rays, True, cfg.white_back, 0.2, 3.0)
    if cfg.exp_type == "mipnerf360":
        rays = {k: example_batch[k] for k in ("rays_o", "rays_d", "viewdirs",
                                              "radii")}
        return model.init(rngs, rays, 0.0, True, 0.2, 3.0)
    rays = {k: example_batch[k] for k in RAY_KEYS_FEWSHOT}
    if cfg.exp_type == "pixelnerf":
        return model.init(rngs, rays, True, cfg.white_back, 0.02, 3.0)
    return model.init(rngs, rays, True, cfg.white_back)


def _maybe_resume(ckpt, state):
    """Resume from the latest checkpoint in this experiment dir, if any
    (the reference's resume_from_checkpoint wiring, run.py:84-102)."""
    import jax
    latest = ckpt.latest_step()
    if latest is None:
        return state, 0
    try:
        restored = ckpt.restore(jax.device_get(state))
    except Exception as e:
        # surface the orbax error first — a corrupt checkpoint or IO error
        # lands here too; the layout mismatch is only the most common cause
        raise ValueError(
            f"failed to restore checkpoint at step {latest}: "
            f"{type(e).__name__}: {e}\n"
            f"If the error is a tree-structure mismatch, the likely cause "
            f"is a trainer-layout change — resuming a per-step run with "
            f"--stage_k (or vice versa) is not supported; start a fresh "
            f"exp_name or keep the original trainer flags.") from e
    print(f"resumed from checkpoint step {latest}")
    return restored, int(latest)


def _optimize_latents(model, state, variables, train_ds):
    """Optimize-mode frozen-prefix cache: per-scene SpatialEncoder pixel
    latents from the CURRENT (post-resume) train state — optimize runs
    warm-start from trained checkpoints, and a cache built from fresh-init
    params would silently condition every step on wrong latents. Returns
    the staged trainer's const dict {"pixel_latents": (S, NV, h, w, C)}."""
    import jax
    import jax.numpy as jnp
    from neo360_tpu.models.neo360 import NeRFTP
    lat_fn = jax.jit(lambda v, imgs: model.apply(
        v, imgs, False, method=NeRFTP.encode_images))
    enc_vars = {"params": state.params,
                "batch_stats": (state.model_state
                                if state.model_state is not None
                                else variables["batch_stats"])}
    lats = [lat_fn(enc_vars, jnp.asarray(
                train_ds.optimize_source_stack(s)["src_imgs"]))
            for s in range(len(train_ds.scene_ids))]
    print(f"optimize mode: cached frozen spatial-encoder latents for "
          f"{len(lats)} scene(s); ResNet fwd+bwd dropped from the step")
    return {"pixel_latents": jnp.stack(lats)}


def run_train(cfg: Config):
    import jax
    import jax.numpy as jnp
    from neo360_tpu.train import loop as tl
    from neo360_tpu.train.checkpoints import CheckpointManager
    from neo360_tpu.train.logging import MetricsLogger
    from neo360_tpu.train.metrics import psnr as psnr_metric

    exp_dir = os.path.join(cfg.ckpt_dir, cfg.exp_name)
    logger = MetricsLogger(exp_dir)
    ckpt = CheckpointManager(os.path.join(exp_dir, "orbax"),
                             keep_all=cfg.is_optimize)
    lpips_model = None
    if cfg.finetune_lpips or cfg.lpips_weights:
        from neo360_tpu.nn.lpips import LPIPSModel
        lpips_model = LPIPSModel(cfg.lpips_weights)
    if cfg.finetune_lpips and not (lpips_model and lpips_model.pretrained):
        # stage 2 (reference run.py:93-97) IS the LPIPS loss — training
        # without the weights would silently run stage 1 at a pinned 5e-6 lr
        raise ValueError(
            "--finetune_lpips requires pretrained LPIPS weights: pass "
            "--lpips_weights <npz> (see scripts/convert_weights.py)")

    model = build_model(cfg)
    mesh = _make_mesh_if_multichip()

    if cfg.exp_type in ("vanilla", "mipnerf360"):
        from neo360_tpu.data.nerds360 import NeRDS360
        if mesh is not None:
            cfg = _round_to_devices(cfg, "batch_size", mesh.devices.size)
        train_ds = NeRDS360(cfg.root_dir, "train", cfg.img_wh,
                            cfg.white_back)
        val_ds = NeRDS360(cfg.root_dir, "val", cfg.img_wh, cfg.white_back)
        buffers = train_ds.ray_buffers()
        example = {k: v[:4] for k, v in buffers.items()}
        variables = _init_variables(cfg, model, example)
        optimizer = build_optimizer(cfg, variables["params"])
        loss_fn = make_loss_fn(cfg, model, variables)
        step_fn = tl.make_train_step(loss_fn, optimizer,
                                     with_step=cfg.exp_type == "mipnerf360")
        state = tl.create_train_state(variables["params"], optimizer)
        state, start_step = _maybe_resume(ckpt, state)
        if mesh is not None:
            from neo360_tpu.parallel import sharding as sh
            state = sh.replicate_tree(state, mesh)
            buffers = sh.replicate_tree(
                {k: jnp.asarray(v) for k, v in buffers.items()}, mesh)
        runner = tl.make_buffer_trainer(step_fn, cfg.batch_size,
                                        cfg.steps_per_call, mesh=mesh)
        # built ONCE per run: params ride the renderer's jit arguments, so
        # every validation reuses the same compiled renderer
        render_fn = make_render_fn(cfg, model, mesh=mesh)
        key = jax.random.PRNGKey(cfg.seed + 2)
        step = start_step
        while step < cfg.run_max_steps:
            key = jax.random.fold_in(key, step)
            state, m = runner(state, buffers, key)
            step += cfg.steps_per_call
            logger.log(step, {k: float(v) for k, v in m.items()})
            if step % cfg.save_every_steps < cfg.steps_per_call:
                variables = dict(variables, params=state.params)
                sample = val_ds.image_rays(0)
                out = render_fn(variables, sample)
                w, h = cfg.img_wh
                val_psnr = float(psnr_metric(
                    out["rgb"].reshape(h, w, 3),
                    jnp.asarray(sample["target"]).reshape(h, w, 3)))
                logger.log(step, {"val_psnr": val_psnr})
                from neo360_tpu.utils.visualize import build_val_grid
                logger.log_image(step, "val_grid", build_val_grid(
                    cfg.img_wh,
                    np.asarray(sample["target"]).reshape(h, w, 3),
                    {k: np.asarray(v) for k, v in out.items()}))
                ckpt.save(step, jax.device_get(state),
                          {"val_psnr": val_psnr})
        ckpt.wait()
        return state

    # few-shot experiments
    from neo360_tpu.data.nerds360_ae import NeRDS360AE
    from neo360_tpu.train.pipeline import prefetch_to_device, train_iterator
    if mesh is not None:
        cfg = _round_to_devices(cfg, "ray_batch_size", mesh.devices.size)
    train_ds = NeRDS360AE(
        cfg.root_dir, "train", cfg.img_wh, cfg.num_src_views,
        cfg.ray_batch_size, optimize=cfg.is_optimize,
        finetune_lpips=cfg.finetune_lpips)
    val_ds = NeRDS360AE(cfg.root_dir, "val", cfg.img_wh, cfg.num_src_views)
    rng = np.random.default_rng(cfg.seed)
    example = {k: jnp.asarray(v)
               for k, v in train_ds.sample_train(rng).items()}
    variables = _init_variables(cfg, model, example)
    variables = _maybe_load_resnet(cfg, variables)
    variables = _maybe_warm_start(cfg, variables)
    optimizer = build_optimizer(cfg, variables["params"])
    loss_fn = make_loss_fn(cfg, model, variables, lpips_model)
    stage_size = max(1, min(cfg.steps_per_call, cfg.save_every_steps,
                            cfg.run_max_steps))
    # scene-stage (encode-once) trainer: the TPU-first production path for
    # generalizable NeO-360 training (train/loop.py make_scene_stage_trainer)
    # — the encoder runs once per stage_k steps instead of the reference's
    # per-step re-encode (neo360/model.py:266-273). Not used for optimize/
    # finetune (encoder frozen there — per-step encoding is already cheap
    # relative to the pinned-lr fine-tune protocol).
    use_stage = (cfg.stage_k > 1
                 and cfg.exp_type in ("neo360", "neo360_fast")
                 and not (cfg.is_optimize or cfg.finetune_lpips))
    warm_steps = 0
    if use_stage:
        import jax.numpy as _jnp
        from neo360_tpu.models.neo360 import (SRC_KEYS,
                                              make_scene_stage_fns)
        if cfg.ray_batch_size % cfg.stage_scenes:
            raise ValueError(
                f"ray_batch_size {cfg.ray_batch_size} must divide by "
                f"stage_scenes {cfg.stage_scenes}")
        if cfg.stage_warmup_steps > 0 and ckpt.latest_step() is None:
            # hybrid schedule: fresh per-step encoder gradients through the
            # staleness-sensitive early phase (quality A/B, BASELINE.md),
            # then encode-once stages. Resumed runs skip straight to stages
            # (their checkpoints carry the stage-state layout).
            warm_steps, variables = _run_warmup(
                cfg, model, variables, optimizer, loss_fn, train_ds, mesh,
                logger)
        stage_size = max(cfg.stage_k,
                         stage_size - stage_size % cfg.stage_k)
        n_stages = stage_size // cfg.stage_k
        encode_fn, stage_loss = make_scene_stage_fns(
            model, white_bkgd=cfg.white_back,
            mixed=cfg.stage_scenes > 1)
        # Encoder optimizer: base lr, NO x stage_k scaling. The stage's
        # accumulated mean cotangent is a LOWER-noise gradient than any
        # single step's, and Adam's per-update travel is ~lr regardless —
        # the enc-lr x K "travel matching" rule measured 11.3 val PSNR vs
        # 23.0 at x1 on the K=16 S=2 fixture A/B (BASELINE.md round 3).
        enc_optimizer = build_optimizer(cfg)
        runner = tl.make_scene_stage_trainer(
            encode_fn, stage_loss, enc_optimizer, optimizer,
            multi_stage=True,
            cot_dtype=_jnp.dtype(cfg.stage_cot_dtype))
        state = tl.create_scene_stage_state(
            variables["params"], enc_optimizer, optimizer,
            variables["batch_stats"])
        if warm_steps:
            state = state.replace(step=_jnp.asarray(warm_steps, _jnp.int32))
    else:
        step_fn = tl.make_train_step(loss_fn, optimizer,
                                     with_model_state=True)
        staged = tl.make_staged_trainer(step_fn)
        state = tl.create_train_state(variables["params"], optimizer,
                                      variables["batch_stats"])

    state, start_step = _maybe_resume(ckpt, state)
    start_step = max(start_step, warm_steps)
    # optimize mode (neo360*): the spatial encoder is frozen with BN eval
    # and the source stacks are FIXED per scene (reference
    # neo360/model.py:957-981, nerds360_ae.py:542-556), so its pixel
    # latents are run-constants — encode each scene ONCE here and drop the
    # ResNet fwd+bwd from every step. The GridEncoder trunk (depth_fc,
    # pillars, floorplan convs) still trains per step, exactly as in the
    # reference. finetune_lpips draws RANDOM source views per sample, so
    # no caching is possible there. MUST run AFTER _maybe_resume: optimize
    # runs typically warm-start from a trained checkpoint, and the cache
    # has to come from the RESTORED encoder params, not the fresh init.
    opt_const = None
    if cfg.is_optimize and cfg.exp_type in ("neo360", "neo360_fast") \
            and os.environ.get("NEO360_OPT_NO_CACHE", "0") != "1":
        # NEO360_OPT_NO_CACHE=1 restores per-step encoding (A/B lever for
        # scripts/optimize_speedup.py; numerically identical either way)
        opt_const = _optimize_latents(model, state, variables, train_ds)
    place_fn = None
    if mesh is not None:
        from neo360_tpu.parallel import sharding as sh
        state = sh.replicate_tree(state, mesh)
        if opt_const is not None:
            opt_const = sh.replicate_tree(opt_const, mesh)
        if use_stage:
            ray_axis = 3 if cfg.stage_scenes > 1 else 2

            def place_fn(item):
                srcs, rbs = item
                return (sh.replicate_tree(srcs, mesh),
                        sh.shard_stage_batch(rbs, mesh, ray_axis))
        else:
            # staged (K, B, ...) batches sharded on the per-step ray axis;
            # the scan in make_staged_trainer then runs each step
            # data-parallel
            place_fn = functools.partial(sh.shard_staged_batch, mesh=mesh)

    ray_keys_stage = ("rays_o", "rays_d", "viewdirs", "target")

    def staged_iterator():
        rng = np.random.default_rng(cfg.seed)
        keys = RAY_KEYS_FEWSHOT + ("target",)
        if opt_const is not None:
            # per-step scene id indexes the cached per-scene latents
            keys = keys + ("scene_idx",)
        while True:
            if use_stage:
                stages = [train_ds.sample_train_stage(
                              rng, cfg.stage_k, n_scenes=cfg.stage_scenes)
                          for _ in range(n_stages)]
                yield (tl.stack_batches(stages, SRC_KEYS),
                       tl.stack_batches(stages, ray_keys_stage))
            else:
                samples = [train_ds.sample_train(rng)
                           for _ in range(stage_size)]
                yield tl.stack_batches(samples, keys)

    # built ONCE per run (params/batch_stats flow through the pack argument)
    render_fn = make_render_fn(cfg, model, mesh=mesh)
    key = jax.random.PRNGKey(cfg.seed + 2)
    it = prefetch_to_device(staged_iterator(), size=2, place_fn=place_fn)
    step = start_step
    for i, batches in enumerate(it):
        if step >= cfg.run_max_steps:
            it.close()
            break
        k_i = jax.random.fold_in(key, i)
        if use_stage:
            state, m = runner(state, batches[0], batches[1], k_i)
        else:
            state, m = staged(state, batches, k_i, opt_const)
        step += stage_size
        if step % cfg.log_every_steps < stage_size:
            logger.log(step, {k: float(v) for k, v in m.items()})
        if step > 0 and step % cfg.save_every_steps < stage_size:
            variables = {"params": state.params,
                         "batch_stats": state.model_state}
            sample_v = val_ds.sample_val(0)
            out = render_fn(variables, sample_v)
            w, h = cfg.img_wh
            from neo360_tpu.train.metrics import psnr as _psnr
            val_psnr = float(_psnr(
                out["rgb"].reshape(h, w, 3),
                jnp.asarray(sample_v["target"]).reshape(h, w, 3)))
            logger.log(step, {"val_psnr": val_psnr})
            from neo360_tpu.utils.visualize import build_val_grid
            logger.log_image(step, "val_grid", build_val_grid(
                cfg.img_wh,
                np.asarray(sample_v["target"]).reshape(h, w, 3),
                {k: np.asarray(v) for k, v in out.items()}))
            ckpt.save(step, jax.device_get(state), {"val_psnr": val_psnr})
    ckpt.wait()
    return state


def _run_warmup(cfg: Config, model, variables, optimizer, loss_fn, train_ds,
                mesh, logger):
    """Per-step-encode warmup before scene-stage training (hybrid schedule).

    Runs ceil(stage_warmup_steps / steps_per_call) staged dispatches of the
    plain per-step trainer and returns (steps_done, warmed variables). The
    stage trainer then starts from these params/batch_stats; its enc/ray
    Adam moments start fresh at the switch (negligible at production step
    counts, and the fixture quality A/B is run through this same path)."""
    import jax
    from neo360_tpu.train import loop as tl

    per = max(1, min(cfg.steps_per_call, cfg.stage_warmup_steps))
    n_calls = -(-cfg.stage_warmup_steps // per)
    step_fn = tl.make_train_step(loss_fn, optimizer, with_model_state=True)
    staged = tl.make_staged_trainer(step_fn)
    state = tl.create_train_state(variables["params"], optimizer,
                                  variables["batch_stats"])
    if mesh is not None:
        from neo360_tpu.parallel import sharding as sh
        state = sh.replicate_tree(state, mesh)
    rng = np.random.default_rng(cfg.seed + 7)
    keys = RAY_KEYS_FEWSHOT + ("target",)
    key = jax.random.PRNGKey(cfg.seed + 9)
    step = 0
    for i in range(n_calls):
        samples = [train_ds.sample_train(rng) for _ in range(per)]
        batches = tl.stack_batches(samples, keys)
        if mesh is not None:
            from neo360_tpu.parallel import sharding as sh
            batches = sh.shard_staged_batch(batches, mesh)
        state, m = staged(state, batches, jax.random.fold_in(key, i))
        step += per
        logger.log(step, {k: float(v) for k, v in m.items()})
    print(f"stage warmup: {step} per-step-encode steps done")
    return step, {"params": state.params, "batch_stats": state.model_state}


def run_eval(cfg: Config):
    import jax
    from neo360_tpu.train import eval as ev
    from neo360_tpu.train.checkpoints import CheckpointManager
    from neo360_tpu.train.loop import TrainState

    model = build_model(cfg)
    mesh = _make_mesh_if_multichip()
    exp_dir = os.path.join(cfg.ckpt_dir, cfg.exp_name)

    lpips_model = None
    if cfg.lpips_weights:
        from neo360_tpu.nn.lpips import LPIPSModel
        lpips_model = LPIPSModel(cfg.lpips_weights)

    if cfg.exp_type in ("vanilla", "mipnerf360"):
        from neo360_tpu.data.nerds360 import NeRDS360
        test_ds = NeRDS360(cfg.root_dir, "test", cfg.img_wh, cfg.white_back)
        example = {k: v for k, v in test_ds.image_rays(0).items()}
        variables = _init_variables(
            cfg, model, {k: v[:4] for k, v in example.items()
                         if k != "instance_mask"})
        optimizer = build_optimizer(cfg, variables["params"])
        state = _restore(cfg, exp_dir, variables, optimizer)
        variables = dict(variables, params=state.params)
        render_fn = functools.partial(
            make_render_fn(cfg, model, mesh=mesh), variables)
        samples = (test_ds.image_rays(i) for i in range(test_ds.num_images))
    else:
        from neo360_tpu.data.nerds360_ae import NeRDS360AE
        test_ds = NeRDS360AE(cfg.root_dir, "test", cfg.img_wh,
                             cfg.num_src_views)
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        # init on a FEW rays, not the full image: sample_test returns one
        # ray per pixel, and a W*H-ray init forward OOMs HBM at production
        # resolution (320x240 measured 26.8 G of conditioned-point gathers
        # on v5e); per-view src_* entries stay whole for encoder init
        ray_like = ("rays_o", "rays_d", "viewdirs", "radii", "target",
                    "nocs_2d", "instance_mask")
        example = {k: jnp.asarray(v[:4] if k in ray_like else v)
                   for k, v in test_ds.sample_test(0, 0).items()
                   if k != "img_wh"}
        variables = _init_variables(cfg, model, example)
        optimizer = build_optimizer(cfg, variables["params"])
        state = _restore(cfg, exp_dir, variables, optimizer)
        variables = {"params": state.params,
                     "batch_stats": state.model_state
                     if state.model_state is not None
                     else variables.get("batch_stats")}
        # scene_cache: variables are fixed for the whole eval, so each
        # scene's encoded latents are computed ONCE and reused for all of
        # its views ("scene_key" below) — the eager per-view re-encode was
        # ~2 s/view through the relay, the dominant term of the eval gap
        render_fn = functools.partial(
            make_render_fn(cfg, model, mesh=mesh, scene_cache=True),
            variables)
        # per-scene view count: scenes may have heterogeneous test splits
        # (the reference iterates the dataset length, nerds360_ae.py:501-511)
        samples = (dict(test_ds.sample_test(s, d), scene_key=s)
                   for s in range(len(test_ds.scene_ids))
                   for d in range(len(
                       test_ds.scene_meta(test_ds.scene_ids[s]).c2w_test)))

    if cfg.exp_type in ("pixelnerf", "neo360", "neo360_fast"):
        # reference-comparable numbers need --eval_bn_mode running (the
        # torch .eval() protocol); "batch" measures +1.3-3.8 dB on fixtures
        print(f"eval encode BN mode: {cfg.eval_bn_mode}")
    out_dir = os.path.join(exp_dir, cfg.render_name)
    # host-side sample prefetch: per-view ray-gen + target decode run on a
    # worker thread, overlapping the previous view's device render
    # (place_fn=identity — arrays go to device inside render_fn)
    from neo360_tpu.train.pipeline import prefetch_to_device
    samples = prefetch_to_device(samples, size=2, place_fn=lambda x: x)
    with samples:
        extra = {}
        if cfg.exp_type in ("pixelnerf", "neo360", "neo360_fast"):
            # stamp the BN protocol into the artifact: "running" is the
            # reference's torch .eval() protocol; "batch" (default) measures
            # +1.3-3.8 dB on fixtures and is NOT reference-comparable
            extra["eval_bn_mode"] = cfg.eval_bn_mode
        summary = ev.evaluate_and_save(
            render_fn, samples, cfg.img_wh, out_dir, lpips_model,
            results_json=os.path.join(exp_dir, "results.json"),
            video=(cfg.eval_mode == "vis_only"), extra=extra)
    if cfg.eval_mode == "vis_only":
        path = _render_trajectory(cfg, render_fn, test_ds, out_dir)
        print("wrote 360 flythrough:", path)
    print("eval summary:", summary)
    return summary


def _render_trajectory(cfg: Config, render_fn, test_ds, out_dir: str,
                       n_frames: int = 40) -> str:
    """vis_only extra: render a 360-degree spiral flythrough around the first
    test pose and store it as video360 (reference spiral poses
    nerds360.py:264-269 + store_video models/utils.py:55-59)."""
    from neo360_tpu.train.eval import trajectory_360
    from neo360_tpu.utils import io
    w, h = cfg.img_wh
    if cfg.exp_type in ("vanilla", "mipnerf360"):
        base = np.asarray(test_ds.c2w[0])
        samples = (test_ds.pose_rays(p)
                   for p in trajectory_360(base, n_frames))
    else:
        meta = test_ds.scene_meta(test_ds.scene_ids[0])
        base = (meta.c2w_test[0] if len(meta.c2w_test)
                else meta.c2w_train[0])
        # sample_pose uses the same test-source stack as sample_test, so
        # scene 0's cached pack serves every spiral frame
        samples = (dict(test_ds.sample_pose(0, p), scene_key=0)
                   for p in trajectory_360(base, n_frames))
    frames = [np.asarray(render_fn(s)["rgb"], np.float32).reshape(h, w, 3)
              for s in samples]
    return io.store_video(out_dir, frames, name="video360.mp4")


def _maybe_warm_start(cfg: Config, variables):
    """Weights-only warm start for run_train from ANOTHER run's checkpoint
    (reference finetune resume, run.py:84-102, and --weight_path semantics,
    opt.py:230-242): when --ckpt_path points at an orbax dir, splice its
    params/batch_stats into the fresh init — from EITHER trainer layout
    (the LPIPS finetune stage warm-starts from a STAGE-trained stage-1
    checkpoint this way; optimizer state and step start fresh, matching the
    reference's pinned-lr stage-2 protocol)."""
    if not cfg.ckpt_path:
        return variables
    from neo360_tpu.train.checkpoints import CheckpointManager
    raw = CheckpointManager(cfg.ckpt_path).restore_raw()
    if raw is None:
        raise FileNotFoundError(
            f"--ckpt_path {cfg.ckpt_path}: no checkpoint found for "
            f"warm start")
    if "enc_params" in raw:         # scene-stage trainer layout
        params = {**raw["enc_params"], **raw["ray_params"]}
    else:
        params = raw["params"]
    out = dict(variables, params=params)
    if raw.get("model_state") is not None:
        out["batch_stats"] = raw["model_state"]
    print(f"warm-started params/batch_stats from {cfg.ckpt_path} "
          f"(step {int(raw['step'])})")
    return out


def _restore(cfg: Config, exp_dir: str, variables, optimizer):
    """Load params/batch_stats for eval from EITHER trainer's checkpoint
    layout: plain TrainState or the scene-stage enc/ray split (whose merged
    `params` view this reconstitutes). Raw (template-free) restore keeps the
    eval path independent of how the run was trained."""
    from neo360_tpu.train import loop as tl
    from neo360_tpu.train.checkpoints import CheckpointManager
    ckpt = CheckpointManager(
        cfg.ckpt_path or os.path.join(exp_dir, "orbax"))
    template = tl.create_train_state(variables["params"], optimizer,
                                     variables.get("batch_stats"))
    raw = ckpt.restore_raw()
    if raw is None:
        print("WARNING: no checkpoint found; evaluating random init")
        return template
    if "enc_params" in raw:         # scene-stage trainer layout
        params = {**raw["enc_params"], **raw["ray_params"]}
    else:
        params = raw["params"]
    return tl.TrainState(step=raw["step"], params=params, opt_state=None,
                         model_state=raw.get("model_state"))


def main(argv=None):
    cfg = parse_args(argv)
    if cfg.eval_mode is not None:
        return run_eval(cfg)
    return run_train(cfg)


if __name__ == "__main__":
    main()
