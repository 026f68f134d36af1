"""Acceptance runs for the two presets with no recorded quality numbers
(round-4 VERDICT item 4): MipNeRF-360 fixture overfit and PixelNeRF few-shot,
both through the production cli.run_train / cli.run_eval at FULL reference
widths (mip trunk 8x1024 — mipnerf360/model.py:177-183; pixelnerf 4x128 —
model_pixel.py:35-131).

Round-5 restructure (VERDICT weak #1): train and eval are SEPARATE phases
with separate queue budgets, so a timeout in one cannot erase the other's
result. Train writes its checkpoint + a rays/s ledger line to a PERSISTENT
dir; eval restores from that dir in its own process.

Usage (each line is its own queue entry with its own timeout):
  P=PYTHONPATH=/root/repo:/root/.axon_site
  $P python scripts/accept_mip_pixelnerf.py mip_train
  $P python scripts/accept_mip_pixelnerf.py mip_eval
  $P python scripts/accept_mip_pixelnerf.py pn_train
  $P python scripts/accept_mip_pixelnerf.py pn_eval

State dirs (override via env): MIP_ROOT/MIP_CKPTS, PN_ROOT/PN_CKPTS;
default persistent locations under /tmp/accept_state/.

Protocol mirrors scripts/accept_vanilla.py: synthetic micro-scene (320x240
for mip overfit; multi-scene for pixelnerf few-shot), train via cli.run_train,
evaluate via cli.run_eval full_eval, report test PSNR/SSIM + train rays/s.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STATE = os.environ.get("ACCEPT_STATE", "/tmp/accept_state")


def _mip_cfg():
    from neo360_tpu.config import preset
    from neo360_tpu.data.fixtures import make_micro_scene

    root = os.environ.get("MIP_ROOT") or os.path.join(STATE, "mip_root")
    if not os.path.exists(os.path.join(root, "train", "pose", "pose.json")):
        make_micro_scene(root, wh=(320, 240))
    ckpt_dir = os.environ.get("MIP_CKPTS") or os.path.join(STATE, "mip_ckpts")
    steps = int(os.environ.get("MIP_STEPS", "20000"))
    cfg = preset(
        "mipnerf360", root_dir=root, exp_name="accept", ckpt_dir=ckpt_dir,
        img_wh=(320, 240), batch_size=2048, run_max_steps=steps,
        steps_per_call=500, save_every_steps=max(1, steps // 3), chunk=4096)
    return cfg, steps


def _pn_cfg():
    from neo360_tpu.config import preset
    from neo360_tpu.data.fixtures import make_multi_scene_root

    n_scenes = int(os.environ.get("PN_SCENES", "3"))
    root = os.environ.get("PN_ROOT") or os.path.join(STATE, "pn_root")
    if not os.path.isdir(root) or not os.listdir(root):
        make_multi_scene_root(root, n_scenes=n_scenes, wh=(320, 240), n_val=3)
    ckpt_dir = os.environ.get("PN_CKPTS") or os.path.join(STATE, "pn_ckpts")
    steps = int(os.environ.get("PN_STEPS", "20000"))
    cfg = preset(
        "pixelnerf", root_dir=root, exp_name="accept", ckpt_dir=ckpt_dir,
        img_wh=(320, 240), ray_batch_size=512, run_max_steps=steps,
        steps_per_call=100, save_every_steps=max(1, steps // 3), chunk=1024,
        num_src_views=3, bf16=True)
    return cfg, steps


def _train(tag: str, cfg, steps: int, rays_per_step: int):
    from neo360_tpu import cli
    print(f"{tag} train: {steps} steps, {rays_per_step} rays/step ->"
          f" {cfg.ckpt_dir}", flush=True)
    t0 = time.time()
    cli.run_train(cfg)
    dt = time.time() - t0
    rays_s = steps * rays_per_step / dt
    ledger = {"tag": tag, "phase": "train", "steps": steps,
              "wall_s": round(dt, 1), "rays_s_incl_host": round(rays_s, 1)}
    os.makedirs(STATE, exist_ok=True)
    with open(os.path.join(STATE, f"{tag}_train.json"), "w") as f:
        json.dump(ledger, f)
    print(f"{tag.upper()} TRAIN: wall {dt:.0f}s = {rays_s:,.0f} rays/s "
          f"incl. host (ledger written)", flush=True)


def _eval(tag: str, cfg):
    from neo360_tpu import cli
    print(f"{tag} eval: full_eval from {cfg.ckpt_dir}", flush=True)
    t0 = time.time()
    summary = cli.run_eval(cfg.replace(eval_mode="full_eval"))
    dt = time.time() - t0
    ledger = {"tag": tag, "phase": "eval", "wall_s": round(dt, 1),
              "summary": {k: round(float(v), 4) for k, v in summary.items()}}
    os.makedirs(STATE, exist_ok=True)
    with open(os.path.join(STATE, f"{tag}_eval.json"), "w") as f:
        json.dump(ledger, f)
    print(f"{tag.upper()} ACCEPTANCE:", summary, f"(eval wall {dt:.0f}s)",
          flush=True)


def main(which: str):
    if which in ("mip", "mip_train", "mip_eval"):
        cfg, steps = _mip_cfg()
        if which != "mip_eval":
            _train("mip", cfg, steps, cfg.batch_size)
        if which != "mip_train":
            _eval("mip", cfg)
    elif which in ("pixelnerf", "pn", "pn_train", "pn_eval"):
        cfg, steps = _pn_cfg()
        if which != "pn_eval":
            _train("pn", cfg, steps, cfg.ray_batch_size)
        if which != "pn_train":
            _eval("pn", cfg)
    else:
        raise SystemExit(f"unknown phase {which!r}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "mip")
