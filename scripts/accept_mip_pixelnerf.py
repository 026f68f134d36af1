"""Acceptance runs for the two presets with no recorded quality numbers
(round-4 VERDICT item 4): MipNeRF-360 fixture overfit and PixelNeRF few-shot,
both through the production cli.run_train / cli.run_eval at FULL reference
widths (mip trunk 8x1024 — mipnerf360/model.py:177-183; pixelnerf 4x128 —
model_pixel.py:35-131).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/accept_mip_pixelnerf.py mip
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/accept_mip_pixelnerf.py pixelnerf

Protocol mirrors scripts/accept_vanilla.py: synthetic micro-scene (320x240
for mip overfit; multi-scene for pixelnerf few-shot), train via cli.run_train,
evaluate via cli.run_eval full_eval, report test PSNR/SSIM + train rays/s.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def accept_mip():
    import jax
    from neo360_tpu import cli
    from neo360_tpu.config import preset
    from neo360_tpu.data.fixtures import make_micro_scene

    root = os.environ.get("MIP_ROOT") or make_micro_scene(
        tempfile.mkdtemp(prefix="mip_accept_"), wh=(320, 240))
    steps = int(os.environ.get("MIP_STEPS", "30000"))
    ckpt_dir = tempfile.mkdtemp(prefix="mip_ckpts_")
    cfg = preset(
        "mipnerf360", root_dir=root, exp_name="accept", ckpt_dir=ckpt_dir,
        img_wh=(320, 240), batch_size=2048, run_max_steps=steps,
        steps_per_call=500, save_every_steps=max(1, steps // 3), chunk=4096)
    print(f"mip overfit: {steps} steps, batch 2048, full widths "
          f"(8x1024 nerf + 4x256 prop), 320x240")
    t0 = time.time()
    cli.run_train(cfg)
    dt = time.time() - t0
    rays_s = steps * cfg.batch_size / dt
    print(f"train wall clock {dt:.0f}s = {rays_s:,.0f} rays/s incl. host")
    summary = cli.run_eval(cfg.replace(eval_mode="full_eval"))
    print("MIP ACCEPTANCE:", summary, f"train {rays_s:,.0f} rays/s")


def accept_pixelnerf():
    import jax
    from neo360_tpu import cli
    from neo360_tpu.config import preset
    from neo360_tpu.data.fixtures import make_multi_scene_root

    n_scenes = int(os.environ.get("PN_SCENES", "3"))
    root = os.environ.get("PN_ROOT") or make_multi_scene_root(
        tempfile.mkdtemp(prefix="pn_accept_"), n_scenes=n_scenes,
        wh=(320, 240), n_val=3)
    steps = int(os.environ.get("PN_STEPS", "20000"))
    ckpt_dir = tempfile.mkdtemp(prefix="pn_ckpts_")
    cfg = preset(
        "pixelnerf", root_dir=root, exp_name="accept", ckpt_dir=ckpt_dir,
        img_wh=(320, 240), ray_batch_size=512, run_max_steps=steps,
        steps_per_call=100, save_every_steps=max(1, steps // 3), chunk=1024,
        num_src_views=3, bf16=True)
    print(f"pixelnerf few-shot: {steps} steps, 512 rays, {n_scenes} scenes, "
          f"320x240, 3 src views")
    t0 = time.time()
    cli.run_train(cfg)
    dt = time.time() - t0
    rays_s = steps * cfg.ray_batch_size / dt
    print(f"train wall clock {dt:.0f}s = {rays_s:,.0f} rays/s incl. host")
    summary = cli.run_eval(cfg.replace(eval_mode="full_eval"))
    print("PIXELNERF ACCEPTANCE:", summary, f"train {rays_s:,.0f} rays/s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "mip"
    (accept_mip if which == "mip" else accept_pixelnerf)()
