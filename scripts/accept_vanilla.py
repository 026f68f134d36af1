"""Vanilla-NeRF acceptance run at production resolution (VERDICT item 5).

Reproduces the reference's single-scene overfit protocol (README.md:219-228:
320x240 NERDS360 scene, vanilla preset, test PSNR 24.75 / SSIM 0.78) on the
synthetic micro-scene at the SAME resolution and sampling budget, through the
production CLI paths (cli.run_train buffer trainer + cli.run_eval full_eval).

The micro-scene is simpler than a real NERDS360 capture, so the acceptance
bar is "plateaus comfortably above the reference number and renders crisp
test views", not an exact PSNR match; the point is exercising the production
config at production scale (7.68M-ray buffer, 320x240 eval renders) and
recording the result in BASELINE.md.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/accept_vanilla.py
Env: ACCEPT_STEPS (default 30000), ACCEPT_DIR (default a fresh tmpdir).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo360_tpu import cli
from neo360_tpu.data.fixtures import make_micro_scene


def main():
    steps = int(os.environ.get("ACCEPT_STEPS", "30000"))
    work = os.environ.get("ACCEPT_DIR") or tempfile.mkdtemp(
        prefix="neo360_accept_")
    scene = os.path.join(work, "scene")
    if not os.path.isdir(os.path.join(scene, "train")):
        print("building 320x240 micro scene at", scene, flush=True)
        make_micro_scene(scene, wh=(320, 240))

    argv = ["--exp_type", "vanilla", "--root_dir", scene,
            "--img_wh", "320", "240", "--exp_name", "vanilla_accept",
            "--ckpt_dir", os.path.join(work, "ckpts"),
            "--run_max_steps", str(steps),
            "--save_every_steps", str(max(1000, steps // 4))]
    cfg = cli.parse_args(argv)
    t0 = time.time()
    cli.run_train(cfg)
    t_train = time.time() - t0
    print(f"train {steps} steps: {t_train:.0f}s "
          f"({steps * cfg.batch_size / t_train:,.0f} rays/s incl. host)",
          flush=True)

    cfg_eval = cli.parse_args(argv + ["--eval_mode", "full_eval"])
    summary = cli.run_eval(cfg_eval)
    res = os.path.join(work, "ckpts", "vanilla_accept", "results.json")
    if os.path.exists(res):
        with open(res) as f:
            print("results.json:", json.dumps(json.load(f))[:400])
    psnr = float(summary.get("psnr", 0.0))
    ok = psnr >= 24.75
    print(f"ACCEPTANCE: test PSNR {psnr:.2f} SSIM "
          f"{float(summary.get('ssim', 0.0)):.3f} vs reference protocol "
          f"24.75/0.78 -> {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
