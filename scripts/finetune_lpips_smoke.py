"""Stage-2 LPIPS finetune, end-to-end ON THE TPU (round-4 VERDICT item 6).

The reference's stage 2 (run.py:59-68,93-97; neo360/model.py:750-755,
957-981): warm-start from the stage-1 checkpoint, freeze the SpatialEncoder
with BN in eval mode, pin lr 5e-6, add 0.3 * LPIPS(VGG) on 30x30 patches.
This smoke proves that whole path runs on the chip: synthetic-weight LPIPS
npz THROUGH the real converter (scripts/convert_weights.convert_lpips),
warm start from the flagship acceptance checkpoint (scripts/accept_neo360.py
train), a few hundred finetune steps, steady-state rays/s from the run's
own metrics.jsonl timestamps.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/finetune_lpips_smoke.py
Env: NEO_ROOT / NEO_CKPTS (accept_state defaults shared with
accept_neo360.py), FT_STEPS (default 256).
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))
sys.path.insert(0, os.path.join(_REPO, "scripts"))

import numpy as np

STATE = os.environ.get("ACCEPT_STATE", "/tmp/accept_state")


def make_lpips_npz(dst: str) -> str:
    """Synthetic VGG16+lin torch state dict -> converter -> loadable npz."""
    import torch

    import convert_weights
    from test_convert_weights import _fake_vgg16_lpips_state

    sd = _fake_vgg16_lpips_state(seed=7)
    src = dst.replace(".npz", ".pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, src)
    return convert_weights.convert_lpips(src, dst)


def main():
    from neo360_tpu import cli
    from neo360_tpu.config import preset
    from neo360_tpu.data.fixtures import make_multi_scene_root

    root = os.environ.get("NEO_ROOT") or os.path.join(STATE, "neo_root")
    if not os.path.isdir(root) or not os.listdir(root):
        make_multi_scene_root(root, n_scenes=4, wh=(320, 240))
    stage1 = os.environ.get("NEO_CKPTS") or os.path.join(STATE, "neo_ckpts")
    stage1_orbax = os.path.join(stage1, "accept", "orbax")
    if not os.path.isdir(stage1_orbax):
        print(f"WARNING: no stage-1 checkpoint at {stage1_orbax} — "
              f"finetuning from fresh init (smoke still valid for the "
              f"LPIPS-loss path)")
        stage1_orbax = None

    os.makedirs(STATE, exist_ok=True)
    npz = make_lpips_npz(os.path.join(STATE, "vgg16_lpips_synth.npz"))
    steps = int(os.environ.get("FT_STEPS", "256"))
    ckpt_dir = os.path.join(STATE, "neo_ft_ckpts")
    cfg = preset(
        "neo360_fast", root_dir=root, exp_name="finetune", ckpt_dir=ckpt_dir,
        img_wh=(320, 240), run_max_steps=steps, steps_per_call=64,
        log_every_steps=64,               # one metrics row per dispatch
        save_every_steps=10 * steps,      # no val-render compile in the smoke
        finetune_lpips=True, lpips_weights=npz, ckpt_path=stage1_orbax)
    print(f"stage-2 finetune: {steps} steps, 900-ray 30x30 patches, "
          f"frozen encoder, lr 5e-6, 0.3*LPIPS; warm start = "
          f"{stage1_orbax}", flush=True)
    t0 = time.time()
    cli.run_train(cfg)
    dt = time.time() - t0

    # steady-state from per-dispatch timestamps (startup/compile excluded)
    rows = [json.loads(l) for l in
            open(os.path.join(ckpt_dir, "finetune", "metrics.jsonl"))]
    ts = np.array([r["time"] for r in rows if "mse" in r])
    st = np.array([r["step"] for r in rows if "mse" in r])
    rays = 900  # patch_size^2
    if len(ts) >= 2:
        # >=2 rows give at least one whole-dispatch interval; median over
        # however many exist (compile/startup excluded by construction)
        per = float(np.median(np.diff(ts) / np.diff(st)))
        sustained = rays / per
    else:
        per, sustained = float("nan"), float("nan")
    final_psnr = next((r["psnr"] for r in reversed(rows) if "psnr" in r),
                      None)
    ledger = {"tag": "neo360_ft_lpips", "steps": steps,
              "wall_s": round(dt, 1),
              "steady_ms_per_step": round(per * 1e3, 1),
              "rays_s_steady": round(sustained, 1),
              "final_train_psnr": final_psnr,
              "warm_start": bool(stage1_orbax)}
    with open(os.path.join(STATE, "neo360_ft.json"), "w") as f:
        json.dump(ledger, f)
    print(f"FINETUNE SMOKE: {steps} steps in {dt:.0f}s wall; steady-state "
          f"{per * 1e3:.0f} ms/step = {sustained:,.0f} rays/s "
          f"(900-ray patches); final train psnr {final_psnr}", flush=True)


if __name__ == "__main__":
    main()
