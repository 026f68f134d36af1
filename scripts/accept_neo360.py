"""Flagship acceptance: NeO-360 quality THROUGH the production CLI
(round-4 VERDICT item 2): `cli.run_train` the adopted neo360_fast config on
a >=4-scene 320x240 fixture to >=1408 steps (the quality gate's step count),
then `cli.run_eval full_eval` on the TRAINED checkpoint in BOTH BatchNorm
eval modes. This closes the random-init hole in the round-4 north-star run
(its 198-view timing eval restored no checkpoint) and demonstrates
checkpoint->eval fidelity end-to-end.

Phases are separate queue entries with separate budgets (VERDICT weak #1):

  P=PYTHONPATH=/root/repo:/root/.axon_site
  $P python scripts/accept_neo360.py train
  $P python scripts/accept_neo360.py eval

State: NEO_ROOT (fixture root, built if absent), NEO_CKPTS; defaults under
/tmp/accept_state/. Eval runs both bn modes in ONE process (the renderer
compile is shared in-process) and preserves each mode's results.json.

Reference protocol being matched: neo360/model.py:1093-1142 (test PSNR/SSIM
+ object-PSNR over the test split), run.py:159-168 (ckpt -> trainer.test).
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STATE = os.environ.get("ACCEPT_STATE", "/tmp/accept_state")


def _cfg():
    from neo360_tpu.config import preset
    from neo360_tpu.data.fixtures import make_multi_scene_root

    n_scenes = int(os.environ.get("NEO_SCENES", "4"))
    root = os.environ.get("NEO_ROOT") or os.path.join(STATE, "neo_root")
    if not os.path.isdir(root) or not os.listdir(root):
        make_multi_scene_root(root, n_scenes=n_scenes, wh=(320, 240))
    ckpt_dir = os.environ.get("NEO_CKPTS") or os.path.join(STATE, "neo_ckpts")
    steps = int(os.environ.get("NEO_STEPS", "2048"))
    cfg = preset(
        "neo360_fast", root_dir=root, exp_name="accept", ckpt_dir=ckpt_dir,
        img_wh=(320, 240), run_max_steps=steps,
        save_every_steps=704, val_every_steps=704)
    return cfg, steps


def train():
    from neo360_tpu import cli
    cfg, steps = _cfg()
    print(f"neo360_fast train: {steps} steps (gate is 1408+), "
          f"{cfg.ray_batch_size} rays/step, K={cfg.stage_k} S="
          f"{cfg.stage_scenes} -> {cfg.ckpt_dir}", flush=True)
    t0 = time.time()
    cli.run_train(cfg)
    dt = time.time() - t0
    rays_s = steps * cfg.ray_batch_size / dt
    ledger = {"tag": "neo360", "phase": "train", "steps": steps,
              "wall_s": round(dt, 1), "rays_s_incl_host": round(rays_s, 1)}
    os.makedirs(STATE, exist_ok=True)
    with open(os.path.join(STATE, "neo360_train.json"), "w") as f:
        json.dump(ledger, f)
    print(f"NEO360 TRAIN: wall {dt:.0f}s = {rays_s:,.0f} rays/s incl. host "
          f"(includes one-off compiles; steady-state is sustain_cli's "
          f"8,407)", flush=True)


def evaluate():
    from neo360_tpu import cli
    cfg, _ = _cfg()
    exp_dir = os.path.join(cfg.ckpt_dir, cfg.exp_name)
    ledger = {"tag": "neo360", "phase": "eval", "modes": {}}
    for mode in ("batch", "running"):
        mcfg = cfg.replace(eval_mode="full_eval", eval_bn_mode=mode,
                           render_name=f"3views_{mode}")
        t0 = time.time()
        summary = cli.run_eval(mcfg)
        dt = time.time() - t0
        # preserve this mode's self-describing results.json before the next
        # mode overwrites it
        src = os.path.join(exp_dir, "results.json")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(exp_dir, f"results_{mode}.json"))
        ledger["modes"][mode] = {
            "wall_s": round(dt, 1),
            **{k: round(float(v), 4) for k, v in summary.items()}}
        print(f"NEO360 ACCEPTANCE (eval_bn_mode={mode}): {summary} "
              f"(wall {dt:.0f}s)", flush=True)
    os.makedirs(STATE, exist_ok=True)
    with open(os.path.join(STATE, "neo360_eval.json"), "w") as f:
        json.dump(ledger, f)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "train"
    {"train": train, "eval": evaluate}[which]()
