"""Production-path sustained throughput (round-4 VERDICT item 3).

Runs the REAL entry point — cli.run_train with the neo360_fast preset
(scene-mixed K=32 S=2 stage trainer) — on a >=4-scene 320x240 fixture root
for a few thousand steps on the TPU, and reports sustained rays/s INCLUDING
host sampling + prefetch, next to bench.py's device-only headline. Also
splits host vs device time by probing the staged iterator's sample cost.

Usage: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
       PYTHONPATH=/root/repo:/root/.axon_site python scripts/sustain_cli.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from neo360_tpu import cli
    from neo360_tpu.config import preset
    from neo360_tpu.data.fixtures import make_multi_scene_root
    from neo360_tpu.data.nerds360_ae import NeRDS360AE

    n_scenes = int(os.environ.get("SUSTAIN_SCENES", "4"))
    steps = int(os.environ.get("SUSTAIN_STEPS", "2048"))
    wh = (320, 240)
    root = os.environ.get("SUSTAIN_ROOT")
    if not root:
        print(f"building {n_scenes}-scene 320x240 fixture root...",
              flush=True)
        root = make_multi_scene_root(
            tempfile.mkdtemp(prefix="sustain_"), n_scenes=n_scenes, wh=wh)
    ckpt_dir = tempfile.mkdtemp(prefix="sustain_ckpts_")

    cfg = preset(
        "neo360_fast", root_dir=root, exp_name="sustain", ckpt_dir=ckpt_dir,
        img_wh=wh, ray_batch_size=512, run_max_steps=steps,
        steps_per_call=64, save_every_steps=10 ** 6,
        val_every_steps=10 ** 6, num_src_views=3)

    # host-side cost probe: how long does ONE stage sample take to draw?
    ds = NeRDS360AE(root, "train", wh, 3, 512)
    rng = np.random.default_rng(0)
    _ = ds.sample_train_stage(rng, cfg.stage_k, n_scenes=cfg.stage_scenes)
    t0 = time.time()
    for _ in range(3):
        _ = ds.sample_train_stage(rng, cfg.stage_k,
                                  n_scenes=cfg.stage_scenes)
    host_per_stage = (time.time() - t0) / 3
    print(f"host sample_train_stage (K={cfg.stage_k}, S={cfg.stage_scenes}):"
          f" {host_per_stage * 1e3:.0f} ms per stage "
          f"({host_per_stage / cfg.stage_k * 1e3:.1f} ms/step equiv)",
          flush=True)

    # warm run first: the trainer/renderer programs compile ONCE per
    # process (the axon remote compile is NOT served by the on-disk
    # JAX_COMPILATION_CACHE_DIR, measured 2026-08-21: a second process
    # re-paid the full ~850 s compile), so the timed full/half runs below
    # must share THIS process's in-memory executable cache
    warm_steps = max(cfg.steps_per_call, 64)
    print(f"warm run ({warm_steps} steps; pays the one-off compile)...",
          flush=True)
    t0 = time.time()
    cli.run_train(cfg.replace(run_max_steps=warm_steps, exp_name="warm"))
    print(f"warm run done in {time.time() - t0:.1f}s", flush=True)

    print(f"cli.run_train: {steps} steps, K={cfg.stage_k} "
          f"S={cfg.stage_scenes} fine={cfg.num_fine_samples}", flush=True)
    t0 = time.time()
    cli.run_train(cfg)
    dt = time.time() - t0
    rays = steps * cfg.ray_batch_size
    print(f"TOTAL wall clock {dt:.1f}s (compile-warm, incl. init) = "
          f"{rays / dt:,.0f} rays/s", flush=True)

    # steady-state: rerun with half the steps from a fresh state; the
    # difference isolates the sustained rate (both runs compile-warm and
    # paying the same init)
    cfg2 = cfg.replace(run_max_steps=steps // 2, exp_name="sustain2")
    t0 = time.time()
    cli.run_train(cfg2)
    dt2 = time.time() - t0
    if dt > dt2 + 1.0:
        diff = (rays - steps // 2 * cfg.ray_batch_size) / (dt - dt2)
        print(f"half-run wall clock {dt2:.1f}s -> difference-method rate "
              f"{diff:,.0f} rays/s (UNRELIABLE: run startup through the "
              f"axon relay varies 55-226 s run-to-run, measured "
              f"2026-08-21 — prefer the timestamp number below)",
              flush=True)

    # the authoritative steady-state: per-dispatch timestamps from the
    # run's own metrics.jsonl (logged after every trainer dispatch), which
    # exclude init/startup/teardown by construction
    import json

    per_all = []
    for exp in ("sustain", "sustain2"):
        path = os.path.join(ckpt_dir, exp, "metrics.jsonl")
        rows = [json.loads(line) for line in open(path)]
        ts = np.array([r["time"] for r in rows])
        st = np.array([r["step"] for r in rows])
        if len(ts) > 2:
            dts, dst = np.diff(ts), np.diff(st)
            keep = dst > 0  # drop duplicate-step rows (e.g. a val_psnr
            per_all.extend((dts[keep] / dst[keep]).tolist())
    if not per_all:
        raise SystemExit("sustain_cli: no usable step intervals in "
                         "metrics.jsonl (run too short or failed) — "
                         "refusing to print a NaN rate")
    per = float(np.median(per_all))
    print(f"SUSTAINED cli.run_train (steady-state, per-dispatch "
          f"timestamps over {len(per_all)} intervals): "
          f"{cfg.ray_batch_size / per:,.0f} rays/s "
          f"({per * 1e3:.1f} ms/step; host stage-sample "
          f"{host_per_stage * 1e3:.0f} ms / {cfg.stage_k}-step stage)")


if __name__ == "__main__":
    main()
