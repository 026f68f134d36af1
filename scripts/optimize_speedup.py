"""Optimize-mode encode-once speedup A/B (round-4 VERDICT item 7).

Measures cli.run_train in is_optimize mode (frozen spatial encoder, fixed
per-scene source views) WITH the cached-latent path (default) and WITHOUT
(NEO360_OPT_NO_CACHE=1 -> per-step ResNet fwd+bwd, the round-3 behavior),
at the production neo360_fast shapes on a 320x240 fixture scene. The two
paths are numerically identical (tests/test_neo360.py bitwise parity);
only the wall clock differs.

Usage: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
       PYTHONPATH=/root/repo:/root/.axon_site python scripts/optimize_speedup.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(label: str, no_cache: bool, root: str, steps: int):
    from neo360_tpu import cli
    from neo360_tpu.config import preset
    if no_cache:
        os.environ["NEO360_OPT_NO_CACHE"] = "1"
    else:
        os.environ.pop("NEO360_OPT_NO_CACHE", None)
    cfg = preset(
        "neo360_fast", root_dir=root, exp_name=f"opt_{label}",
        ckpt_dir=tempfile.mkdtemp(prefix=f"optsp_{label}_"),
        img_wh=(320, 240), ray_batch_size=512, run_max_steps=steps,
        steps_per_call=32, save_every_steps=10 ** 6,
        val_every_steps=10 ** 6, num_src_views=3, is_optimize=True)
    t0 = time.time()
    cli.run_train(cfg)
    dt = time.time() - t0
    rays_s = steps * cfg.ray_batch_size / dt
    print(f"[{label}] {steps} steps in {dt:.1f}s = {rays_s:,.0f} rays/s "
          f"(incl. compile)", flush=True)
    return dt


def main():
    from neo360_tpu.data.fixtures import make_micro_scene
    steps = int(os.environ.get("OPT_STEPS", "512"))
    root = os.environ.get("OPT_ROOT") or os.path.dirname(
        make_micro_scene(
            os.path.join(tempfile.mkdtemp(prefix="optsp_"), "scene_000"),
            wh=(320, 240)))
    # warm then measured run per mode; compile is shared across step counts
    for label, no_cache in (("cached", False), ("per_step", True)):
        run_once(label + "_warm", no_cache, root, steps=64)
        run_once(label, no_cache, root, steps=steps)


if __name__ == "__main__":
    main()
