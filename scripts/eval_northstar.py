"""Eval north star through the production path (round-4 VERDICT item 6).

`cli.run_eval --eval_mode full_eval` over a 2-scene x 99-view 320x240
fixture test split on the real TPU: actual wall clock for the reference
eval protocol (99 held-out views per scene, README.md:174-180), encode-once
per scene, chunk-256 tiled renderer, streaming artifact writes.

The model is a fresh init (quality is not the point here — wall clock and
the artifact pipeline are); params ride the renderer's jit args so timing
matches a trained checkpoint exactly.

Usage: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
       PYTHONPATH=/root/repo:/root/.axon_site python scripts/eval_northstar.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from neo360_tpu import cli
    from neo360_tpu.config import preset
    from neo360_tpu.data.fixtures import make_multi_scene_root

    n_scenes = int(os.environ.get("NS_SCENES", "2"))
    n_test = int(os.environ.get("NS_VIEWS", "99"))
    wh = (320, 240)
    root = os.environ.get("NS_ROOT")
    if not root:
        print(f"building {n_scenes}-scene fixture with {n_test} test "
              f"views...", flush=True)
        root = make_multi_scene_root(
            tempfile.mkdtemp(prefix="northstar_"), n_scenes=n_scenes, wh=wh,
            n_val=n_test)
    ckpt_dir = tempfile.mkdtemp(prefix="northstar_ckpts_")
    cfg = preset(
        "neo360_fast", root_dir=root, exp_name="northstar",
        ckpt_dir=ckpt_dir, img_wh=wh, num_src_views=3,
        eval_mode="full_eval")

    t0 = time.time()
    summary = cli.run_eval(cfg)
    dt = time.time() - t0
    n_imgs = n_scenes * n_test
    print(f"full_eval of {n_imgs} views ({n_scenes} scenes x {n_test}): "
          f"{dt:.1f}s total = {dt / n_imgs:.2f} s/view "
          f"(incl. compile + encode-once per scene + metric + IO)")
    print("summary:", summary)


if __name__ == "__main__":
    main()
