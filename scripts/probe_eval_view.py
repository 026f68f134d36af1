"""Attribute the per-view cost of the production eval loop (round 4/5).

The 99-view full_eval sustained ~3.5 s/view while bench.py's render phase
reports 1.22 s/image at the same model config — this probe splits one
eval view into its phases on the real TPU:

  a) render dispatch+fetch with DEVICE-resident rays (pure device+fetch)
  b) same with per-view numpy ray upload (the run_eval situation)
  b2) b plus the depth fetch (the full run_eval fetch pattern)
  c) fused psnr+ssim metric dispatch + scalar fetches
  d) host artifact encode (to8b + JPEG + npz, no thread)
  e) eager per-view scene encode (what pre-round-5 run_eval paid every
     view; now paid once per scene via the scene_key pack cache)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_eval_view.py
(PROBE_ROOT defaults to the accept_neo360 fixture root; built if absent.)
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from neo360_tpu.data.fixtures import make_multi_scene_root
    from neo360_tpu.data.nerds360_ae import NeRDS360AE
    from neo360_tpu.models.neo360 import NeRFTP
    from neo360_tpu.train import loop as tl
    from neo360_tpu.train import metrics as M
    from neo360_tpu.utils.io import to8b

    root = os.environ.get(
        "PROBE_ROOT",
        os.path.join(os.environ.get("ACCEPT_STATE", "/tmp/accept_state"),
                     "neo_root"))
    if not os.path.isdir(root) or not os.listdir(root):
        make_multi_scene_root(root, n_scenes=4, wh=(320, 240))
    ds = NeRDS360AE(root, "test", (320, 240), 3)
    w, h = 320, 240
    model = NeRFTP(compute_dtype=jnp.bfloat16, use_proposal=True,
                   num_prop_samples=64, num_fine_samples=60, lift_dim=128,
                   grid_size=(64, 64, 32))
    sample = ds.sample_test(0, 0)
    rays_np = {k: np.asarray(sample[k], np.float32)
               for k in ("rays_o", "rays_d", "viewdirs")}
    src = {k: jnp.asarray(sample[k]) for k in
           ("src_imgs", "src_poses", "src_focal", "src_c")}
    # init on a FEW rays: a full 76,800-ray init forward OOMs HBM (the
    # round-4 run_eval production bug, cli.py run_eval few-shot branch)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        dict({k: v[:4] for k, v in rays_np.items()},
             **{k: np.asarray(v) for k, v in src.items()}),
        True, False, train=False)
    print("init done", flush=True)
    vars_f = {"params": variables["params"],
              "batch_stats": variables["batch_stats"]}

    def encode():
        return model.apply(vars_f, src["src_imgs"], src["src_poses"],
                           src["src_focal"], src["src_c"],
                           method=NeRFTP.encode)

    encoded = encode()

    def render_chunk(pack, rays):
        rays = dict(rays, **pack["src"])
        out = model.apply({"params": pack["params"],
                           "batch_stats": pack["bs"]},
                          rays, False, False, out_depth=True,
                          encoded=pack["enc"])
        return {"rgb": out[1]["rgb"], "depth": out[1]["depth"]}

    renderer = tl.make_image_renderer(render_chunk, 256)
    pack = {"params": vars_f["params"], "bs": vars_f["batch_stats"],
            "enc": encoded, "src": src}
    rays_dev = {k: jnp.asarray(v) for k, v in rays_np.items()}

    # compile + warm
    out = renderer(pack, rays_dev)
    rgb = np.asarray(out["rgb"])
    print("renderer warm", flush=True)

    def timeit(fn, n=5):
        t0 = time.time()
        for _ in range(n):
            fn()
        return (time.time() - t0) / n

    # a) device-resident rays
    ta = timeit(lambda: np.asarray(renderer(pack, rays_dev)["rgb"]))
    # b) numpy upload per view
    tb = timeit(lambda: np.asarray(renderer(pack, rays_np)["rgb"]))
    # b2) fetch rgb AND depth (the run_eval fetch pattern)
    def _b2():
        o = renderer(pack, rays_np)
        np.asarray(o["rgb"]); np.asarray(o["depth"])
    tb2 = timeit(_b2)
    # c) metrics dispatch + scalar fetches
    metrics_fn = jax.jit(lambda p, t: (M.psnr(p, t), M.ssim(p, t)))
    tgt = jnp.asarray(np.asarray(sample["target"],
                                 np.float32).reshape(h, w, 3))
    pred_dev = jnp.reshape(out["rgb"], (h, w, 3))
    p_, s_ = metrics_fn(pred_dev, tgt)
    float(p_), float(s_)
    def _c():
        p, s = metrics_fn(pred_dev, tgt)
        float(p), float(s)
    tc = timeit(_c)
    # d) host artifact encode
    from PIL import Image
    tmp = tempfile.mkdtemp(prefix="probe_")
    depth = np.asarray(out["depth"], np.float32).reshape(h, w)
    def _d():
        Image.fromarray(to8b(rgb.reshape(h, w, 3))).save(
            os.path.join(tmp, "x.jpg"))
        np.savez_compressed(os.path.join(tmp, "x.npz"), depth=depth)
    td = timeit(_d)
    # e) eager scene encode (sync via a 1-element scalar fetch: the fetch
    # itself costs one ~tens-of-ms dispatch, small vs the eager op stream)
    def _e():
        enc = encode()
        float(jnp.sum(jax.tree_util.tree_leaves(enc)[0][:1, :1]))
    _e()  # warm any convert paths
    te = timeit(_e)

    print(f"a) render+fetch, device rays : {ta:6.2f} s/view")
    print(f"b) render+fetch, numpy rays  : {tb:6.2f} s/view "
          f"(upload cost {tb - ta:+.2f})")
    print(f"b2) + depth fetch            : {tb2:6.2f} s/view "
          f"(depth fetch {tb2 - tb:+.2f})")
    print(f"c) fused metrics + 2 scalars : {tc:6.2f} s/view")
    print(f"d) host jpg+npz encode       : {td:6.2f} s/view")
    print(f"e) eager scene encode        : {te:6.2f} s/view "
          f"(pre-round-5: every view; now once per scene)")
    print(f"sum(b2+c+d) = {tb2 + tc + td:.2f} s/view cached-encode; "
          f"+e = {tb2 + tc + td + te:.2f} legacy vs measured 3.53")


if __name__ == "__main__":
    main()
