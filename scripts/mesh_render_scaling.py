"""Bound the v4-8 render-scaling extrapolation on the CPU mesh (round-4
VERDICT stretch #8).

The "<60 s on v4-8" eval north star leans on near-linear scaling of the
mesh-sharded renderer (train/loop.py make_image_renderer's "data"-axis
tile sharding). Real multi-chip hardware is unavailable, and on the
1-core host all 8 virtual CPU devices serialize onto the same core — so
wall-clock SPEEDUP is unmeasurable here. What IS measurable is the
OVERHEAD of partitioning: with compute perfectly divided and serialized,

    t_mesh(8 virtual devices) / t_single(1 device)  ~=  1 + overhead

where overhead is everything sharding adds (partitioned-program
inefficiency, gather of output slices, halo/reshard copies if any).
On real chips the per-chip wall clock is ~(t_single/8)*(1+overhead)+ICI,
so measuring overhead ~ 0 here bounds the non-ICI error term of the
linear extrapolation. ICI latency itself cannot be measured on a host
mesh; the extrapolation's error bar = overhead + unmeasured ICI term.

Run CPU-only (MUST NOT touch the TPU grant):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  PYTHONPATH=/root/repo python scripts/mesh_render_scaling.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np


def main():
    from neo360_tpu.data.fixtures import make_multi_scene_root
    from neo360_tpu.data.nerds360_ae import NeRDS360AE
    from neo360_tpu.models.neo360 import NeRFTP
    from neo360_tpu.parallel import sharding as sh
    from neo360_tpu.train import loop as tl

    assert jax.device_count() == 8, jax.devices()
    root = os.environ.get("MS_ROOT", "/tmp/mesh_scaling_root")
    if not os.path.isdir(root) or not os.listdir(root):
        make_multi_scene_root(root, n_scenes=1, wh=(64, 48))
    ds = NeRDS360AE(root, "test", (64, 48), 3)
    sample = ds.sample_test(0, 0)

    # reduced widths, production STRUCTURE (proposal + tri-plane + fg/bg):
    # the quantity measured is partitioning overhead, not absolute FLOPs
    model = NeRFTP(num_coarse_samples=8, num_fine_samples=8,
                   grid_size=(16, 16, 8), lift_dim=32, plane_dim=32,
                   local_proj_dim=32, encoder_width=64,
                   use_proposal=True, num_prop_samples=8,
                   remat_encoder=False, num_src_views=3)
    ray_like = ("rays_o", "rays_d", "viewdirs", "radii", "target",
                "nocs_2d", "instance_mask")
    example = {k: (np.asarray(v)[:4] if k in ray_like else np.asarray(v))
               for k, v in sample.items() if k != "img_wh"}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        example, True, False, train=False)
    vars_f = {"params": variables["params"],
              "batch_stats": variables["batch_stats"]}
    src = {k: jnp.asarray(sample[k]) for k in
           ("src_imgs", "src_poses", "src_focal", "src_c")}
    encoded = model.apply(vars_f, src["src_imgs"], src["src_poses"],
                          src["src_focal"], src["src_c"],
                          method=NeRFTP.encode)
    pack = {"params": vars_f["params"], "bs": vars_f["batch_stats"],
            "enc": encoded, "src": src}
    rays = {k: jnp.asarray(np.asarray(sample[k], np.float32))
            for k in ("rays_o", "rays_d", "viewdirs")}
    # equalize padded work between the 1- and 8-device renderers: tile the
    # view's rays to a multiple of chunk*8 so neither variant pads extra
    # tiles (the production 76,800-ray view pads <1%; at 3,072 rays the
    # mesh quantum would inflate the 8-device work 1.33x and corrupt the
    # overhead estimate)
    n_rays = int(os.environ.get("MS_RAYS", "8192"))
    reps = -(-n_rays // rays["rays_o"].shape[0])
    rays = {k: jnp.tile(v, (reps, 1))[:n_rays] for k, v in rays.items()}

    def render_chunk(pack, rays):
        rays = dict(rays, **pack["src"])
        out = model.apply({"params": pack["params"],
                           "batch_stats": pack["bs"]},
                          rays, False, False, out_depth=True,
                          encoded=pack["enc"])
        return {"rgb": out[1]["rgb"], "depth": out[1]["depth"]}

    chunk = int(os.environ.get("MS_CHUNK", "256"))
    mesh = sh.make_mesh()  # 1-D "data" mesh over all 8 devices

    def timed(renderer, n=3):
        out = renderer(pack, rays)            # compile + warm
        np.asarray(out["rgb"])
        t0 = time.time()
        for _ in range(n):
            np.asarray(renderer(pack, rays)["rgb"])
        return (time.time() - t0) / n

    t1 = timed(tl.make_image_renderer(render_chunk, chunk))
    # replicate the encoded pack ONCE, as the production per-scene encode
    # cache does — otherwise every call pays an 8-way host broadcast of the
    # tables, which a real eval amortizes over ~99 views
    pack = sh.replicate_tree(pack, mesh)
    t8 = timed(tl.make_image_renderer(render_chunk, chunk, mesh=mesh))
    overhead = t8 / t1 - 1.0
    print(f"single-device render      : {t1 * 1e3:8.1f} ms/view")
    print(f"8-virtual-device sharded  : {t8 * 1e3:8.1f} ms/view "
          f"(same 1 physical core)")
    print(f"partitioning overhead     : {overhead * +100:8.1f} % "
          f"(non-ICI error term of the v4-8 linear extrapolation)")
    print(f"MESH_SCALING: t1={t1:.3f}s t8={t8:.3f}s overhead={overhead:.3f}")


if __name__ == "__main__":
    main()
