"""Control for mesh_render_scaling.py: same harness, trivial chunk body.

If a pure-matmul chunk body also shows ~8x wall on the 8-virtual-device
mesh (1 physical core), the 8x measured for the NeRFTP renderer is a
harness artifact (per-device dispatch/reshard overhead on a serialized
host), not GSPMD replicating the model body. If the control shows ~1x,
the model body is NOT being partitioned and the v4-8 render extrapolation
needs a real fix.

Run CPU-only:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  PYTHONPATH=/root/repo python scripts/mesh_scaling_control.py
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
    from neo360_tpu.parallel import sharding as sh
    from neo360_tpu.train import loop as tl

    assert jax.device_count() == 8, jax.devices()
    key = jax.random.PRNGKey(0)
    # heavy enough that compute dominates dispatch: (chunk, 512) @ (512, 512)
    # applied 64 times per chunk
    w = jax.random.normal(key, (512, 512), jnp.float32)

    def render_chunk(params, rays):
        x = rays["rays_o"]

        def body(i, x):
            return jnp.tanh(x @ params)

        x = jax.lax.fori_loop(0, 64, body, x)
        return {"rgb": x[:, :3]}

    n = 3072
    rays = {"rays_o": jax.random.normal(key, (n, 512), jnp.float32)}
    chunk = 256
    mesh = sh.make_mesh()

    def timed(renderer, n_rep=3):
        np.asarray(renderer(w, rays)["rgb"])
        t0 = time.time()
        for _ in range(n_rep):
            np.asarray(renderer(w, rays)["rgb"])
        return (time.time() - t0) / n_rep

    t1 = timed(tl.make_image_renderer(render_chunk, chunk))
    t8 = timed(tl.make_image_renderer(render_chunk, chunk, mesh=mesh))
    print(f"control single-device : {t1 * 1e3:8.1f} ms")
    print(f"control 8-dev sharded : {t8 * 1e3:8.1f} ms")
    print(f"CONTROL: t1={t1:.3f}s t8={t8:.3f}s ratio={t8 / t1:.2f}")


if __name__ == "__main__":
    main()
