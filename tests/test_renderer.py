"""make_image_renderer: tiling/padding semantics + mesh-sharded parity.

The mesh path is the eval-time "context parallelism" that replaces the
reference's Lightning all_gather (interface.py:30-50): each fixed-shape ray
tile is sharded over the mesh's data axis and XLA gathers the outputs.
"""

import numpy as np


def _toy_chunk_fn(params, rays):
    # a deterministic per-ray function with params involvement
    rgb = rays["rays_o"] * params["scale"] + rays["rays_d"]
    return {"rgb": rgb, "depth": rays["rays_o"][:, :1] * 2.0}


def _rays(n, seed=0):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    return {
        "rays_o": jnp.asarray(rng.standard_normal((n, 3)), jnp.float32),
        "rays_d": jnp.asarray(rng.standard_normal((n, 3)), jnp.float32),
    }


def test_renderer_matches_direct_and_pads():
    import jax.numpy as jnp
    from neo360_tpu.train.loop import make_image_renderer

    params = {"scale": jnp.asarray(3.0)}
    render = make_image_renderer(_toy_chunk_fn, chunk=16)
    for n in (16, 48, 50, 7):   # exact multiple, multiple, ragged, < chunk
        rays = _rays(n, seed=n)
        out = render(params, rays)
        want = _toy_chunk_fn(params, rays)
        assert out["rgb"].shape == (n, 3)
        assert out["depth"].shape == (n, 1)
        np.testing.assert_allclose(np.asarray(out["rgb"]),
                                   np.asarray(want["rgb"]),
                                   rtol=1e-5, atol=1e-5)


def test_renderer_mesh_sharded_matches_unsharded():
    import jax.numpy as jnp
    from neo360_tpu.parallel import sharding as sh
    from neo360_tpu.train.loop import make_image_renderer

    mesh = sh.make_mesh()          # {"data": 8}
    params = {"scale": jnp.asarray(0.5)}
    plain = make_image_renderer(_toy_chunk_fn, chunk=16)
    sharded = make_image_renderer(_toy_chunk_fn, chunk=16, mesh=mesh)
    rays = _rays(52, seed=3)
    a = plain(params, rays)
    b = sharded(params, rays)
    np.testing.assert_allclose(np.asarray(b["rgb"]), np.asarray(a["rgb"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b["depth"]),
                               np.asarray(a["depth"]), rtol=1e-5, atol=1e-5)


def test_renderer_mesh_indivisible_chunk_ok():
    # tile-axis sharding (shard_map) has no chunk % n_devices constraint:
    # each device renders whole tiles, so any chunk size is legal
    import jax.numpy as jnp
    from neo360_tpu.parallel import sharding as sh
    from neo360_tpu.train.loop import make_image_renderer

    mesh = sh.make_mesh()          # {"data": 8}
    params = {"scale": jnp.asarray(2.0)}
    sharded = make_image_renderer(_toy_chunk_fn, chunk=12, mesh=mesh)
    rays = _rays(29, seed=5)       # ragged: pads to 96 = chunk * 8 devices
    out = sharded(params, rays)
    want = _toy_chunk_fn(params, rays)
    assert out["rgb"].shape == (29, 3)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(want["rgb"]), rtol=1e-5, atol=1e-5)
