import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neo360_tpu.models.pixelnerf import PixelNeRF, PixelNeRFMLP


def _batch(multi_scene_root, n_rays=16):
    from neo360_tpu.data.nerds360_ae import NeRDS360AE
    ds = NeRDS360AE(multi_scene_root, split="train", img_wh=(40, 30),
                    ray_batch_size=n_rays, dest_views_per_sample=4)
    s = ds.sample_train(np.random.default_rng(0))
    return ds, {k: jnp.asarray(v) for k, v in s.items()}


def test_mlp_view_fusion_shapes():
    mlp = PixelNeRFMLP(netwidth=32, netwidth_condition=32, latent_size=16)
    nv, b, s = 3, 4, 5
    x = jnp.ones((nv * b, s, 21))       # pos_enc(3, 0..3) = 3*(1+2*3)
    vd = jnp.ones((nv * b, 27))
    lat = jnp.ones((nv * b, s, 16))
    params = mlp.init(jax.random.PRNGKey(0), x, vd, lat, nv)
    rgb, dens = mlp.apply(params, x, vd, lat, nv)
    assert rgb.shape == (b, s, 3)
    assert dens.shape == (b, s, 1)


def test_mlp_fusion_invariant_to_view_permutation():
    mlp = PixelNeRFMLP(netwidth=32, netwidth_condition=32, latent_size=8)
    nv, b, s = 3, 2, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(nv, b, s, 21)), jnp.float32)
    vd = jnp.asarray(rng.normal(size=(nv, b, 27)), jnp.float32)
    lat = jnp.asarray(rng.normal(size=(nv, b, s, 8)), jnp.float32)
    params = mlp.init(jax.random.PRNGKey(0), x.reshape(nv * b, s, -1),
                      vd.reshape(nv * b, -1), lat.reshape(nv * b, s, -1), nv)
    out1, _ = mlp.apply(params, x.reshape(nv * b, s, -1),
                        vd.reshape(nv * b, -1),
                        lat.reshape(nv * b, s, -1), nv)
    perm = jnp.asarray([2, 0, 1])
    out2, _ = mlp.apply(params, x[perm].reshape(nv * b, s, -1),
                        vd[perm].reshape(nv * b, -1),
                        lat[perm].reshape(nv * b, s, -1), nv)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_pixelnerf_forward(multi_scene_root):
    ds, batch = _batch(multi_scene_root)
    model = PixelNeRF(num_coarse_samples=8, num_fine_samples=8)
    rays = {k: batch[k] for k in ("rays_o", "rays_d", "viewdirs", "src_imgs",
                                  "src_poses", "src_focal", "src_c")}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, True, False, ds.near, ds.far)
    out = model.apply(variables, rays, True, False, ds.near, ds.far,
                      rngs={"sampling": jax.random.PRNGKey(2)})
    assert len(out) == 2
    assert out[1]["rgb"].shape == (16, 3)
    assert np.all(np.isfinite(np.asarray(out[1]["rgb"])))


def test_pixelnerf_encode_once_matches_inline(multi_scene_root):
    """Passing a precomputed latent must equal encoding inside the call —
    the optimization that fixes the reference's per-chunk re-encoding."""
    ds, batch = _batch(multi_scene_root, n_rays=8)
    model = PixelNeRF(num_coarse_samples=4, num_fine_samples=4)
    rays = {k: batch[k] for k in ("rays_o", "rays_d", "viewdirs", "src_imgs",
                                  "src_poses", "src_focal", "src_c")}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, True, False, ds.near, ds.far)
    latent = model.apply(variables, rays["src_imgs"], method=PixelNeRF.encode)
    a = model.apply(variables, rays, False, False, ds.near, ds.far)
    b = model.apply(variables, rays, False, False, ds.near, ds.far,
                    latent=latent)
    np.testing.assert_allclose(np.asarray(a[1]["rgb"]),
                               np.asarray(b[1]["rgb"]), atol=1e-6)
