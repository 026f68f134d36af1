import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neo360_tpu.core import encoding, mip
from neo360_tpu.models.mipnerf360 import (MipNeRF360, distortion_loss,
                                          interlevel_loss)


def _rays(b=4, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-0.2, 0.2, size=(b, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(b, 3)), jnp.float32)
    v = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    radii = jnp.full((b, 1), 0.001)
    return {"rays_o": o, "rays_d": d, "viewdirs": v, "radii": radii}


def _tiny_model():
    return MipNeRF360(num_prop_samples=8, num_nerf_samples=4,
                      nerf_netwidth=64, prop_netwidth=32, prop_netdepth=2)


def test_contract_identity_inside_unit_ball():
    x = jnp.asarray([[0.3, -0.2, 0.1], [0.0, 0.0, 0.5]])
    np.testing.assert_allclose(np.asarray(encoding.contract(x)),
                               np.asarray(x), atol=1e-6)


def test_contract_outside_maps_to_radius_2_ball():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 3)) * 10, jnp.float32)
    z = np.asarray(encoding.contract(x))
    norms = np.linalg.norm(z, axis=-1)
    in_norms = np.linalg.norm(np.asarray(x), axis=-1)
    outside = in_norms > 1
    assert np.all(norms[outside] < 2.0)
    assert np.all(norms[outside] > 1.0)
    # contract(x) = (2 - 1/|x|) * x/|x|
    expect = (2 - 1 / in_norms[outside])[:, None] * (
        np.asarray(x)[outside] / in_norms[outside][:, None])
    np.testing.assert_allclose(z[outside], expect, rtol=1e-5)


def test_track_linearize_identity_fn():
    rng = np.random.default_rng(1)
    mean = jnp.asarray(rng.normal(size=(4, 5, 3)), jnp.float32)
    a = jnp.asarray(rng.normal(size=(3, 3)), jnp.float32)
    cov = jnp.einsum("ij,...jk->...ik", a, jnp.broadcast_to(
        a.T, (4, 5, 3, 3)))
    # linear fn: J = M, cov' = M cov M^T
    m = jnp.asarray(rng.normal(size=(3, 3)), jnp.float32)
    fn = lambda x: x @ m.T
    out_mean, out_cov = encoding.track_linearize(fn, mean, cov)
    np.testing.assert_allclose(np.asarray(out_mean), np.asarray(fn(mean)),
                               rtol=1e-5)
    expect = jnp.einsum("ij,...jk,lk->...il", m, cov, m)
    np.testing.assert_allclose(np.asarray(out_cov), np.asarray(expect),
                               rtol=1e-4, atol=1e-5)


def test_generate_basis_shape_and_unit_norm():
    basis = encoding.generate_basis("icosahedron", 2)
    assert basis.shape == (3, 21)
    np.testing.assert_allclose(np.linalg.norm(basis, axis=0), 1.0, atol=1e-5)


def test_ray_warps_roundtrip():
    t_to_s, s_to_t = mip.construct_ray_warps(0.2, 100.0)
    t = jnp.asarray([0.2, 1.0, 10.0, 100.0])
    np.testing.assert_allclose(np.asarray(t_to_s(s_to_t(t / 100.0))),
                               np.asarray(t / 100.0), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(float(t_to_s(jnp.asarray(0.2))), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(t_to_s(jnp.asarray(100.0))), 1.0,
                               atol=1e-6)


def test_sample_intervals_deterministic_sorted_in_domain():
    t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (3, 9))
    logits = jnp.zeros((3, 8))
    s = mip.sample_intervals(t, logits, 16, randomized=False,
                             domain=(0.0, 1.0))
    s = np.asarray(s)
    assert s.shape == (3, 17)
    assert np.all(np.diff(s, axis=-1) >= -1e-6)
    assert s.min() >= 0.0 and s.max() <= 1.0


def test_forward_shapes_and_history():
    model = _tiny_model()
    rays = _rays()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, 0.5, True, 0.2, 100.0)
    renderings, history = model.apply(
        variables, rays, 0.5, True, 0.2, 100.0,
        rngs={"sampling": jax.random.PRNGKey(2)})
    assert len(renderings) == 3 and len(history) == 3
    assert renderings[-1]["rgb"].shape == (4, 3)
    assert renderings[-1]["depth"].shape == (4,)
    assert history[0]["sdist"].shape == (4, 9)    # prop: 8 samples
    assert history[-1]["sdist"].shape == (4, 5)   # nerf: 4 samples
    for r in renderings:
        assert np.all(np.isfinite(np.asarray(r["rgb"])))


def test_losses_finite_and_grads_flow():
    model = _tiny_model()
    rays = _rays()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, 0.5, True, 0.2, 100.0)
    target = jnp.full((4, 3), 0.5)

    def loss_fn(params):
        renderings, history = model.apply(
            {"params": params}, rays, 0.5, True, 0.2, 100.0,
            rngs={"sampling": jax.random.PRNGKey(2)})
        mse = jnp.mean((renderings[-1]["rgb"] - target) ** 2)
        return (jnp.sqrt(mse + 1e-6) + interlevel_loss(history)
                + 0.01 * distortion_loss(history))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # the NeRF MLP must receive gradient
    g_nerf = grads["nerf_mlp"]["pts_0"]["kernel"]
    assert float(jnp.abs(g_nerf).max()) > 0
    # prop MLPs receive gradient only through the interlevel loss
    g_prop = grads["prop_mlp_0"]["pts_0"]["kernel"]
    assert float(jnp.abs(g_prop).max()) > 0


@pytest.mark.slow
def test_mip_overfit_smoke(micro_scene):
    """A tiny MipNeRF-360 fits a couple of fixture views."""
    import optax
    from neo360_tpu.data.nerds360 import NeRDS360
    from neo360_tpu.ops import losses as L
    from neo360_tpu.train import loop as tl

    ds = NeRDS360(micro_scene, split="train", img_wh=(40, 30))
    buffers = ds.ray_buffers()
    n = 2 * 40 * 30
    buffers = {k: v[:n] for k, v in buffers.items()}

    model = _tiny_model()
    sample = {k: buffers[k][:2] for k in ("rays_o", "rays_d", "viewdirs",
                                          "radii")}
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        sample, 0.0, True, ds.near, ds.far)["params"]
    opt = optax.adam(2e-3)

    def loss_fn(params, batch, key):
        rays = {k: batch[k] for k in ("rays_o", "rays_d", "viewdirs",
                                      "radii")}
        renderings, history = model.apply(
            {"params": params}, rays, 1.0, True, ds.near, ds.far,
            rngs={"sampling": key})
        mse = L.img2mse(renderings[-1]["rgb"], batch["target"])
        loss = (jnp.sqrt(mse + 1e-6) + interlevel_loss(history)
                + 0.01 * distortion_loss(history))
        return loss, {"mse": mse}

    step = tl.make_train_step(loss_fn, opt)
    state = tl.create_train_state(params, opt)
    runner = tl.make_buffer_trainer(step, batch_size=128, steps_per_call=50)
    key = jax.random.PRNGKey(3)
    state, m0 = runner(state, buffers, key)
    mse0 = float(m0["mse"])
    for i in range(3):
        state, m = runner(state, buffers, jax.random.fold_in(key, i))
    assert float(m["mse"]) < mse0 * 0.5, (mse0, float(m["mse"]))
