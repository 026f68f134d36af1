"""Mixed-precision (bf16 compute, f32 params) smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np


def _batch(multi_scene_root, n_rays=8):
    from neo360_tpu.data.nerds360_ae import NeRDS360AE
    ds = NeRDS360AE(multi_scene_root, split="train", img_wh=(40, 30),
                    ray_batch_size=n_rays, dest_views_per_sample=4)
    s = ds.sample_train(np.random.default_rng(0))
    return {k: jnp.asarray(v) for k, v in s.items()}


RK = ("rays_o", "rays_d", "viewdirs", "src_imgs", "src_poses", "src_focal",
      "src_c")


def test_neo360_bf16_matches_f32_loosely(multi_scene_root):
    from neo360_tpu.models.neo360 import NeRFTP

    batch = _batch(multi_scene_root)
    rays = {k: batch[k] for k in RK}
    kw = dict(num_coarse_samples=6, num_fine_samples=6, grid_size=(8, 8, 8),
              remat_encoder=False)
    m32 = NeRFTP(**kw)
    m16 = NeRFTP(compute_dtype=jnp.bfloat16, **kw)
    variables = m32.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, False, False)
    # params are f32 in both; same tree works for both models
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)

    out32 = m32.apply(variables, rays, False, False)
    out16 = m16.apply(variables, rays, False, False)
    a = np.asarray(out32[1]["rgb"])
    b = np.asarray(out16[1]["rgb"])
    assert b.dtype == np.float32            # cast back at the boundary
    assert np.all(np.isfinite(b))
    assert np.mean(np.abs(a - b)) < 0.05    # bf16 noise, not divergence


def test_staged_trainer_equals_sequential_steps():
    import optax
    from neo360_tpu.train import loop as tl

    def loss_fn(params, batch, key):
        pred = batch["x"] @ params["w"]
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, {"loss": loss}

    opt = optax.sgd(0.1)
    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.normal(size=(4, 2)), jnp.float32)}
    step = tl.make_train_step(loss_fn, opt)

    k = 5
    batches = {
        "x": jnp.asarray(rng.normal(size=(k, 16, 4)), jnp.float32),
        "y": jnp.asarray(rng.normal(size=(k, 16, 2)), jnp.float32)}

    # sequential reference (replicating the scan's key folding)
    state_a = tl.create_train_state(params, opt)
    key = jax.random.PRNGKey(0)
    for i in range(k):
        key, sub = jax.random.split(key)
        batch = {kk: v[i] for kk, v in batches.items()}
        state_a, m_a = step(state_a, batch, sub)

    staged = tl.make_staged_trainer(step)
    state_b = tl.create_train_state(params, opt)
    state_b, m_b = staged(state_b, batches, jax.random.PRNGKey(0))

    np.testing.assert_allclose(np.asarray(state_a.params["w"]),
                               np.asarray(state_b.params["w"]), atol=1e-6)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-6)
    assert int(state_b.step) == k


def test_stack_batches():
    from neo360_tpu.train.loop import stack_batches
    samples = [{"a": np.ones((2, 3)) * i, "b": np.zeros(4)} for i in range(3)]
    out = stack_batches(samples)
    assert out["a"].shape == (3, 2, 3)
    assert out["b"].shape == (3, 4)
    np.testing.assert_allclose(out["a"][2], 2.0)
