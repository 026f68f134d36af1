import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neo360_tpu.models.vanilla import VanillaNeRF
from neo360_tpu.ops import losses
from neo360_tpu.train import loop as train_loop
from neo360_tpu.train.schedules import nerf_schedule


def _rays(b=8, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-0.2, 0.2, size=(b, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(b, 3)), jnp.float32)
    v = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return {"rays_o": o, "rays_d": d, "viewdirs": v}


def test_forward_shapes_and_levels():
    model = VanillaNeRF(num_coarse_samples=8, num_fine_samples=8)
    rays = _rays(4)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, True, False, 0.2, 3.0)["params"]
    out = model.apply({"params": params}, rays, True, False, 0.2, 3.0,
                      rngs={"sampling": jax.random.PRNGKey(2)})
    assert len(out) == 2
    assert out[0]["rgb"].shape == (4, 3)
    assert out[0]["t_vals"].shape == (4, 9)        # coarse: N+1 edges
    assert out[1]["t_vals"].shape == (4, 17)       # merged coarse+fine
    assert np.all(np.isfinite(np.asarray(out[1]["rgb"])))


def test_deterministic_eval_reproducible():
    model = VanillaNeRF(num_coarse_samples=8, num_fine_samples=8)
    rays = _rays(4)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, True, False, 0.2, 3.0)["params"]
    a = model.apply({"params": params}, rays, False, False, 0.2, 3.0)
    b = model.apply({"params": params}, rays, False, False, 0.2, 3.0)
    np.testing.assert_array_equal(np.asarray(a[1]["rgb"]),
                                  np.asarray(b[1]["rgb"]))


@pytest.mark.slow
def test_overfit_single_image_psnr_rises(micro_scene):
    """End-to-end: tiny vanilla NeRF overfits a few fixture views on CPU."""
    from neo360_tpu.data.nerds360 import NeRDS360

    ds = NeRDS360(micro_scene, split="train", img_wh=(40, 30))
    buffers = ds.ray_buffers()
    # keep 4 images' worth of rays to stay fast on the CPU test runner
    n = 4 * 40 * 30
    buffers = {k: v[:n] for k, v in buffers.items()}
    buffers = {k: buffers[k] for k in ("rays_o", "rays_d", "viewdirs",
                                       "target")}

    model = VanillaNeRF(num_coarse_samples=12, num_fine_samples=12)
    sample_rays = {k: buffers[k][:2] for k in ("rays_o", "rays_d", "viewdirs")}
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        sample_rays, True, False, ds.near, ds.far)["params"]

    optimizer = optax.adam(nerf_schedule(5e-3, 5e-4, 400, delay_steps=0))

    def loss_fn(params, batch, key):
        rays = {k: batch[k] for k in ("rays_o", "rays_d", "viewdirs")}
        out = model.apply({"params": params}, rays, True, False,
                          ds.near, ds.far, rngs={"sampling": key})
        loss0 = losses.img2mse(out[0]["rgb"], batch["target"])
        loss1 = losses.img2mse(out[1]["rgb"], batch["target"])
        return loss0 + loss1, {"mse_fine": loss1}

    step = train_loop.make_train_step(loss_fn, optimizer)
    state = train_loop.create_train_state(params, optimizer)
    runner = train_loop.make_buffer_trainer(step, batch_size=256,
                                            steps_per_call=100)

    key = jax.random.PRNGKey(42)
    state, m0 = runner(state, buffers, key)
    psnr0 = float(losses.mse2psnr(m0["mse_fine"]))
    for i in range(3):
        key = jax.random.fold_in(key, i)
        state, m = runner(state, buffers, key)
    psnr1 = float(losses.mse2psnr(m["mse_fine"]))
    assert psnr1 > psnr0 + 2.0, (psnr0, psnr1)
    assert psnr1 > 15.0, psnr1
