"""jit-vs-eager parity + NaN guards.

The reference's closest analogue to race detection is deterministic-cuDNN
toggles and fixed seeds (SURVEY §5 "Race detection"); the TPU-native
equivalent is asserting that tracing/compilation does not change numerics
(jit == eager) and that no model forward produces NaNs under
jax.debug_nans.
"""

import numpy as np
import pytest


def _neo360_setup(multi_scene_root):
    import jax
    import jax.numpy as jnp
    from neo360_tpu.data.nerds360_ae import NeRDS360AE
    from neo360_tpu.models.neo360 import NeRFTP

    ds = NeRDS360AE(multi_scene_root, split="train", img_wh=(40, 30),
                    ray_batch_size=24)
    rng = np.random.default_rng(0)
    sample = ds.sample_train(rng)
    rays = {k: jnp.asarray(sample[k]) for k in
            ("rays_o", "rays_d", "viewdirs", "src_imgs", "src_poses",
             "src_focal", "src_c")}
    model = NeRFTP(num_coarse_samples=4, num_fine_samples=6,
                   grid_size=(8, 8, 4), lift_dim=16, encoder_width=32,
                   use_proposal=True, num_prop_samples=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, False, False)
    return model, variables, rays


def test_neo360_jit_matches_eager(multi_scene_root):
    import jax

    model, variables, rays = _neo360_setup(multi_scene_root)

    def fwd(variables, rays):
        out = model.apply(variables, rays, False, False)
        return out[-1]["rgb"]

    eager = fwd(variables, rays)
    jitted = jax.jit(fwd)(variables, rays)
    np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager),
                               rtol=2e-5, atol=2e-5)


def test_neo360_no_nans_under_debug_nans(multi_scene_root):
    import jax

    model, variables, rays = _neo360_setup(multi_scene_root)
    with jax.debug_nans(True):
        out = model.apply(variables, rays, False, False)
        np.asarray(out[-1]["rgb"])  # force evaluation under the guard


def test_vanilla_jit_matches_eager():
    import jax
    import jax.numpy as jnp
    from neo360_tpu.models.vanilla import VanillaNeRF

    rng = np.random.default_rng(3)
    n = 16
    d = rng.normal(size=(n, 3))
    rays = {
        "rays_o": jnp.asarray(rng.uniform(-.2, .2, (n, 3)), jnp.float32),
        "rays_d": jnp.asarray(d, jnp.float32),
        "viewdirs": jnp.asarray(d / np.linalg.norm(d, axis=-1,
                                                   keepdims=True),
                                jnp.float32),
    }
    model = VanillaNeRF(num_coarse_samples=8, num_fine_samples=8)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, False, False, 0.2, 3.0)

    def fwd(variables, rays):
        out = model.apply(variables, rays, False, False, 0.2, 3.0)
        return out[-1]["rgb"]

    eager = fwd(variables, rays)
    jitted = jax.jit(fwd)(variables, rays)
    np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager),
                               rtol=2e-5, atol=2e-5)


def test_train_step_grads_finite(multi_scene_root):
    """One NeO-360 train step produces finite loss and finite grads."""
    import jax
    import jax.numpy as jnp
    import optax
    from neo360_tpu.ops import losses as L

    model, variables, rays = _neo360_setup(multi_scene_root)
    target = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, rays["rays_o"].shape),
        jnp.float32)

    def loss_fn(params):
        out, new_state = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            rays, True, False, train=True,
            rngs={"sampling": jax.random.PRNGKey(5)},
            mutable=["batch_stats"])
        return L.img2mse(out[-1]["rgb"], target)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert flat and all(np.all(np.isfinite(np.asarray(g))) for g in flat)
