"""Scene-stage (encode-once) trainer: the TPU-first restructuring that runs
the GridEncoder once per K-step stage (train/loop.py
make_scene_stage_trainer). Checks:
  - the accumulated-cotangent encoder gradient is EXACT: for K=1 the
    encoder update must match a direct joint value_and_grad of the same
    loss at the same point;
  - ray params move every step while encoder params move once per stage;
  - the dataset's stage sampler has the right shapes and shares one scene.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from neo360_tpu.models.neo360 import (NeRFTP, SRC_KEYS, make_scene_stage_fns,
                                      neo360_distortion_loss,
                                      neo360_interlevel_loss)
from neo360_tpu.ops.losses import img2mse
from neo360_tpu.train import loop as tl
from __graft_entry__ import _example_inputs

RAY_KEYS = ("rays_o", "rays_d", "viewdirs") + SRC_KEYS


def _tiny_model():
    return NeRFTP(use_proposal=True, num_prop_samples=4, num_fine_samples=4,
                  grid_size=(8, 8, 8), remat_encoder=False)


def _setup(n_rays=16):
    model = _tiny_model()
    batch = {k: jnp.asarray(v)
             for k, v in _example_inputs(n_rays=n_rays, hw=(24, 32)).items()}
    rays = {k: batch[k] for k in RAY_KEYS}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, True, False)
    return model, batch, variables


@pytest.mark.slow
def test_scene_stage_k1_matches_joint_grad():
    model, batch, variables = _setup()
    encode_fn, loss_fn = make_scene_stage_fns(model)
    # sgd(1.0): new = old - grad, so the stage's encoder GRADIENT is
    # recoverable exactly and compared against the direct joint gradient
    enc_opt = optax.sgd(1.0)
    ray_opt = optax.sgd(0.0)        # freeze rays: isolate the encoder path
    run = tl.make_scene_stage_trainer(encode_fn, loss_fn, enc_opt, ray_opt)
    state = tl.create_scene_stage_state(variables["params"], enc_opt,
                                        ray_opt, variables["batch_stats"])

    # snapshot: the stage trainer donates its state buffers
    params0 = jax.tree_util.tree_map(np.asarray,
                                     jax.device_get(variables["params"]))
    bs0 = jax.tree_util.tree_map(np.asarray,
                                 jax.device_get(variables["batch_stats"]))

    src = {k: batch[k] for k in SRC_KEYS}
    ray_batches = {k: batch[k][None] for k in ("rays_o", "rays_d",
                                               "viewdirs", "target")}
    key = jax.random.PRNGKey(7)
    new_state, metrics = run(state, src, ray_batches, key)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["mse"]))

    # direct joint gradient of the same loss at the same point & same rng
    _, k_step = jax.random.split(key)

    def joint_loss(params):
        rays = {k: batch[k] for k in RAY_KEYS}
        out, _ = model.apply(
            {"params": params, "batch_stats": bs0},
            rays, True, False, train=True, rngs={"sampling": k_step},
            mutable=["batch_stats"])
        l1 = img2mse(out[1]["rgb"], batch["target"])
        return l1 + neo360_interlevel_loss(out) + neo360_distortion_loss(out)

    g = jax.grad(joint_loss)(params0)
    g_enc, _ = tl.partition_encoder_params(g)
    enc0, _ = tl.partition_encoder_params(params0)

    # stage gradient = enc0 - new_enc (sgd lr=1); equals the joint gradient
    # up to f32 reassociation (the two paths fuse the backward differently).
    # Leaves whose TRUE gradient is analytically zero (conv biases absorbed
    # by train-mode BatchNorm, softmax-invariant pillar logit biases) carry
    # only cancellation noise in both paths and are skipped: noise is not
    # reproducible across fusion orders.
    got = jax.device_get(new_state.enc_params)
    global_scale = max(float(np.max(np.abs(np.asarray(leaf))))
                       for leaf in jax.tree_util.tree_leaves(g_enc))
    compared = 0
    for key_top in g_enc:
        flat_g = jax.tree_util.tree_flatten(g_enc[key_top])[0]
        flat_0 = jax.tree_util.tree_flatten(enc0[key_top])[0]
        flat_n = jax.tree_util.tree_flatten(got[key_top])[0]
        for direct, p0, pn in zip(flat_g, flat_0, flat_n):
            stage_grad = np.asarray(p0, np.float64) - np.asarray(
                pn, np.float64)
            direct = np.asarray(direct, np.float64)
            leaf_max = max(np.max(np.abs(direct)), np.max(np.abs(stage_grad)))
            if leaf_max < 5e-2 * global_scale:
                continue                     # noise-only (zero-grad) leaf
            np.testing.assert_allclose(
                stage_grad / global_scale, direct / global_scale,
                rtol=5e-2, atol=1e-3)
            compared += 1
    assert compared >= 10, f"only {compared} leaves had comparable gradients"


@pytest.mark.slow
def test_scene_stage_k2_accumulation_matches_mean_grad():
    """K=2 accumulation exactness: with rays frozen (sgd 0), the stage's
    encoder gradient must equal the MEAN of the two steps' joint gradients
    (same tables, same ray params, per-step rng keys from the scan's split
    chain) — verifies the cotangent accumulation and key sequencing that
    only exist at K>1."""
    model, batch, variables = _setup()
    encode_fn, loss_fn = make_scene_stage_fns(model)
    enc_opt = optax.sgd(1.0)
    ray_opt = optax.sgd(0.0)
    run = tl.make_scene_stage_trainer(encode_fn, loss_fn, enc_opt, ray_opt)
    state = tl.create_scene_stage_state(variables["params"], enc_opt,
                                        ray_opt, variables["batch_stats"])
    params0 = jax.tree_util.tree_map(np.asarray,
                                     jax.device_get(variables["params"]))
    bs0 = jax.tree_util.tree_map(np.asarray,
                                 jax.device_get(variables["batch_stats"]))

    src = {k: batch[k] for k in SRC_KEYS}
    # two DIFFERENT ray batches: second = first rolled (different pixels)
    rb = {k: jnp.stack([batch[k], jnp.roll(batch[k], 3, axis=0)])
          for k in ("rays_o", "rays_d", "viewdirs", "target")}
    rb_h = jax.device_get(rb)
    key = jax.random.PRNGKey(11)
    new_state, metrics = run(state, src, rb, key)
    assert int(new_state.step) == 2
    assert np.isfinite(float(metrics["mse"]))

    # per-step keys as the scan body splits them
    k_carry, k1 = jax.random.split(key)
    _, k2 = jax.random.split(k_carry)

    def joint_loss(params, step_i, step_key):
        rays = {k: jnp.asarray(rb_h[k][step_i]) for k in
                ("rays_o", "rays_d", "viewdirs")}
        rays.update({k: batch[k] for k in SRC_KEYS})
        out, _ = model.apply(
            {"params": params, "batch_stats": bs0},
            rays, True, False, train=True, rngs={"sampling": step_key},
            mutable=["batch_stats"])
        l1 = img2mse(out[1]["rgb"], jnp.asarray(rb_h["target"][step_i]))
        return l1 + neo360_interlevel_loss(out) + neo360_distortion_loss(out)

    g1 = jax.grad(joint_loss)(params0, 0, k1)
    g2 = jax.grad(joint_loss)(params0, 1, k2)
    g = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g1, g2)
    g_enc, _ = tl.partition_encoder_params(g)
    enc0, _ = tl.partition_encoder_params(params0)
    got = jax.device_get(new_state.enc_params)
    global_scale = max(float(np.max(np.abs(np.asarray(leaf))))
                       for leaf in jax.tree_util.tree_leaves(g_enc))
    compared = 0
    for key_top in g_enc:
        flat_g = jax.tree_util.tree_flatten(g_enc[key_top])[0]
        flat_0 = jax.tree_util.tree_flatten(enc0[key_top])[0]
        flat_n = jax.tree_util.tree_flatten(got[key_top])[0]
        for direct, p0, pn in zip(flat_g, flat_0, flat_n):
            stage_grad = np.asarray(p0, np.float64) - np.asarray(
                pn, np.float64)
            direct = np.asarray(direct, np.float64)
            leaf_max = max(np.max(np.abs(direct)),
                           np.max(np.abs(stage_grad)))
            if leaf_max < 5e-2 * global_scale:
                continue
            np.testing.assert_allclose(
                stage_grad / global_scale, direct / global_scale,
                rtol=5e-2, atol=1e-3)
            compared += 1
    assert compared >= 10, f"only {compared} leaves compared"


@pytest.mark.slow
def test_scene_mixed_k1_matches_joint_grad():
    """SCENE-MIXED exactness: a K=1, S=2 mixed stage's encoder update must
    equal the direct joint gradient of mean-over-scenes loss at the same
    point with the same per-scene rng keys — catches any scene/table pairing
    or cotangent-accumulation bug in the mixed path."""
    model, batch, variables = _setup()
    encode_fn, loss_fn = make_scene_stage_fns(model, mixed=True)
    enc_opt = optax.sgd(1.0)
    ray_opt = optax.sgd(0.0)
    run = tl.make_scene_stage_trainer(encode_fn, loss_fn, enc_opt, ray_opt)
    state = tl.create_scene_stage_state(variables["params"], enc_opt,
                                        ray_opt, variables["batch_stats"])
    params0 = jax.tree_util.tree_map(np.asarray,
                                     jax.device_get(variables["params"]))
    bs0 = jax.tree_util.tree_map(np.asarray,
                                 jax.device_get(variables["batch_stats"]))

    # two genuinely different scenes: darken scene 1's sources and targets
    src = {k: jnp.stack([batch[k], batch[k]]) for k in SRC_KEYS}
    src["src_imgs"] = src["src_imgs"].at[1].mul(0.5)
    rb = {k: jnp.stack([batch[k], batch[k]])[None]
          for k in ("rays_o", "rays_d", "viewdirs", "target")}
    rb["target"] = rb["target"].at[0, 1].mul(0.5)
    key = jax.random.PRNGKey(7)
    new_state, metrics = run(state, src, rb, key)
    assert np.isfinite(float(metrics["mse"]))

    # direct joint gradient: mean over scenes of the per-scene loss, same
    # per-scene sampling keys as the stage's loss_fn (split of the step key)
    _, k_step = jax.random.split(key)
    keys = jax.random.split(k_step, 2)
    src_h = jax.device_get(src)
    rb_h = jax.device_get(rb)

    def joint_loss(params):
        total = 0.0
        for i in range(2):
            rays = {k: rb_h[k][0, i] for k in ("rays_o", "rays_d",
                                               "viewdirs")}
            rays.update({k: src_h[k][i] for k in SRC_KEYS})
            out, _ = model.apply({"params": params, "batch_stats": bs0},
                                 rays, True, False, train=True,
                                 rngs={"sampling": keys[i]},
                                 mutable=["batch_stats"])
            l1 = img2mse(out[1]["rgb"], rb_h["target"][0, i])
            total += (l1 + neo360_interlevel_loss(out)
                      + neo360_distortion_loss(out))
        return total / 2.0

    g = jax.grad(joint_loss)(params0)
    g_enc, _ = tl.partition_encoder_params(g)
    enc0, _ = tl.partition_encoder_params(params0)
    got = jax.device_get(new_state.enc_params)
    global_scale = max(float(np.max(np.abs(np.asarray(leaf))))
                       for leaf in jax.tree_util.tree_leaves(g_enc))
    compared = 0
    for key_top in g_enc:
        flat_g = jax.tree_util.tree_flatten(g_enc[key_top])[0]
        flat_0 = jax.tree_util.tree_flatten(enc0[key_top])[0]
        flat_n = jax.tree_util.tree_flatten(got[key_top])[0]
        for direct, p0, pn in zip(flat_g, flat_0, flat_n):
            stage_grad = np.asarray(p0, np.float64) - np.asarray(
                pn, np.float64)
            direct = np.asarray(direct, np.float64)
            leaf_max = max(np.max(np.abs(direct)),
                           np.max(np.abs(stage_grad)))
            if leaf_max < 5e-2 * global_scale:
                continue                     # noise-only (zero-grad) leaf
            np.testing.assert_allclose(
                stage_grad / global_scale, direct / global_scale,
                rtol=5e-2, atol=1e-3)
            compared += 1
    assert compared >= 10, f"only {compared} leaves compared"


@pytest.mark.slow
def test_scene_stage_update_cadence():
    """Ray params move every step; encoder params once per stage call."""
    model, batch, variables = _setup()
    encode_fn, loss_fn = make_scene_stage_fns(model)
    enc_opt = optax.adam(1e-3)
    ray_opt = optax.adam(1e-3)
    run = tl.make_scene_stage_trainer(encode_fn, loss_fn, enc_opt, ray_opt)
    state = tl.create_scene_stage_state(variables["params"], enc_opt,
                                        ray_opt, variables["batch_stats"])
    # snapshot: the stage trainer donates its state buffers
    enc_before = jax.tree_util.tree_map(
        np.asarray, jax.device_get(state.enc_params))
    ray_before = jax.tree_util.tree_map(
        np.asarray, jax.device_get(state.ray_params))
    k = 3
    src = {key: batch[key] for key in SRC_KEYS}
    ray_batches = {key: jnp.stack([batch[key]] * k)
                   for key in ("rays_o", "rays_d", "viewdirs", "target")}
    new_state, metrics = run(state, src, ray_batches, jax.random.PRNGKey(3))
    assert int(new_state.step) == k
    ray0 = jax.tree_util.tree_leaves(ray_before)[0]
    ray1 = jax.tree_util.tree_leaves(new_state.ray_params)[0]
    assert not np.allclose(np.asarray(ray0), np.asarray(ray1))
    enc0 = jax.tree_util.tree_leaves(enc_before)[0]
    enc1 = jax.tree_util.tree_leaves(new_state.enc_params)[0]
    assert not np.allclose(np.asarray(enc0), np.asarray(enc1))
    # merged params view keeps checkpoint/render compatibility
    merged = new_state.params
    assert set(merged) == set(variables["params"])


@pytest.mark.slow
def test_scene_mixed_stage_runs_and_mixes():
    """SCENE-MIXED stage (mixed=True): S scenes encoded per stage, every
    step's ray batch (S, B, ...) mixes all scenes. Checks shapes thread,
    metrics are finite, and both param partitions update."""
    model, batch, variables = _setup(n_rays=8)
    encode_fn, loss_fn = make_scene_stage_fns(model, mixed=True)
    enc_opt = optax.adam(1e-3)
    ray_opt = optax.adam(1e-3)
    run = tl.make_scene_stage_trainer(encode_fn, loss_fn, enc_opt, ray_opt)
    state = tl.create_scene_stage_state(variables["params"], enc_opt,
                                        ray_opt, variables["batch_stats"])
    enc_before = jax.tree_util.tree_map(
        np.asarray, jax.device_get(state.enc_params))
    s, k = 2, 3
    # scene axis: same fixture inputs with a brightness perturbation on
    # scene 1 so the two scenes' tables genuinely differ
    src = {key: jnp.stack([batch[key], batch[key]]) for key in SRC_KEYS}
    src["src_imgs"] = src["src_imgs"].at[1].mul(0.5)
    ray_batches = {key: jnp.stack([jnp.stack([batch[key]] * s)] * k)
                   for key in ("rays_o", "rays_d", "viewdirs", "target")}
    new_state, metrics = run(state, src, ray_batches, jax.random.PRNGKey(5))
    assert int(new_state.step) == k
    assert np.isfinite(float(metrics["mse"]))
    enc0 = jax.tree_util.tree_leaves(enc_before)[0]
    enc1 = jax.tree_util.tree_leaves(new_state.enc_params)[0]
    assert not np.allclose(np.asarray(enc0), np.asarray(enc1))


def test_sample_train_stage_mixed(multi_scene_root):
    from neo360_tpu.data.nerds360_ae import NeRDS360AE
    ds = NeRDS360AE(multi_scene_root, "train", (40, 30), 3,
                    ray_batch_size=32)
    rng = np.random.default_rng(0)
    s = ds.sample_train_stage(rng, k_steps=4, n_scenes=2)
    assert s["src_imgs"].shape[:2] == (2, 3)
    assert s["rays_o"].shape == (4, 2, 16, 3)
    assert s["target"].shape == (4, 2, 16, 3)
    # the two scenes' source stacks differ
    assert not np.allclose(s["src_imgs"][0], s["src_imgs"][1])
    with pytest.raises(ValueError):
        ds.sample_train_stage(rng, 2, n_scenes=3)


def test_partition_encoder_params():
    model, batch, variables = _setup(n_rays=8)
    enc, ray = tl.partition_encoder_params(variables["params"])
    assert "encoder" in enc
    assert all(k == "encoder" or k.startswith("local_proj") for k in enc)
    assert any("fine_mlp" in k for k in ray)
    assert set(enc) | set(ray) == set(variables["params"])


def test_sample_train_stage(multi_scene_root):
    from neo360_tpu.data.nerds360_ae import NeRDS360AE
    ds = NeRDS360AE(multi_scene_root, "train", (40, 30), 3,
                    ray_batch_size=32)
    rng = np.random.default_rng(0)
    s = ds.sample_train_stage(rng, k_steps=4)
    assert s["src_imgs"].shape[0] == 3
    assert s["rays_o"].shape == (4, 32, 3)
    assert s["target"].shape == (4, 32, 3)
    # ray batches differ between steps (independent draws)
    assert not np.allclose(s["rays_o"][0], s["rays_o"][1])
