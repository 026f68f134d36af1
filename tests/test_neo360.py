import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neo360_tpu.models.neo360 import (NeRFTP, NeRFTPMLP,
                                      neo360_distortion_loss)
from neo360_tpu.nn.triplane import GridEncoder, index_grid


def _tiny_model(**kw):
    cfg = dict(num_coarse_samples=6, num_fine_samples=6,
               grid_size=(8, 8, 8), remat_encoder=False)
    cfg.update(kw)
    return NeRFTP(**cfg)


def _batch(multi_scene_root, n_rays=8):
    from neo360_tpu.data.nerds360_ae import NeRDS360AE
    ds = NeRDS360AE(multi_scene_root, split="train", img_wh=(40, 30),
                    ray_batch_size=n_rays, dest_views_per_sample=4)
    s = ds.sample_train(np.random.default_rng(0))
    return ds, {k: jnp.asarray(v) for k, v in s.items()}


RAY_KEYS = ("rays_o", "rays_d", "viewdirs", "src_imgs", "src_poses",
            "src_focal", "src_c")


def test_mlp_shapes_and_fusion():
    mlp = NeRFTPMLP(netwidth=32, netwidth_condition=16)
    nv, b, s = 3, 4, 6
    x = jnp.ones((nv * b, s, 63))
    vd = jnp.ones((nv * b, 27))
    wl = jnp.ones((nv * b, s, 128))
    ll = jnp.ones((nv * b, s, 512))
    params = mlp.init(jax.random.PRNGKey(0), x, vd, wl, ll, nv)
    rgb, dens = mlp.apply(params, x, vd, wl, ll, nv)
    assert rgb.shape == (b, s, 3)
    assert dens.shape == (b, s, 1)


def test_grid_encoder_planes(multi_scene_root):
    _, batch = _batch(multi_scene_root)
    enc = GridEncoder(grid_size=(8, 8, 8), plane_hw=(24, 32))
    variables = enc.init(jax.random.PRNGKey(0), batch["src_imgs"],
                         batch["src_poses"], batch["src_focal"],
                         batch["src_c"], False)
    (pxz, pxy, pyz), pixel_latent = enc.apply(
        variables, batch["src_imgs"], batch["src_poses"],
        batch["src_focal"], batch["src_c"], False)
    assert pxz.shape == (3, 24, 32, 128)
    assert pxy.shape == (3, 24, 32, 128)
    assert pyz.shape == (3, 24, 32, 128)
    assert pixel_latent.shape == (3, 15, 20, 512)
    for p in (pxz, pxy, pyz):
        assert np.all(np.isfinite(np.asarray(p)))


def test_index_grid_sums_planes(multi_scene_root):
    _, batch = _batch(multi_scene_root)
    rng = np.random.default_rng(0)
    planes = tuple(jnp.asarray(rng.normal(size=(3, 8, 10, 16)), jnp.float32)
                   for _ in range(3))
    samples = jnp.asarray(rng.uniform(-0.5, 0.5, size=(4, 5, 3)), jnp.float32)
    out = index_grid(samples, planes, batch["src_poses"], 3)
    assert out.shape == (3, 20, 16)
    assert np.all(np.isfinite(np.asarray(out)))


def test_neo360_forward_and_composition(multi_scene_root):
    ds, batch = _batch(multi_scene_root)
    model = _tiny_model()
    rays = {k: batch[k] for k in RAY_KEYS}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, True, False)
    out = model.apply(variables, rays, True, False, out_depth=True,
                      rngs={"sampling": jax.random.PRNGKey(2)})
    assert len(out) == 2
    fine = out[1]
    assert fine["rgb"].shape == (8, 3)
    assert fine["depth"].shape == (8,)
    # comp = fg + bg_lambda * bg
    np.testing.assert_allclose(
        np.asarray(fine["rgb"]),
        np.asarray(fine["fg_rgb"] + fine["bg_lambda"] * fine["bg_rgb"]),
        rtol=1e-5, atol=1e-6)
    assert np.all(np.asarray(fine["bg_lambda"]) >= 0)
    assert np.all(np.asarray(fine["bg_lambda"]) <= 1 + 1e-5)
    for k in ("rgb", "fg_weights", "bg_weights", "fg_sdist", "bg_sdist"):
        assert np.all(np.isfinite(np.asarray(fine[k]))), k


def test_neo360_encode_once_matches_inline(multi_scene_root):
    ds, batch = _batch(multi_scene_root, n_rays=4)
    model = _tiny_model()
    rays = {k: batch[k] for k in RAY_KEYS}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, True, False)
    encoded = model.apply(variables, rays["src_imgs"], rays["src_poses"],
                          rays["src_focal"], rays["src_c"],
                          method=NeRFTP.encode)
    a = model.apply(variables, rays, False, False)
    b = model.apply(variables, rays, False, False, encoded=encoded)
    np.testing.assert_allclose(np.asarray(a[1]["rgb"]),
                               np.asarray(b[1]["rgb"]), atol=1e-6)


def test_neo360_cached_pixel_latent_matches_inline(multi_scene_root):
    """Optimize-mode prefix caching (cli.run_train): a precomputed frozen
    spatial-encoder latent passed as `pixel_latent` must give bitwise the
    inline-encode forward (reference freeze protocol
    neo360/model.py:957-981 freezes exactly that module)."""
    ds, batch = _batch(multi_scene_root, n_rays=4)
    model = _tiny_model()
    rays = {k: batch[k] for k in RAY_KEYS}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, True, False)
    pl = model.apply(variables, rays["src_imgs"],
                     method=NeRFTP.encode_images)
    assert pl.ndim == 4 and pl.shape[0] == rays["src_imgs"].shape[0]
    a = model.apply(variables, rays, False, False)
    b = model.apply(variables, rays, False, False, pixel_latent=pl)
    np.testing.assert_array_equal(np.asarray(a[1]["rgb"]),
                                  np.asarray(b[1]["rgb"]))


def test_encode_images_under_remat(multi_scene_root):
    """encode_images must reach the spatial encoder through the nn.remat
    wrapper too (production models default remat_encoder=True; the optimize
    cached-latent path calls it on the wrapped encoder)."""
    ds, batch = _batch(multi_scene_root, n_rays=4)
    model = _tiny_model(remat_encoder=True)
    rays = {k: batch[k] for k in RAY_KEYS}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, True, False)
    pl = model.apply(variables, rays["src_imgs"],
                     method=NeRFTP.encode_images)
    ref = _tiny_model(remat_encoder=False).apply(
        variables, rays["src_imgs"], method=NeRFTP.encode_images)
    np.testing.assert_array_equal(np.asarray(pl), np.asarray(ref))


@pytest.mark.slow
def test_neo360_grads_flow(multi_scene_root):
    ds, batch = _batch(multi_scene_root, n_rays=4)
    model = _tiny_model()
    rays = {k: batch[k] for k in RAY_KEYS}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, True, False)
    target = batch["target"]

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            rays, True, False, rngs={"sampling": jax.random.PRNGKey(2)})
        mse = jnp.mean((out[-1]["rgb"] - target) ** 2)
        return mse + neo360_distortion_loss(out)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # every major component receives gradient
    for name in ("encoder", "fg_fine_mlp", "bg_fine_mlp"):
        sub = jax.tree_util.tree_leaves(grads[name])
        assert any(float(jnp.abs(g).max()) > 0 for g in sub), name


def test_distortion_loss_positive(multi_scene_root):
    ds, batch = _batch(multi_scene_root, n_rays=4)
    model = _tiny_model()
    rays = {k: batch[k] for k in RAY_KEYS}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, True, False)
    out = model.apply(variables, rays, False, False)
    val = float(neo360_distortion_loss(out))
    assert np.isfinite(val) and val >= 0


@pytest.mark.slow
def test_neo360_overfit_smoke(multi_scene_root):
    """Tiny NeO-360 fits a single scene's rays (few-shot machinery e2e)."""
    import optax
    from neo360_tpu.data.nerds360_ae import NeRDS360AE
    from neo360_tpu.ops import losses as L
    from neo360_tpu.train import loop as tl

    ds = NeRDS360AE(multi_scene_root, split="train", img_wh=(40, 30),
                    ray_batch_size=64, dest_views_per_sample=3)
    model = _tiny_model(num_coarse_samples=8, num_fine_samples=8)
    rng = np.random.default_rng(0)
    s0 = {k: jnp.asarray(v) for k, v in ds.sample_train(rng).items()}
    rays0 = {k: s0[k] for k in RAY_KEYS}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays0, True, False)
    opt = optax.adam(5e-4)

    def loss_fn(p, batch, key):
        rays = {k: batch[k] for k in RAY_KEYS}
        out = model.apply(
            {"params": p["params"], "batch_stats": variables["batch_stats"]},
            rays, True, False, rngs={"sampling": key})
        l0 = L.img2mse(out[0]["rgb"], batch["target"])
        l1 = L.img2mse(out[1]["rgb"], batch["target"])
        return l0 + l1 + neo360_distortion_loss(out), {"mse": l1}

    step = jax.jit(tl.make_train_step(loss_fn, opt))
    state = tl.create_train_state(dict(variables), opt)
    key = jax.random.PRNGKey(3)
    mses = []
    for i in range(30):
        s = {k: jnp.asarray(v) for k, v in ds.sample_train(rng).items()}
        batch = {k: s[k] for k in RAY_KEYS + ("target",)}
        state, m = step(state, batch, jax.random.fold_in(key, i))
        mses.append(float(m["mse"]))
    assert np.isfinite(mses).all()
    assert np.mean(mses[-5:]) < np.mean(mses[:5]), mses


def test_index_grid_tables_matches(multi_scene_root):
    from neo360_tpu.nn.triplane import index_grid_tables
    from neo360_tpu.ops.interpolate import build_corner_table
    _, batch = _batch(multi_scene_root)
    rng = np.random.default_rng(1)
    planes = tuple(jnp.asarray(rng.normal(size=(3, 8, 10, 16)), jnp.float32)
                   for _ in range(3))
    samples = jnp.asarray(rng.uniform(-0.9, 0.9, size=(4, 5, 3)), jnp.float32)
    ref = index_grid(samples, planes, batch["src_poses"], 3)
    tables = tuple(build_corner_table(p, "zeros") for p in planes)
    out = index_grid_tables(samples, tables, (8, 10), batch["src_poses"], 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_merged_fg_bg_gather_identity(multi_scene_root):
    """The fine level's merged fg+bg indexing (one tri-plane gather over
    concatenated points; one local gather from a view-stacked branch table)
    must be bitwise the two separate per-branch gathers it replaced."""
    from neo360_tpu.nn.triplane import index_grid_tables
    from neo360_tpu.ops.interpolate import build_corner_table, table_sample
    _, batch = _batch(multi_scene_root)
    rng = np.random.default_rng(2)
    planes = tuple(jnp.asarray(rng.normal(size=(3, 8, 10, 16)), jnp.float32)
                   for _ in range(3))
    tables = tuple(build_corner_table(p, "zeros") for p in planes)
    fg = jnp.asarray(rng.uniform(-0.9, 0.9, size=(4, 5, 3)), jnp.float32)
    bg = jnp.asarray(rng.uniform(-0.9, 0.9, size=(4, 5, 3)), jnp.float32)
    poses = batch["src_poses"]
    merged = index_grid_tables(jnp.concatenate([fg, bg], axis=0), tables,
                               (8, 10), poses, 3)
    ref_fg = index_grid_tables(fg, tables, (8, 10), poses, 3)
    ref_bg = index_grid_tables(bg, tables, (8, 10), poses, 3)
    np.testing.assert_array_equal(np.asarray(merged[:, :20]),
                                  np.asarray(ref_fg))
    np.testing.assert_array_equal(np.asarray(merged[:, 20:]),
                                  np.asarray(ref_bg))
    # local: stacked (2NV) table + concatenated uv == per-branch sampling
    m_fg = jnp.asarray(rng.normal(size=(3, 8, 10, 16)), jnp.float32)
    m_bg = jnp.asarray(rng.normal(size=(3, 8, 10, 16)), jnp.float32)
    t_stack = build_corner_table(jnp.concatenate([m_fg, m_bg], axis=0),
                                 "border")
    uv_fg = jnp.asarray(rng.uniform(-1.2, 1.2, size=(3, 20, 2)), jnp.float32)
    uv_bg = jnp.asarray(rng.uniform(-1.2, 1.2, size=(3, 20, 2)), jnp.float32)
    lat = table_sample(t_stack, jnp.concatenate([uv_fg, uv_bg], axis=0),
                       (8, 10), padding_mode="border")
    ref_lfg = table_sample(build_corner_table(m_fg, "border"), uv_fg,
                           (8, 10), padding_mode="border")
    ref_lbg = table_sample(build_corner_table(m_bg, "border"), uv_bg,
                           (8, 10), padding_mode="border")
    np.testing.assert_array_equal(np.asarray(lat[:3]), np.asarray(ref_lfg))
    np.testing.assert_array_equal(np.asarray(lat[3:]), np.asarray(ref_lbg))


def test_neo360_proposal_forward_and_loss(multi_scene_root):
    from neo360_tpu.models.neo360 import (neo360_distortion_loss,
                                          neo360_interlevel_loss)
    ds, batch = _batch(multi_scene_root)
    model = _tiny_model(use_proposal=True, num_prop_samples=8,
                        num_fine_samples=6)
    rays = {k: batch[k] for k in RAY_KEYS}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, True, False)
    out = model.apply(variables, rays, True, False, out_depth=True,
                      rngs={"sampling": jax.random.PRNGKey(2)})
    assert len(out) == 2
    prop, fine = out
    # prop level: 8+1 unconditioned points, rgb contributions are zero
    assert prop["fg_weights"].shape == (8, 9)
    np.testing.assert_array_equal(np.asarray(prop["fg_rgb"]), 0.0)
    # fine level: only 6+1 resampled conditioned points (no merge)
    assert fine["fg_weights"].shape == (8, 7)
    assert fine["rgb"].shape == (8, 3)
    np.testing.assert_allclose(
        np.asarray(fine["rgb"]),
        np.asarray(fine["fg_rgb"] + fine["bg_lambda"] * fine["bg_rgb"]),
        rtol=1e-5, atol=1e-6)
    il = float(neo360_interlevel_loss(out))
    dl = float(neo360_distortion_loss(out))
    assert np.isfinite(il) and il >= 0
    assert np.isfinite(dl)
    # prop params exist, conditioned coarse MLPs do not
    assert "fg_prop_mlp" in variables["params"]
    assert "fg_coarse_mlp" not in variables["params"]


@pytest.mark.slow
def test_neo360_proposal_grads_reach_prop_mlp(multi_scene_root):
    from neo360_tpu.models.neo360 import neo360_interlevel_loss
    from neo360_tpu.ops import losses as L
    ds, batch = _batch(multi_scene_root, n_rays=4)
    model = _tiny_model(use_proposal=True, num_prop_samples=6,
                        num_fine_samples=4)
    rays = {k: batch[k] for k in RAY_KEYS}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, True, False)

    def loss_fn(params):
        out = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          rays, True, False,
                          rngs={"sampling": jax.random.PRNGKey(3)})
        return (L.img2mse(out[1]["rgb"], batch["target"])
                + neo360_interlevel_loss(out))

    grads = jax.grad(loss_fn)(variables["params"])
    g_fine = np.asarray(grads["fg_fine_mlp"]["pts_0"]["kernel"])
    g_enc = jax.tree_util.tree_leaves(grads["encoder"])
    assert np.any(g_fine != 0)
    assert any(np.any(np.asarray(g) != 0) for g in g_enc)
    # note: prop-MLP grads may be exactly 0 at init (the prop histogram can
    # fully bound the resampled fine histogram); the synthetic test below
    # checks the interlevel gradient path instead.


def test_interlevel_loss_gradient_path():
    """When fine mass sits where the prop histogram has none, the bound is
    violated: loss > 0 and the gradient w.r.t. prop weights is nonzero."""
    from neo360_tpu.models.neo360 import neo360_interlevel_loss

    far = jnp.full((2, 1), 1.0)
    fine_t = jnp.asarray([[0.8, 0.85, 0.9], [0.8, 0.85, 0.9]])
    fine_w = jnp.asarray([[0.0, 0.9, 0.05], [0.0, 0.9, 0.05]])
    prop_t = jnp.asarray([[0.0, 0.2, 0.4], [0.0, 0.2, 0.4]])
    bg_t = jnp.asarray([[0.9, 0.5, 0.1], [0.9, 0.5, 0.1]])  # descending
    bg_w = jnp.full((2, 3), 1.0 / 3)

    def loss_of(prop_w):
        results = [
            {"fg_tvals": prop_t, "fg_weights": prop_w, "far": far,
             "bg_tvals": bg_t, "bg_weights": bg_w},
            {"fg_tvals": fine_t, "fg_weights": fine_w, "far": far,
             "bg_tvals": bg_t, "bg_weights": bg_w},
        ]
        return neo360_interlevel_loss(results)

    prop_w = jnp.asarray([[0.3, 0.3, 0.01], [0.3, 0.3, 0.01]])
    loss = float(loss_of(prop_w))
    g = np.asarray(jax.grad(loss_of)(prop_w))
    assert loss > 0
    assert np.any(g != 0)
    # and when the prop bound covers everything, the fg term vanishes
    covered = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    assert float(loss_of(covered)) < loss


@pytest.mark.slow
def test_lift_dim_forward_and_grads(multi_scene_root):
    """lift_dim projects the grid-lift rows (nn/triplane.py lift_proj);
    forward runs and gradients reach both the projection and the backbone."""
    _, s = _batch(multi_scene_root)
    rays = {k: s[k] for k in RAY_KEYS}
    model = _tiny_model(use_proposal=True, num_prop_samples=4, lift_dim=32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, True, False)
    kern = variables["params"]["encoder"]["lift_proj"]["kernel"]
    assert kern.shape == (512, 32)

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            rays, True, False, rngs={"sampling": jax.random.PRNGKey(2)})
        return jnp.mean(out[-1]["rgb"] ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    assert np.any(np.asarray(grads["encoder"]["lift_proj"]["kernel"]) != 0)
    backbone = jax.tree_util.tree_leaves(
        grads["encoder"]["spatial_encoder"])
    assert any(np.any(np.asarray(g) != 0) for g in backbone)


def test_neo360_encoder_width_knob(multi_scene_root):
    """encoder_width narrows DepthPillarEncoder/pillar latents end-to-end."""
    import jax
    import jax.numpy as jnp
    from neo360_tpu.models.neo360 import NeRFTP

    model = NeRFTP(num_coarse_samples=4, num_fine_samples=4,
                   grid_size=(8, 8, 8), encoder_width=64, lift_dim=32,
                   use_proposal=True, num_prop_samples=4)
    _, batch = _batch(multi_scene_root)
    rays = {k: batch[k] for k in ("rays_o", "rays_d", "viewdirs", "src_imgs",
                                  "src_poses", "src_focal", "src_c")}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, False, False)
    p = variables["params"]["encoder"]
    assert p["depth_fc"]["depth"]["kernel"].shape[-1] == 64
    assert p["tri_pillar"]["hidden_lat"]["kernel"].shape == (64, 3 * 64)
    out = model.apply(variables, rays, False, False)
    assert out[-1]["rgb"].shape == rays["rays_o"].shape


def test_tri_pillar_matches_three_aggregators():
    """TriPillarAggregator is exactly three PillarAggregators whose (C+1,F)
    hidden kernels are split into a shared latent matmul + coord columns."""
    import jax
    import jax.numpy as jnp
    from neo360_tpu.nn.triplane import PillarAggregator, TriPillarAggregator

    c, f, n = 12, 16, 40
    rng = np.random.default_rng(0)
    latent = jnp.asarray(rng.standard_normal((2, n, c)), jnp.float32)
    coords = jnp.asarray(rng.standard_normal((2, n, 3)), jnp.float32)

    tri = TriPillarAggregator(features=f)
    tv = tri.init(jax.random.PRNGKey(0), latent, coords)
    outs = tri.apply(tv, latent, coords)

    p = tv["params"]
    for k, name in enumerate(("yz", "xz", "xy")):
        ref = PillarAggregator(features=f)
        ref_params = {"params": {
            "hidden": {
                "kernel": jnp.concatenate(
                    [p["hidden_lat"]["kernel"][:, k * f:(k + 1) * f],
                     p["coord_w"][k][None]], axis=0),
                "bias": p["hidden_b"][k],
            },
            "out": {"kernel": p[f"out_{name}"]["kernel"],
                    "bias": p[f"out_{name}"]["bias"]},
        }}
        x = jnp.concatenate([latent, coords[..., k:k + 1]], axis=-1)
        want = ref.apply(ref_params, x)
        np.testing.assert_allclose(np.asarray(outs[k]), np.asarray(want),
                                   atol=1e-5)


def test_tri_pillar_hidden_width_knob():
    """pillar_width narrows only the aggregator hidden layer."""
    import jax
    import jax.numpy as jnp
    from neo360_tpu.nn.triplane import TriPillarAggregator

    tri = TriPillarAggregator(features=32, hidden_features=8)
    latent = jnp.zeros((2, 5, 32))
    coords = jnp.zeros((2, 5, 3))
    tv = tri.init(jax.random.PRNGKey(0), latent, coords)
    assert tv["params"]["hidden_lat"]["kernel"].shape == (32, 3 * 8)
    assert tv["params"]["coord_w"].shape == (3, 8)
    outs = tri.apply(tv, latent, coords)
    assert all(o.shape == (2, 5, 1) for o in outs)


def test_depth_fc_layers_knob(multi_scene_root):
    """depth_fc_layers=1 drops fc1 from DepthPillarEncoder; anisotropic
    grid_size threads through the encoder end-to-end."""
    import jax
    from neo360_tpu.models.neo360 import NeRFTP

    model = NeRFTP(num_coarse_samples=4, num_fine_samples=4,
                   grid_size=(8, 8, 4), encoder_width=64, lift_dim=32,
                   depth_fc_layers=1, use_proposal=True, num_prop_samples=4)
    _, batch = _batch(multi_scene_root)
    rays = {k: batch[k] for k in ("rays_o", "rays_d", "viewdirs", "src_imgs",
                                  "src_poses", "src_focal", "src_c")}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        rays, False, False)
    dfc = variables["params"]["encoder"]["depth_fc"]
    assert "fc0" in dfc and "depth" in dfc and "fc1" not in dfc
    out = model.apply(variables, rays, False, False)
    assert out[-1]["rgb"].shape == rays["rays_o"].shape
