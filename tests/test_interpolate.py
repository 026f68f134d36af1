"""Golden-value tests of the bilinear sampler against torch-CPU
F.grid_sample / F.interpolate — the reference's exact primitives."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from neo360_tpu.ops.interpolate import (  # noqa: E402
    grid_sample_2d, in_bounds_mask, resize_bilinear_align_corners)


def _random_case(seed, b=2, h=7, w=5, c=4, n=64, oob=True):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(b, h, w, c)).astype(np.float32)
    lim = 1.6 if oob else 1.0
    uv = rng.uniform(-lim, lim, size=(b, n, 2)).astype(np.float32)
    return img, uv


@pytest.mark.parametrize("padding", ["zeros", "border"])
@pytest.mark.parametrize("seed", [0, 1])
def test_grid_sample_matches_torch(padding, seed):
    img, uv = _random_case(seed)
    ours = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(uv),
                                     padding_mode=padding))
    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)   # NCHW
    t_uv = torch.from_numpy(uv).unsqueeze(2)            # (B, N, 1, 2)
    ref = F.grid_sample(t_img, t_uv, mode="bilinear", padding_mode=padding,
                        align_corners=True)[..., 0]     # (B, C, N)
    ref = ref.permute(0, 2, 1).numpy()                  # (B, N, C)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_exact_corners():
    img, _ = _random_case(3, n=1)
    corners = jnp.asarray([[[-1.0, -1.0], [1.0, -1.0], [-1.0, 1.0],
                            [1.0, 1.0]]] * 2)
    out = np.asarray(grid_sample_2d(jnp.asarray(img), corners))
    np.testing.assert_allclose(out[:, 0], img[:, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[:, 1], img[:, 0, -1], atol=1e-6)
    np.testing.assert_allclose(out[:, 2], img[:, -1, 0], atol=1e-6)
    np.testing.assert_allclose(out[:, 3], img[:, -1, -1], atol=1e-6)


def test_in_bounds_mask():
    uv = jnp.asarray([[[0.0, 0.0], [1.0, -1.0], [1.1, 0.0], [0.0, -1.2]]])
    m = np.asarray(in_bounds_mask(uv))
    np.testing.assert_array_equal(
        m, [[[True, True], [True, True], [False, True], [True, False]]])


@pytest.mark.parametrize("shape", [((6, 8), (12, 16)), ((12, 16), (5, 7)),
                                   ((4, 4), (4, 4))])
def test_resize_matches_torch_interpolate(shape):
    (h_in, w_in), (h_out, w_out) = shape
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, h_in, w_in, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear_align_corners(
        jnp.asarray(img), (h_out, w_out)))
    ref = F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2),
                        (h_out, w_out), mode="bilinear", align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("padding", ["zeros", "border"])
@pytest.mark.parametrize("seed", [0, 1])
def test_table_sample_matches_grid_sample(padding, seed):
    from neo360_tpu.ops.interpolate import build_corner_table, table_sample
    img, uv = _random_case(seed, h=9, w=6, c=8, n=128)
    h, w = img.shape[1:3]
    ref = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(uv),
                                    padding_mode=padding))
    table = build_corner_table(jnp.asarray(img), padding_mode=padding)
    out = np.asarray(table_sample(table, jnp.asarray(uv), (h, w),
                                  padding_mode=padding))
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_table_sample_grad_matches_grid_sample(padding):
    import jax
    from neo360_tpu.ops.interpolate import build_corner_table, table_sample
    img, uv = _random_case(7, h=6, w=5, c=4, n=64)
    h, w = img.shape[1:3]
    g = np.asarray(jax.grad(lambda p: jnp.sum(jnp.sin(grid_sample_2d(
        p, jnp.asarray(uv), padding_mode=padding))))(jnp.asarray(img)))
    gt = np.asarray(jax.grad(lambda p: jnp.sum(jnp.sin(table_sample(
        build_corner_table(p, padding_mode=padding), jnp.asarray(uv),
        (h, w), padding_mode=padding))))(jnp.asarray(img)))
    np.testing.assert_allclose(gt, g, atol=1e-5)


def test_table_sample_far_oob_zeros():
    from neo360_tpu.ops.interpolate import build_corner_table, table_sample
    img, _ = _random_case(2, n=1)
    h, w = img.shape[1:3]
    uv = jnp.asarray(np.full((img.shape[0], 5, 2), -9.0, np.float32))
    out = np.asarray(table_sample(build_corner_table(jnp.asarray(img)),
                                  uv, (h, w), padding_mode="zeros"))
    np.testing.assert_array_equal(out, 0.0)


def test_table_sample_flat_multiscene():
    """Flat multi-scene mode: table_sample(total_views=S*B, view_offset=s*B)
    over scene-concatenated tables must equal the per-scene call, in value
    AND in gradient (the vmapped form's backward is ONE flat scatter)."""
    import jax
    import jax.numpy as jnp
    from neo360_tpu.ops.interpolate import build_corner_table, table_sample

    rng = np.random.default_rng(3)
    s_scenes, b, h, w, c, n = 2, 3, 5, 6, 4, 11
    imgs = jnp.asarray(rng.normal(size=(s_scenes, b, h, w, c)), jnp.float32)
    uv = jnp.asarray(rng.uniform(-1.2, 1.2, size=(s_scenes, b, n, 2)),
                     jnp.float32)
    tables = jax.vmap(lambda im: build_corner_table(im, "zeros"))(imgs)
    flat = tables.reshape((-1,) + tables.shape[2:])

    ref = jnp.stack([table_sample(tables[s], uv[s], (h, w), "zeros")
                     for s in range(s_scenes)])

    def one(uv_s, off):
        return table_sample(flat, uv_s, (h, w), "zeros",
                            view_offset=off, total_views=s_scenes * b)

    offs = jnp.arange(s_scenes, dtype=jnp.int32) * b
    out = jax.vmap(one)(uv, offs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)

    g_ref = jax.grad(lambda t: sum(
        jnp.sum(table_sample(t[s], uv[s], (h, w), "zeros") ** 2)
        for s in range(s_scenes)))(tables)
    g_flat = jax.grad(lambda f: jnp.sum(
        jax.vmap(lambda u, o: table_sample(
            f, u, (h, w), "zeros", view_offset=o,
            total_views=s_scenes * b))(uv, offs) ** 2))(flat)
    np.testing.assert_allclose(
        np.asarray(g_flat.reshape(g_ref.shape)), np.asarray(g_ref),
        rtol=1e-5, atol=1e-6)


def test_sorted_scatter_backward_matches(monkeypatch):
    """NEO360_SORTED_SCATTER=1 swaps the table gather's backward for a
    sort + sorted segment_sum; gradients must match XLA's scatter-add
    (ops/interpolate._gather_rows_sorted_bwd)."""
    import jax
    import jax.numpy as jnp
    from neo360_tpu.ops import interpolate as I

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, 5, 6, 3)), jnp.float32)
    uv = jnp.asarray(rng.uniform(-1.2, 1.2, size=(2, 9, 2)), jnp.float32)
    table = I.build_corner_table(imgs, "zeros")

    def loss(t):
        return jnp.sum(I.table_sample(t, uv, (5, 6), "zeros") ** 2)

    monkeypatch.delenv("NEO360_SORTED_SCATTER", raising=False)
    g_ref = jax.grad(loss)(table)
    monkeypatch.setenv("NEO360_SORTED_SCATTER", "1")
    g_sorted = jax.grad(loss)(table)
    np.testing.assert_allclose(np.asarray(g_sorted), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)

    # vmapped flat multi-scene form (the stage trainer's lowering)
    flat = table.reshape((-1,) + table.shape[2:])

    def loss_flat(f):
        def one(uv_s, off):
            return jnp.sum(I.table_sample(
                f, uv_s[None], (5, 6), "zeros", view_offset=off,
                total_views=2) ** 2)
        offs = jnp.arange(2, dtype=jnp.int32)
        return jnp.sum(jax.vmap(one)(uv, offs))

    g_flat_sorted = jax.grad(loss_flat)(flat)
    monkeypatch.delenv("NEO360_SORTED_SCATTER", raising=False)
    g_flat_ref = jax.grad(loss_flat)(flat)
    np.testing.assert_allclose(np.asarray(g_flat_sorted),
                               np.asarray(g_flat_ref), rtol=1e-6, atol=1e-6)
