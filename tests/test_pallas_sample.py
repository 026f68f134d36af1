"""Correctness of the Pallas bilinear-gather kernel (interpret mode on the
CPU mesh) against the XLA reference implementation.

Status note: on v5e the naive scalar-loop kernel is slower than XLA's gather
(BASELINE.md "Step-time attribution") and is kept as groundwork — it is NOT
wired into the model paths. These tests pin its semantics for when the
DMA-pipelined variant lands.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import neo360_tpu.ops.pallas_sample as ps
from neo360_tpu.ops.interpolate import grid_sample_2d


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(ps.pl, "pallas_call", interp_call)


@pytest.mark.parametrize("mode", ["zeros", "border"])
def test_forward_matches_xla(mode):
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, 7, 9, 128)), jnp.float32)
    uv = jnp.asarray(rng.uniform(-1.4, 1.4, size=(2, 37, 2)), jnp.float32)
    ref = grid_sample_2d(imgs, uv, padding_mode=mode)
    out = ps.bilinear_gather(imgs, uv, mode, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("mode", ["zeros", "border"])
def test_backward_matches_xla(mode):
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.normal(size=(1, 6, 8, 128)), jnp.float32)
    uv = jnp.asarray(rng.uniform(-1.2, 1.2, size=(1, 21, 2)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(1, 21, 128)), jnp.float32)

    ref_grad = jax.grad(lambda im: jnp.sum(
        grid_sample_2d(im, uv, padding_mode=mode) * g))(imgs)
    out_grad = jax.grad(lambda im: jnp.sum(
        ps.bilinear_gather(im, uv, mode, 16) * g))(imgs)
    np.testing.assert_allclose(np.asarray(out_grad), np.asarray(ref_grad),
                               atol=1e-4)


def test_uv_gets_zero_gradient():
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.normal(size=(1, 6, 8, 128)), jnp.float32)
    uv = jnp.asarray(rng.uniform(-1, 1, size=(1, 5, 2)), jnp.float32)
    duv = jax.grad(lambda u: jnp.sum(
        ps.bilinear_gather(imgs, u, "zeros", 16)))(uv)
    np.testing.assert_array_equal(np.asarray(duv), 0.0)


def test_channel_blocking():
    """Feature maps wider than the VMEM budget split over channel blocks."""
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.normal(size=(1, 5, 6, 256)), jnp.float32)
    uv = jnp.asarray(rng.uniform(-1, 1, size=(1, 18, 2)), jnp.float32)
    ref = grid_sample_2d(imgs, uv)
    # force two channel blocks
    old = ps.MAX_VMEM_BLOCK_BYTES
    ps.MAX_VMEM_BLOCK_BYTES = 5 * 6 * 128 * 4
    try:
        out = ps.bilinear_gather(imgs, uv, "zeros", 16)
    finally:
        ps.MAX_VMEM_BLOCK_BYTES = old
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
