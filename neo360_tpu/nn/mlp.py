"""NeRF MLP trunks (Flax linen).

`NeRFMLP` — parity with reference models/vanilla_nerf/model.py:44-125:
8x256 trunk, input re-concatenated after layer `skip_layer`, a bottleneck
into a 1x128 view-conditioned branch, separate density and rgb heads,
xavier-uniform kernel init.

`combine_interleaved` — multi-source-view *average fusion* used mid-trunk by
the conditioned MLPs in models/pixelnerf.py and models/neo360.py (reference
neo360/model.py:130-150, util.py:599-609).

TPU notes: every Dense here maps onto the MXU; feature dims are chosen by the
configs (256/128) which XLA pads to lane width. The batch axis is
(rays x samples), kept >= 8k at train time so matmuls stay MXU-bound.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

_XAVIER = nn.initializers.xavier_uniform()


class NeRFMLP(nn.Module):
    """Vanilla-NeRF MLP. Inputs are already positionally encoded."""

    netdepth: int = 8
    netwidth: int = 256
    netdepth_condition: int = 1
    netwidth_condition: int = 128
    skip_layer: int = 4
    num_rgb_channels: int = 3
    num_density_channels: int = 1
    dtype: Any = jnp.float32        # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, samples_enc: jnp.ndarray, viewdirs_enc: jnp.ndarray):
        """samples_enc: (B, S, Dp); viewdirs_enc: (B, Dv).

        Returns (raw_rgb (B, S, 3), raw_density (B, S, 1)).
        """
        dense = lambda w, name: nn.Dense(w, kernel_init=_XAVIER,
                                         dtype=self.dtype, name=name)

        inputs = samples_enc
        x = samples_enc
        for idx in range(self.netdepth):
            x = nn.relu(dense(self.netwidth, f"pts_{idx}")(x))
            if idx % self.skip_layer == 0 and idx > 0:
                x = jnp.concatenate([x, inputs], axis=-1)

        raw_density = dense(self.num_density_channels, "density")(x)

        bottleneck = dense(self.netwidth, "bottleneck")(x)
        cond = jnp.broadcast_to(
            viewdirs_enc[..., None, :],
            bottleneck.shape[:-1] + (viewdirs_enc.shape[-1],))
        x = jnp.concatenate([bottleneck, cond], axis=-1)
        for idx in range(self.netdepth_condition):
            x = nn.relu(dense(self.netwidth_condition, f"views_{idx}")(x))

        raw_rgb = dense(self.num_rgb_channels, "rgb")(x)
        return (raw_rgb.astype(jnp.float32),
                raw_density.astype(jnp.float32))


def combine_interleaved(x: jnp.ndarray, num_views: int) -> jnp.ndarray:
    """Average per-point features over the source-view axis.

    x: (NV * B, ..., D) with views interleaved as the leading factor
    (parity with reference neo360/model.py:130-150 / util.py:599-609).
    Returns (B, ..., D).
    """
    if num_views == 1:
        return x
    return jnp.mean(
        x.reshape((num_views, -1) + x.shape[1:]), axis=0)
