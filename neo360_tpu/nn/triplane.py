"""Tri-planar world representation — NeO-360's GridEncoder
(reference models/neo360/encoder_tp_fusion_conv.py:263-598) in Flax/NHWC.

Pipeline per source-view batch:
  1. SpatialEncoder -> 512-ch pixel-aligned latent.
  2. A 64^3 world grid on [-1,1] x [-1,1] x [0,1] is transformed into every
     camera, projected (fy negated), and bilinear-samples the latent
     (zeros padding).
  3. [feat512, cam-xyz3, world-dir3] -> DepthPillarEncoder MLP -> 512.
  4. Per-axis softmax pillar aggregation conditioned on the orthogonal world
     coordinate collapses the 3D grid into three 2D floorplans
     (yz <- sum over X, xz <- sum over Y, xy <- sum over Z).
  5. Each floorplan runs a small conv net (stride-2 x2, upsample back,
     final resize to 120x160) -> 128-ch planes.

`index_grid` samples the three planes at camera-frame coordinate pairs
(x,z), (x,y), (y,z) used DIRECTLY as [-1,1] uv (the reference's deliberate
convention, encoder_tp_fusion_conv.py:126-135) and sums them.

TPU notes: step 2-3 is ~NV * 262k grid points through dense matmuls — pure
MXU; the projection sampling is the gather-lerp op from ops/interpolate. The
whole encoder is wrapped in jax.checkpoint by the model to keep the 1.6 GB
grid activations out of the backward residue.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neo360_tpu.core import geometry
from neo360_tpu.nn.resnet import SpatialEncoder, index_latent, latent_scaling
from neo360_tpu.ops.interpolate import (build_corner_table, grid_sample_2d,
                                        resize_bilinear_align_corners,
                                        table_sample)

_KAIMING_N = nn.initializers.kaiming_normal()


def _bias_init(key, shape, dtype=jnp.float32):
    """U(-1e-3, 1e-3), parity with init_weights_kaiming (reference :255-260)."""
    import jax
    return jax.random.uniform(key, shape, dtype, -1e-3, 1e-3)


class DepthPillarEncoder(nn.Module):
    """[feat, cam-xyz, dir] -> latent (reference :263-279).

    hidden_layers: relu hidden layers before the final projection
    (reference = 2). This MLP runs on every one of the NV*64^3 grid cells —
    ~32% of the NeO-360 train step (BASELINE.md xplane attribution) — so
    hidden_layers=1 is a quality-gated fast-preset knob.
    """

    features: int = 512
    dtype: Any = jnp.float32
    hidden_layers: int = 2

    @nn.compact
    def __call__(self, x):
        dense = lambda w, name: nn.Dense(
            w, kernel_init=_KAIMING_N, bias_init=_bias_init,
            dtype=self.dtype, name=name)
        for i in range(self.hidden_layers):
            x = nn.relu(dense(self.features, f"fc{i}")(x))
        return dense(self.features, "depth")(x)


class PillarAggregator(nn.Module):
    """MLP(latent ++ orthogonal-world-coord) -> scalar logit (:364-373)."""

    features: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dense = lambda w, name: nn.Dense(
            w, kernel_init=_KAIMING_N, bias_init=_bias_init,
            dtype=self.dtype, name=name)
        return dense(1, "out")(nn.relu(dense(self.features, "hidden")(x)))


class TriPillarAggregator(nn.Module):
    """The three per-axis PillarAggregators fused into one latent matmul.

    Exactly the reference's function class (three MLP(latent ++ coord_k) ->
    logit heads, encoder_tp_fusion_conv.py:364-373): each aggregator's
    (C+1, F) hidden kernel splits into a latent block (C, F) and a
    coordinate column (F,). The three latent blocks are stored as ONE
    (C, 3F) kernel so the hidden layer is a single MXU matmul reading the
    786k-point latent once — profiling showed the per-axis variant was
    HBM-bound re-reading the latent three times (~6.4 ms/step of a 148 ms
    NeO-360 step at width 512).
    """

    features: int = 512
    dtype: Any = jnp.float32
    # hidden width per axis head. The reference uses latent_size (512);
    # the hidden layer is 57% of the encoder's MACs just to produce three
    # scalar logits per cell, so narrower widths are a quality-gated knob
    # (fixture A/B, BASELINE.md). None = features (reference parity).
    hidden_features: Any = None

    @nn.compact
    def __call__(self, latent: jnp.ndarray, coords: jnp.ndarray):
        """latent (..., C); coords (..., 3) = world (x, y, z) of each cell.

        Returns three logit maps (..., 1) for the yz (sum over X), xz
        (sum over Y), xy (sum over Z) collapses, in that order.
        """
        f = self.hidden_features or self.features
        hid = nn.Dense(3 * f, kernel_init=_KAIMING_N, use_bias=False,
                       dtype=self.dtype, name="hidden_lat")(latent)
        # per-axis coordinate column + bias of the reference (C+1, F) kernel
        coord_w = self.param("coord_w", _KAIMING_N, (3, f))
        hidden_b = self.param("hidden_b", _bias_init, (3, f))
        cw = coord_w.astype(hid.dtype)
        hb = hidden_b.astype(hid.dtype)
        logits = []
        for k, name in enumerate(("yz", "xz", "xy")):
            h = nn.relu(hid[..., k * f:(k + 1) * f]
                        + coords[..., k:k + 1].astype(hid.dtype) * cw[k]
                        + hb[k])
            logits.append(nn.Dense(1, kernel_init=_KAIMING_N,
                                   bias_init=_bias_init, dtype=self.dtype,
                                   name=f"out_{name}")(h))
        return logits


class FloorplanConvNet(nn.Module):
    """512-ch floorplan -> plane_dim-ch plane at plane_hw (:375-397).

    plane_dim: output channels of the final conv (reference 128). The plane
    latents are point-indexed per (ray sample, view, plane) — the fine-level
    table gathers and their backward scatters scale linearly in this width
    and are the largest block of the NeO-360 train step after the encoder
    (BASELINE.md xplane attribution), so 64 is a quality-gated fast knob.
    """

    plane_hw: Tuple[int, int] = (120, 160)
    dtype: Any = jnp.float32
    plane_dim: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda c, s, name: nn.Conv(
            c, (3, 3), strides=(s, s), padding=[(1, 1), (1, 1)],
            kernel_init=_KAIMING_N, bias_init=_bias_init,
            dtype=self.dtype, name=name)
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        x = nn.relu(norm("bn0")(conv(256, 2, "conv0")(x)))
        x = nn.relu(norm("bn1")(conv(128, 2, "conv1")(x)))
        x = nn.relu(norm("bn2")(conv(128, 1, "conv2")(x)))
        x = resize_bilinear_align_corners(
            x, (x.shape[-3] * 2, x.shape[-2] * 2))
        x = nn.relu(norm("bn3")(conv(128, 1, "conv3")(x)))
        x = resize_bilinear_align_corners(x, self.plane_hw)
        return conv(self.plane_dim, 1, "conv4")(x)


class GridEncoder(nn.Module):
    """Source views -> three 128-ch tri-planes (reference :282-598)."""

    grid_size: Sequence[int] = (64, 64, 64)
    side_lengths: Sequence[float] = (1.0, 1.0, 1.0)
    plane_hw: Tuple[int, int] = (120, 160)
    latent_size: int = 512
    dtype: Any = jnp.float32
    # lift_dim: project the pixel latent MAP to this width (one dense matmul
    # over 120x160xNV positions) before the 786k-point grid-lift gather, so
    # every gathered row shrinks from 512 ch to lift_dim ch. The gather and
    # its backward scatter are the encoder's dominant cost and scale
    # linearly in row bytes (BASELINE.md). At 512 this composes two linear
    # maps (same function class as the reference fc0); below 512 it rank-
    # restricts only the FEATURE block of fc0 (geometry inputs unaffected).
    # None = reference layout (table built from the raw 512-ch latent).
    lift_dim: int | None = None
    # TriPillarAggregator hidden width; None = latent_size (reference 512)
    pillar_width: int | None = None
    # DepthPillarEncoder hidden layers; 2 = reference parity
    depth_fc_layers: int = 2
    # output channels of the tri-planes (FloorplanConvNet.plane_dim);
    # 128 = reference parity
    plane_dim: int = 128

    def setup(self):
        self.spatial_encoder = SpatialEncoder(dtype=self.dtype,
                                              name="spatial_encoder")
        if self.lift_dim is not None:
            self.lift_proj = nn.Dense(
                self.lift_dim, use_bias=False, kernel_init=_KAIMING_N,
                dtype=self.dtype, name="lift_proj")
        self.depth_fc = DepthPillarEncoder(self.latent_size, self.dtype,
                                           hidden_layers=self.depth_fc_layers,
                                           name="depth_fc")
        self.tri_pillar = TriPillarAggregator(self.latent_size, self.dtype,
                                              hidden_features=self.pillar_width,
                                              name="tri_pillar")
        self.floorplan_yz = FloorplanConvNet(self.plane_hw, self.dtype,
                                             self.plane_dim,
                                             name="floorplan_yz")
        self.floorplan_xz = FloorplanConvNet(self.plane_hw, self.dtype,
                                             self.plane_dim,
                                             name="floorplan_xz")
        self.floorplan_xy = FloorplanConvNet(self.plane_hw, self.dtype,
                                             self.plane_dim,
                                             name="floorplan_xy")

    def __call__(self, images: jnp.ndarray, poses: jnp.ndarray,
                 focal: jnp.ndarray, c: jnp.ndarray, train: bool = False,
                 pixel_latent: jnp.ndarray = None):
        """images (NV, H, W, 3) in [-1,1]; poses (NV, 4, 4); focal (NV,);
        c (NV, 2).

        `pixel_latent`: precomputed SpatialEncoder output (NV, H/2, W/2,
        512). The optimize/finetune freeze protocol (reference
        neo360/model.py:957-981) freezes exactly the spatial_encoder with
        BN in eval mode, so its output for a fixed source stack is a
        run-constant — callers cache it and skip the ResNet fwd+bwd here.

        Returns (plane_xz, plane_xy, plane_yz) each (NV, 120, 160, 128) and
        the pixel latent (NV, H/2, W/2, 512) for local-feature indexing.
        """
        nv, h, w, _ = images.shape
        gx, gy, gz = self.grid_size
        sx, sy, sz = self.side_lengths

        if pixel_latent is None:
            pixel_latent = self.spatial_encoder(images, train)

        world_grid = geometry.get_world_grid(
            [[-sx, sx], [-sy, sy], [0.0, sz]], list(self.grid_size))
        world_grids = geometry.repeat_interleave(world_grid, nv)  # (NV,G,3)
        camera_grids = geometry.world2camera(world_grids, poses)

        mask = (camera_grids[..., 2] < 1e-3).astype(images.dtype)
        cam_dir = world_grids - poses[:, None, :3, 3]
        cam_dir = cam_dir / jnp.linalg.norm(
            cam_dir + 1e-9, axis=-1, keepdims=True)
        cam_dir = cam_dir * mask[..., None]

        focal2 = jnp.stack([focal[0], -focal[0]])[None]   # (1, 2), -fy
        uv = geometry.projection(camera_grids, focal2, c[:1], nv)
        # grid lift = 786k-point gather of 512-ch rows: go through a corner
        # table (1 row-gather/point instead of index_latent's 4; same
        # semantics — resnet.py:115-129 with zeros padding)
        lat_hw = pixel_latent.shape[1:3]
        scale = latent_scaling(lat_hw) / jnp.asarray((w, h), jnp.float32)
        uv_norm = uv * scale - 1.0
        lift_map = (self.lift_proj(pixel_latent)
                    if self.lift_dim is not None else pixel_latent)
        latent = table_sample(
            build_corner_table(lift_map, "zeros"), uv_norm, lat_hw,
            padding_mode="zeros", out_dtype=lift_map.dtype)  # (NV,G,lift)

        latent = jnp.concatenate([latent, camera_grids, cam_dir], axis=-1)
        latent = self.depth_fc(latent)                    # (NV, G, 512)
        latent = latent.reshape(nv, gx, gy, gz, self.latent_size)

        wg = world_grid.reshape(1, gx, gy, gz, 3)
        coords = jnp.broadcast_to(wg, latent.shape[:-1] + (3,))

        logit_yz, logit_xz, logit_xy = self.tri_pillar(latent, coords)
        w_yz = nn.softmax(logit_yz[..., 0].astype(jnp.float32),
                          axis=1).astype(latent.dtype)
        w_xz = nn.softmax(logit_xz[..., 0].astype(jnp.float32),
                          axis=2).astype(latent.dtype)
        w_xy = nn.softmax(logit_xy[..., 0].astype(jnp.float32),
                          axis=3).astype(latent.dtype)

        # softmax-weighted axis collapses as dot_general contractions
        # (batch dims = the kept axes) rather than sum(latent * w[..., None]):
        # the broadcast-multiply form makes XLA materialize three full
        # (NV,X,Y,Z,C) weight broadcasts (~2.4 GB/step of HBM writes+reads,
        # ~10% of the NeO-360 train step in the xplane profile); the
        # contraction form reads `latent` once per floor with no broadcast.
        def collapse(w, axis):
            # out[batch..., c] = sum_axis w * latent; f32 accumulation (the
            # 64-term bf16 sums otherwise cost ~1e-2 relative error, which
            # measurably hurts held-out renders — fixture drive, BASELINE.md)
            batch = tuple(i for i in range(4) if i != axis)
            return jax.lax.dot_general(
                w, latent,
                dimension_numbers=(((axis,), (axis,)), (batch, batch)),
                preferred_element_type=jnp.float32).astype(latent.dtype)

        floor_yz = collapse(w_yz, 1)   # (NV, Y, Z, 512)
        floor_xz = collapse(w_xz, 2)   # (NV, X, Z, 512)
        floor_xy = collapse(w_xy, 3)   # (NV, X, Y, 512)

        plane_yz = self.floorplan_yz(floor_yz, train).astype(jnp.float32)
        plane_xz = self.floorplan_xz(floor_xz, train).astype(jnp.float32)
        plane_xy = self.floorplan_xy(floor_xy, train).astype(jnp.float32)
        return ((plane_xz, plane_xy, plane_yz),
                pixel_latent.astype(jnp.float32))


def index_grid(samples: jnp.ndarray, planes, poses: jnp.ndarray,
               num_src_views: int) -> jnp.ndarray:
    """Sample + sum the three planes at camera-frame coordinate slices.

    samples: (B, S, 3) world points (or bg linear points). planes:
    (plane_xz, plane_xy, plane_yz) each (NV, Hp, Wp, 128). Returns
    (NV, B*S, 128) view-major world latents.

    Parity with reference index_grid (encoder_tp_fusion_conv.py:122-209):
    camera-frame coordinates are used directly as normalized uv.
    """
    plane_xz, plane_xy, plane_yz = planes
    flat = samples.reshape(1, -1, 3)
    cam = geometry.world2camera(flat, poses, ns=num_src_views)  # (NV, N, 3)

    uv_xz = cam[..., jnp.asarray([0, 2])]
    uv_yz = cam[..., jnp.asarray([1, 2])]
    uv_xy = cam[..., jnp.asarray([0, 1])]

    lat = (grid_sample_2d(plane_xz, uv_xz, padding_mode="zeros")
           + grid_sample_2d(plane_xy, uv_xy, padding_mode="zeros")
           + grid_sample_2d(plane_yz, uv_yz, padding_mode="zeros"))
    return lat


def index_grid_tables(samples: jnp.ndarray, tables, plane_hw,
                      poses: jnp.ndarray, num_src_views: int,
                      view_offset=None,
                      total_views: int = None) -> jnp.ndarray:
    """`index_grid` over prebuilt corner tables (ops.interpolate
    .build_corner_table of each plane, zeros mode) — one row-gather per
    (point, view, plane) instead of four; numerically identical
    (tests/test_neo360.py::test_index_grid_tables_matches).

    view_offset/total_views: flat multi-scene tables (see
    ops.interpolate.table_sample) for the SCENE-MIXED stage trainer."""
    from neo360_tpu.ops.interpolate import table_sample

    t_xz, t_xy, t_yz = tables
    flat = samples.reshape(1, -1, 3)
    cam = geometry.world2camera(flat, poses, ns=num_src_views)  # (NV, N, 3)

    uv_xz = cam[..., jnp.asarray([0, 2])]
    uv_yz = cam[..., jnp.asarray([1, 2])]
    uv_xy = cam[..., jnp.asarray([0, 1])]

    kw = dict(padding_mode="zeros", view_offset=view_offset,
              total_views=total_views)
    lat = (table_sample(t_xz, uv_xz, plane_hw, **kw)
           + table_sample(t_xy, uv_xy, plane_hw, **kw)
           + table_sample(t_yz, uv_yz, plane_hw, **kw))
    return lat
