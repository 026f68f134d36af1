"""NeO-360 — generalizable NeRF with tri-planar world + pixel-aligned local
conditioning and NeRF++ fg/bg decomposition
(reference models/neo360/model.py:37-581).

Structure per level (coarse 128 / fine +256 samples, x2 for fg/bg):
  - near = 1e-4, far = per-ray unit-sphere exit depth.
  - fg: stratified in-sphere samples; bg: inverted-sphere samples s in [0,1]
    lifted to 4D (x',y',z',1/r), plus parallel LINEAR points t in [far, 3]
    used only for feature indexing.
  - world latent (128) = index_grid over the tri-planes; local latent (512) =
    pixel-aligned SpatialEncoder features; both per source view.
  - NeRFTPMLP: 4x128 trunk (skip at 2), inputs pos_enc(camera-frame sample)
    ++ local ++ world, average view-fusion after layer 3; 2x64 view branch;
    sigma softplus(raw - 1), rgb sigmoid padded +-0.001.
  - composite: comp = fg + bg_lambda * bg (NeRF++ leftover transmittance).

Deliberate divergences (bugs not ported): per-ray viewdir conditioning is
broadcast in (ray, sample) order — the reference's torch.tile at
neo360/model.py:349-352 interleaves (sample, ray), misaligning viewdirs.

TPU design:
  - `encode()` (GridEncoder + pixel latent) is separate from `render_rays`;
    full-image eval encodes ONCE instead of per 1024-ray chunk
    (the reference re-encodes every chunk — model.py:266-273, 825-843).
  - the encoder runs under jax.checkpoint: the 64^3 grid activations are
    recomputed in the backward pass instead of living in HBM.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neo360_tpu.core import encoding, geometry, render, sampling, spherical
from neo360_tpu.nn.mlp import combine_interleaved
from neo360_tpu.nn.resnet import latent_scaling
from neo360_tpu.nn.triplane import GridEncoder, index_grid_tables
from neo360_tpu.ops.interpolate import build_corner_table, table_sample
from neo360_tpu.ops.losses import eff_distloss

_XAVIER = nn.initializers.xavier_uniform()


class NeRFTPMLP(nn.Module):
    """Conditioned trunk with mid-network view fusion
    (reference neo360/model.py:37-158)."""

    netdepth: int = 4
    netwidth: int = 128
    netdepth_condition: int = 2
    netwidth_condition: int = 64
    skip_layer: int = 2
    combine_layer: int = 3
    use_nocs: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, viewdirs_enc: jnp.ndarray,
                 world_latent: jnp.ndarray, local_latent: jnp.ndarray,
                 num_views: int):
        """x: (NV*B, S, Dp); viewdirs_enc: (NV*B, Dv); world/local latents:
        (NV*B, S, .). Returns (raw_rgb, raw_density[, raw_nocs]) at (B, S, .)."""
        dense = lambda w, name: nn.Dense(w, kernel_init=_XAVIER,
                                         dtype=self.dtype, name=name)

        x = jnp.concatenate([x, local_latent, world_latent], axis=-1)
        inputs = x
        bottleneck = None
        for idx in range(self.netdepth):
            x = nn.relu(dense(self.netwidth, f"pts_{idx}")(x))
            if idx == self.combine_layer:
                bottleneck = dense(self.netwidth, "bottleneck")(x)
                x = combine_interleaved(x, num_views)
            if (idx % self.skip_layer == 0 and idx > 0
                    and idx != self.combine_layer):
                x = jnp.concatenate([x, inputs], axis=-1)

        raw_density = dense(1, "density")(x)
        out_extra = None
        if self.use_nocs:
            out_extra = dense(3, "nocs")(x)

        cond = jnp.broadcast_to(
            viewdirs_enc[..., None, :],
            bottleneck.shape[:-1] + (viewdirs_enc.shape[-1],))
        h = jnp.concatenate([bottleneck, cond], axis=-1)
        for idx in range(self.netdepth_condition):
            h = dense(self.netwidth_condition, f"views_{idx}")(h)
            if idx == 0:
                h = combine_interleaved(h, num_views)
            h = nn.relu(h)
        raw_rgb = dense(3, "rgb")(h).astype(jnp.float32)
        raw_density = raw_density.astype(jnp.float32)

        if self.use_nocs:
            return raw_rgb, raw_density, out_extra.astype(jnp.float32)
        return raw_rgb, raw_density


class PropMLP(nn.Module):
    """Unconditioned density-only proposal MLP for the `use_proposal` fast
    path — the TPU-first analogue of MipNeRF-360's PropMLP
    (reference mipnerf360/model.py:187-195) applied to the NeRF++ fg/bg
    decomposition. No image/tri-plane features and no per-view replication:
    evaluating it costs a few small matmuls per sample, so the expensive
    conditioned MLPs (and their feature gathers) only run on the resampled
    fine points."""

    netdepth: int = 4
    netwidth: int = 128
    min_deg: int = 0
    max_deg: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points: jnp.ndarray) -> jnp.ndarray:
        """points (B, S, 3|4) -> raw density (B, S, 1)."""
        x = encoding.pos_enc(points, self.min_deg, self.max_deg)
        for idx in range(self.netdepth):
            x = nn.relu(nn.Dense(self.netwidth, kernel_init=_XAVIER,
                                 dtype=self.dtype, name=f"pts_{idx}")(x))
        return nn.Dense(1, kernel_init=_XAVIER, dtype=self.dtype,
                        name="density")(x).astype(jnp.float32)


class NeRFTP(nn.Module):
    num_levels: int = 2
    min_deg_point: int = 0
    max_deg_point: int = 10
    deg_view: int = 4
    num_coarse_samples: int = 128
    num_fine_samples: int = 256
    num_src_views: int = 3
    density_noise: float = 0.0
    lindisp: bool = False
    far_uncontracted: float = 3.0
    rgb_padding: float = 0.001
    density_bias: float = -1.0
    grid_size: Tuple[int, int, int] = (64, 64, 64)
    remat_encoder: bool = True
    compute_dtype: Any = jnp.float32   # bf16 runs encoder+MLP matmuls on
                                       # the MXU fast path; render math
                                       # and params stay f32

    local_proj_dim: int = 128

    # -- proposal fast path --------------------------------------------------
    # use_proposal=True replaces the CONDITIONED coarse level (128+1 samples
    # through feature gathers + the big MLPs, reference model.py:169) with a
    # cheap unconditioned PropMLP; the fine level then evaluates only
    # `num_fine_samples`+1 resampled points (no union with coarse edges).
    # At reference sample budgets this cuts conditioned points per ray from
    # ~1028 to ~130 (~8x less feature-gather traffic and conditioned-MLP
    # compute). Train with neo360_proposal_loss (MSE on fine + interlevel
    # bound on the prop histogram + distortion).
    use_proposal: bool = False
    num_prop_samples: int = 64
    # uniform mass added to the prop histogram before resampling (MipNeRF's
    # resample_padding): keeps exploration on held-out views where the
    # unconditioned prop can be over-confident
    resample_padding: float = 0.01
    # width of the grid-lift rows (nn/triplane.py GridEncoder.lift_dim);
    # None = reference 512-ch lift
    lift_dim: Any = None
    # width of the encoder's DepthPillarEncoder/PillarAggregator latents
    # (GridEncoder.latent_size). The reference hardcodes 512
    # (encoder_tp_fusion_conv.py:263-373); profiling shows the 786k-point
    # depth_fc matmuls + pillar reductions are ~35% of the train step, all
    # linear-to-quadratic in this width. Narrower widths are a quality-gated
    # fast-preset knob (fixture A/B at matched wall clock, BASELINE.md).
    encoder_width: int = 512
    # TriPillarAggregator hidden width (GridEncoder.pillar_width); the
    # pillar hidden layer is ~57% of encoder MACs for three scalar logits
    # per cell. None = encoder_width (reference parity).
    pillar_width: Any = None
    # DepthPillarEncoder hidden relu layers (GridEncoder.depth_fc_layers);
    # 2 = reference parity, 1 is a quality-gated fast knob (~1/3 of the
    # 786k-point depth_fc cost).
    depth_fc_layers: int = 2
    # tri-plane channels (GridEncoder.plane_dim / FloorplanConvNet conv4);
    # 128 = reference parity. The fine-level plane-table gathers and their
    # backward scatters (the largest post-encoder block of the train step)
    # scale linearly in this width.
    plane_dim: int = 128

    def setup(self):
        # nn.remat: the encoder's 64^3-grid activations are recomputed in the
        # backward pass instead of being stored in HBM (train arg is static).
        enc_cls = (nn.remat(GridEncoder, static_argnums=(5,))
                   if self.remat_encoder else GridEncoder)
        self.encoder = enc_cls(grid_size=self.grid_size,
                               dtype=self.compute_dtype,
                               lift_dim=self.lift_dim,
                               latent_size=self.encoder_width,
                               pillar_width=self.pillar_width,
                               depth_fc_layers=self.depth_fc_layers,
                               plane_dim=self.plane_dim,
                               name="encoder")
        if self.use_proposal:
            self.fg_prop_mlp = PropMLP(dtype=self.compute_dtype,
                                       name="fg_prop_mlp")
            self.bg_prop_mlp = PropMLP(dtype=self.compute_dtype,
                                       name="bg_prop_mlp")
        else:
            self.fg_coarse_mlp = NeRFTPMLP(dtype=self.compute_dtype,
                                           name="fg_coarse_mlp")
            self.bg_coarse_mlp = NeRFTPMLP(dtype=self.compute_dtype,
                                           name="bg_coarse_mlp")
        self.fg_fine_mlp = NeRFTPMLP(dtype=self.compute_dtype,
                                     name="fg_fine_mlp")
        self.bg_fine_mlp = NeRFTPMLP(dtype=self.compute_dtype,
                                     name="bg_fine_mlp")
        # project-then-gather: bilinear interpolation commutes with channel
        # projection, so each MLP's first-layer local block (512 -> 128) is
        # factored out and applied to the pixel-latent MAP once per encode.
        # The per-sample gather then moves 128 channels instead of 512 — a 4x
        # cut of what profiling showed to be a dominant cost. The factored
        # parameterization spans exactly the same function class (a 128x512
        # block has rank <= 128 either way); border padding keeps corner
        # weights summing to 1 so the factoring is exact.
        branches = (("fg_f", "bg_f") if self.use_proposal
                    else ("fg_c", "fg_f", "bg_c", "bg_f"))
        self.local_projs = {
            name: nn.Dense(self.local_proj_dim, use_bias=False,
                           dtype=self.compute_dtype,
                           name=f"local_proj_{name}")
            for name in branches}

    def encode_images(self, src_imgs, train: bool = False):
        """The frozen prefix of `encode`: SpatialEncoder pixel latents
        (NV, H/2, W/2, 512). The optimize/finetune freeze protocol
        (reference neo360/model.py:957-981) freezes exactly this module
        (BN eval), so for a fixed source stack the output is a
        run-constant — cache it and pass as `pixel_latent` to skip the
        ResNet fwd+bwd every step."""
        return self.encoder.spatial_encoder(src_imgs, train)

    def encode(self, src_imgs, src_poses, src_focal, src_c,
               train: bool = False, pixel_latent=None):
        """-> (plane corner-tables, {branch: local corner-table}, hw info).

        Every map that will be point-indexed is re-laid-out as a 2x2
        corner-neighborhood table (ops.interpolate.build_corner_table): the
        per-sample indexing then needs ONE row-gather instead of four. The
        tables are built once per encode (dense shifted copies) and stored in
        `compute_dtype` — bf16 rows measured ~1.65x faster to gather on v5e
        (scripts/bench_gather.py) and the backward scatter issues 4x fewer
        descriptors.
        """
        planes, pixel_latent = self.encoder(
            src_imgs, src_poses, src_focal, src_c, train, pixel_latent)
        table_dtype = self.compute_dtype
        plane_tables = tuple(
            build_corner_table(p, "zeros", dtype=table_dtype) for p in planes)
        plane_hw = planes[0].shape[1:3]
        # fg/bg branch pairs share one stacked table (fg rows = views [:NV],
        # bg rows = views [NV:]): the fine level then samples local latents
        # with ONE row-gather (and ONE backward scatter-add) per level instead
        # of two — the scatter pays the table read+write once. Values are
        # bitwise those of two separate per-branch tables.
        pairs = (("f", ("fg_f", "bg_f")),) if self.use_proposal else (
            ("c", ("fg_c", "bg_c")), ("f", ("fg_f", "bg_f")))
        local_tables = {}
        for name, (kf, kb) in pairs:
            stacked = jnp.concatenate(
                [self.local_projs[kf](pixel_latent),
                 self.local_projs[kb](pixel_latent)], axis=0)
            local_tables[name] = build_corner_table(stacked, "border",
                                                    dtype=table_dtype)
        latent_hw = pixel_latent.shape[1:3]
        return plane_tables, local_tables, (plane_hw, latent_hw)

    def _local_feats_pair(self, fg_samples, bg_samples, poses, focal, c,
                          stacked_table, latent_hw, image_size,
                          view_offset=None, total_views=None):
        """Pixel-aligned projected latents for the fg AND bg branches in one
        gather (reference model.py:239-264 ran the equivalent twice).

        fg_samples/bg_samples: (B, S, 3) world points with equal S. The
        stacked table holds the fg branch's projected latent map at view rows
        [:NV] and the bg branch's at [NV:] (see `encode`), so concatenating
        the two uv sets along the view axis turns the two samplings into one
        table_sample — one backward scatter-add instead of two. Border
        padding; uv normalization is latent_scaling/image_size
        (resnet.py:107-129). Returns (fg latent, bg latent, fg cam points),
        each latent (NV, B*S, local_proj_dim)."""
        nv = self.num_src_views
        fg_cam = geometry.world2camera(fg_samples.reshape(1, -1, 3),
                                       poses, ns=nv)
        bg_cam = geometry.world2camera(bg_samples.reshape(1, -1, 3),
                                       poses, ns=nv)
        focal2 = jnp.stack([focal[0], -focal[0]])[None]
        uv_fg = geometry.projection(fg_cam, focal2, c[:1], nv)
        uv_bg = geometry.projection(bg_cam, focal2, c[:1], nv)
        scale = latent_scaling(latent_hw) / jnp.asarray(
            image_size, dtype=jnp.float32)
        uv = jnp.concatenate([uv_fg, uv_bg], axis=0) * scale - 1.0
        latent = table_sample(stacked_table, uv, latent_hw,
                              padding_mode="border",
                              view_offset=view_offset,
                              total_views=total_views)
        return latent[:nv], latent[nv:], fg_cam

    def __call__(self, rays: Dict[str, jnp.ndarray], randomized: bool,
                 white_bkgd: bool, out_depth: bool = False,
                 encoded: Optional[Tuple] = None, train: bool = False,
                 pixel_latent: Optional[jnp.ndarray] = None):
        """rays: rays_o/rays_d/viewdirs (B,3), src_imgs (NV,H,W,3),
        src_poses (NV,4,4), src_focal (NV,), src_c (NV,2).
        `pixel_latent`: cached frozen SpatialEncoder output (see
        `encode_images`); only consulted when `encoded` is None.

        Returns a list (one dict per level) with comp_rgb, fg/bg parts,
        weights and sdist mids (for the distortion loss), optional depth.
        """
        if encoded is None:
            encoded = self.encode(rays["src_imgs"], rays["src_poses"],
                                  rays["src_focal"], rays["src_c"], train,
                                  pixel_latent)
        plane_tables, local_tables = encoded[0], encoded[1]
        # optional 4th element (s_idx, n_scenes): the SCENE-MIXED stage
        # trainer passes FLAT multi-scene tables (scene axis folded into the
        # view-row axis) with this scene's index — gathers then address rows
        # [s_idx*views : (s_idx+1)*views] of the shared flat tables (see
        # ops.interpolate.table_sample's flat mode).
        scene = encoded[3] if len(encoded) > 3 else None
        nv = self.num_src_views
        if scene is not None:
            s_idx, n_scenes = scene
            plane_off, plane_tot = s_idx * nv, n_scenes * nv
            local_off, local_tot = s_idx * 2 * nv, n_scenes * 2 * nv
        else:
            plane_off = plane_tot = local_off = local_tot = None
        # the map sizes are recomputed from the (static) table shapes rather
        # than taken from encode()'s hw tuple: when `encoded` is threaded
        # through a jit boundary as an argument (the encode-once render
        # path), int tuple leaves arrive as traced scalars, which cannot
        # drive reshapes. Tables are (NV, H+1, W+1, 4C).
        plane_hw = (plane_tables[0].shape[1] - 1, plane_tables[0].shape[2] - 1)
        lt0 = next(iter(local_tables.values()))
        latent_hw = (lt0.shape[1] - 1, lt0.shape[2] - 1)
        h_img, w_img = rays["src_imgs"].shape[1:3]
        image_size = (w_img, h_img)
        poses = rays["src_poses"]

        near = jnp.full_like(rays["rays_o"][..., :1], 1e-4)
        far = spherical.intersect_sphere(rays["rays_o"], rays["rays_d"])
        # Rays that miss the unit sphere (possible when normalized camera
        # norms exceed 1 at wide FOV) would give far < near -> negative
        # interval widths -> diverging alphas. The reference hard-asserts the
        # invariant (helper.py:271); we clamp so stray rays degrade
        # gracefully instead of poisoning the batch.
        far = jnp.maximum(far, 2e-4)

        viewdirs_cam = geometry.world2camera_viewdirs(
            rays["viewdirs"][None], poses, ns=nv)          # (NV, B, 3)
        viewdirs_enc_all = encoding.pos_enc(viewdirs_cam, 0, self.deg_view)

        results: List[Dict[str, Any]] = []
        fg_t_vals = bg_t_vals = fg_weights = bg_weights = None

        for i_level in range(self.num_levels):
            key = self.make_rng("sampling") if randomized else None
            key2 = self.make_rng("sampling") if randomized else None
            is_prop_level = self.use_proposal and i_level == 0
            if i_level == 0:
                n_level0 = (self.num_prop_samples if self.use_proposal
                            else self.num_coarse_samples)
                fg_t_vals, fg_samples = sampling.sample_along_rays_nerfpp(
                    rays["rays_o"], rays["rays_d"], n_level0,
                    near, far, randomized, self.lindisp, in_sphere=True,
                    key=key)
                bg_t_vals, bg_samples, bg_linear = (
                    sampling.sample_along_rays_nerfpp(
                        rays["rays_o"], rays["rays_d"],
                        n_level0, near, far, randomized,
                        self.lindisp, in_sphere=False,
                        far_uncontracted=self.far_uncontracted, key=key2))
                if not self.use_proposal:
                    fg_mlp, bg_mlp = self.fg_coarse_mlp, self.bg_coarse_mlp
            else:
                pad = self.resample_padding if self.use_proposal else 0.0
                fg_t_mids = 0.5 * (fg_t_vals[..., 1:] + fg_t_vals[..., :-1])
                fg_t_vals, fg_samples = sampling.sample_pdf_nerfpp(
                    fg_t_mids, fg_weights[..., 1:-1] + pad, rays["rays_o"],
                    rays["rays_d"], fg_t_vals, self.num_fine_samples,
                    randomized, in_sphere=True, key=key,
                    merge=not self.use_proposal)
                bg_t_mids = 0.5 * (bg_t_vals[..., 1:] + bg_t_vals[..., :-1])
                bg_t_vals, bg_samples, bg_linear = sampling.sample_pdf_nerfpp(
                    bg_t_mids, bg_weights[..., 1:-1] + pad, rays["rays_o"],
                    rays["rays_d"], bg_t_vals, self.num_fine_samples,
                    randomized, in_sphere=False, far=far,
                    far_uncontracted=self.far_uncontracted, key=key2,
                    merge=not self.use_proposal)
                fg_mlp, bg_mlp = self.fg_fine_mlp, self.bg_fine_mlp

            b, s_fg = fg_samples.shape[:2]
            s_bg = bg_samples.shape[1]

            if is_prop_level:
                # cheap unconditioned densities; no feature indexing, no
                # view replication, rgb identically zero (never trained on)
                fg_sigma = nn.softplus(
                    self.fg_prop_mlp(fg_samples) + self.density_bias)
                bg_sigma = nn.softplus(
                    self.bg_prop_mlp(bg_samples) + self.density_bias)
                fg_rgb = jnp.zeros(fg_sigma.shape[:-1] + (3,))
                bg_rgb = jnp.zeros(bg_sigma.shape[:-1] + (3,))
            else:
                # fg+bg merged feature indexing: one tri-plane gather over
                # the concatenated point set and one local gather from the
                # stacked branch table — halves the number of backward
                # scatter-adds, each of which pays a full table read+write
                # regardless of index count. fg and bg sample counts are
                # equal in every preset (reference neo360/model.py:169-171),
                # which the batch-axis concat/split relies on.
                bg_pts = bg_linear[..., :3]
                assert fg_samples.shape == bg_pts.shape, (
                    "fg/bg sample shapes must match for merged indexing")
                both = jnp.concatenate([fg_samples, bg_pts], axis=0)
                world = index_grid_tables(both, plane_tables, plane_hw,
                                          poses, nv,
                                          view_offset=plane_off,
                                          total_views=plane_tot)
                n_half = b * s_fg
                world_fg, world_bg = world[:, :n_half], world[:, n_half:]
                tab = local_tables["f" if (self.use_proposal
                                           or i_level > 0) else "c"]
                local_fg, local_bg, fg_cam = self._local_feats_pair(
                    fg_samples, bg_pts, poses, rays["src_focal"],
                    rays["src_c"], tab, latent_hw, image_size,
                    view_offset=local_off, total_views=local_tot)

                bg_cam = geometry.world2camera(
                    bg_samples[..., :3].reshape(1, -1, 3), poses, ns=nv)
                bg_depth_ch = jnp.broadcast_to(
                    bg_samples[..., 3].reshape(1, -1, 1),
                    bg_cam.shape[:-1] + (1,))
                bg_cam4 = jnp.concatenate([bg_cam, bg_depth_ch], axis=-1)

                def predict(mlp, cam_pts, world_lat, local_lat, n_samples,
                            key_noise):
                    x = encoding.pos_enc(cam_pts, self.min_deg_point,
                                         self.max_deg_point)
                    x = x.reshape(nv * b, n_samples, -1)
                    wl = world_lat.reshape(nv * b, n_samples, -1)
                    ll = local_lat.reshape(nv * b, n_samples, -1)
                    vd = viewdirs_enc_all.reshape(nv * b, -1)
                    raw_rgb, raw_sigma = mlp(x, vd, wl, ll, nv)
                    if self.density_noise != 0.0 and randomized:
                        raw_sigma = raw_sigma + jax.random.uniform(
                            key_noise, raw_sigma.shape) * self.density_noise
                    sigma = nn.softplus(raw_sigma + self.density_bias)
                    rgb = nn.sigmoid(raw_rgb)
                    rgb = rgb * (1 + 2 * self.rgb_padding) - self.rgb_padding
                    return rgb, sigma

                nkey1 = self.make_rng("sampling") if (
                    randomized and self.density_noise != 0.0) else None
                nkey2 = self.make_rng("sampling") if (
                    randomized and self.density_noise != 0.0) else None
                fg_rgb, fg_sigma = predict(fg_mlp, fg_cam, world_fg,
                                           local_fg, s_fg, nkey1)
                bg_rgb, bg_sigma = predict(bg_mlp, bg_cam4, world_bg,
                                           local_bg, s_bg, nkey2)

            (fg_comp, fg_acc, fg_weights, bg_lambda, fg_depth) = (
                render.volumetric_rendering_nerfpp(
                    fg_rgb, fg_sigma, fg_t_vals, rays["rays_d"],
                    white_bkgd=white_bkgd, in_sphere=True, t_far=far))
            (bg_comp, bg_acc, bg_weights, _, bg_depth) = (
                render.volumetric_rendering_nerfpp(
                    bg_rgb, bg_sigma, bg_t_vals, rays["rays_d"],
                    white_bkgd=white_bkgd, in_sphere=False))

            comp_rgb = fg_comp + bg_lambda * bg_comp

            # sdist mids for the distortion loss (reference model.py:546-557)
            fg_sdist = 0.5 * (fg_t_vals[..., 1:] + fg_t_vals[..., :-1])
            last = fg_sdist[..., -1:] + (fg_sdist[..., -1:]
                                         - fg_sdist[..., -2:-1])
            fg_sdist = jnp.concatenate([fg_sdist, last], axis=-1)
            bg_sdist = 0.5 * (bg_t_vals[..., 1:] + bg_t_vals[..., :-1])
            bg_sdist = jnp.concatenate([bg_sdist, bg_t_vals[..., -1:]],
                                       axis=-1)

            out = {
                "rgb": comp_rgb, "fg_rgb": fg_comp, "bg_rgb": bg_comp,
                "fg_acc": fg_acc, "bg_acc": bg_acc, "bg_lambda": bg_lambda,
                "fg_weights": fg_weights, "bg_weights": bg_weights,
                "fg_sdist": fg_sdist, "bg_sdist": bg_sdist,
                "fg_tvals": fg_t_vals, "bg_tvals": bg_t_vals, "far": far,
            }
            if out_depth:
                out["depth"] = fg_depth + bg_lambda[..., 0] * bg_depth
                out["fg_depth"] = fg_depth
            results.append(out)
        return results


SRC_KEYS = ("src_imgs", "src_poses", "src_focal", "src_c")


def make_scene_stage_fns(model: "NeRFTP", white_bkgd: bool = False,
                         mixed: bool = False):
    """(encode_fn, loss_fn) for train.loop.make_scene_stage_trainer.

    encode_fn runs NeRFTP.encode with BatchNorm in train mode (stats update
    once per stage); loss_fn evaluates the ray branch against the fixed
    corner tables and returns the model's training loss (MSE on fine +
    interlevel bound when use_proposal, else MSE coarse+fine; + distortion).
    Differentiable args are (ray_params, tables) — the trainer pulls the
    table cotangent back through encode_fn's VJP.

    With `mixed=True` (the SCENE-MIXED stage): `src` leaves carry a leading
    scene axis S and every step's ray batch is (S, B, ...) — rays from ALL
    S scenes mixed into each step's gradient. Quality rationale: a stage of
    K consecutive steps on ONE frozen scene wrecks training (fixture A/Bs:
    val PSNR 26.6 -> 22.6 at K=4, -> 15.4 at K=8 — Adam momentum couples to
    the scene blocks), while mixing S scenes per step keeps the per-step
    gradient as scene-diverse as the reference's per-step scene draw
    (nerds360_ae.py:515) at K/S-fold encoder amortization.
    """
    from neo360_tpu.ops.losses import img2mse

    def _encode_one(enc_params, model_state, src):
        (pt, lt, _), mut = model.apply(
            {"params": enc_params, "batch_stats": model_state},
            src["src_imgs"], src["src_poses"], src["src_focal"],
            src["src_c"], True, method=NeRFTP.encode,
            mutable=["batch_stats"])
        return (pt, lt), mut["batch_stats"]

    def _loss_one(ray_params, pt, lt, src, batch, key, scene=None):
        rays = {k: batch[k] for k in ("rays_o", "rays_d", "viewdirs")}
        rays.update({k: src[k] for k in SRC_KEYS})
        # __call__ recomputes the (static) map sizes from the table shapes,
        # so the hw element of the encoded tuple is not needed here
        enc = (pt, lt, None) if scene is None else (pt, lt, None, scene)
        out = model.apply({"params": ray_params}, rays, True, white_bkgd,
                          encoded=enc, train=False,
                          rngs={"sampling": key})
        l1 = img2mse(out[1]["rgb"], batch["target"])
        if model.use_proposal:
            loss = l1 + neo360_interlevel_loss(out) \
                + neo360_distortion_loss(out)
        else:
            l0 = img2mse(out[0]["rgb"], batch["target"])
            loss = l0 + l1 + neo360_distortion_loss(out)
        return loss, l1

    if not mixed:
        def encode_fn(enc_params, model_state, src):
            tables, bs = _encode_one(enc_params, model_state, src)
            return tables, (None, bs)

        def loss_fn(ray_params, tables, src, batch, key):
            loss, l1 = _loss_one(ray_params, tables[0], tables[1], src,
                                 batch, key)
            return loss, {"mse": l1}

        return encode_fn, loss_fn

    def encode_fn(enc_params, model_state, src):
        # vmap over the scene axis: one batched encoder program for all S
        # scenes; per-scene BatchNorm batch_stats are averaged into the
        # running stats (each scene's stack is an equal-size BN batch).
        # The scene axis is then FLATTENED into each table's view-row axis:
        # the vmapped loss below closes over these flat tables (unbatched
        # under vmap) and addresses its scene's rows via view offsets, so
        # per-step table gathers and backward scatter-adds lower as ONE
        # flat op instead of XLA's ~2.6x-slower batched form (round-3
        # xplane profile; ops.interpolate.table_sample flat mode).
        (pt, lt), bs = jax.vmap(
            lambda s: _encode_one(enc_params, model_state, s))(src)
        pt = tuple(p.reshape((-1,) + p.shape[2:]) for p in pt)
        lt = {k: v.reshape((-1,) + v.shape[2:]) for k, v in lt.items()}
        new_bs = jax.tree_util.tree_map(lambda x: x.mean(axis=0), bs)
        return (pt, lt), (None, new_bs)

    def loss_fn(ray_params, tables, src, batch, key):
        pt, lt = tables
        n_scenes = batch["target"].shape[0]
        keys = jax.random.split(key, n_scenes)
        sidx = jnp.arange(n_scenes, dtype=jnp.int32)
        losses, l1s = jax.vmap(
            lambda s, b, k, si: _loss_one(ray_params, pt, lt, s, b, k,
                                          scene=(si, n_scenes))
        )(src, batch, keys, sidx)
        return losses.mean(), {"mse": l1s.mean()}

    return encode_fn, loss_fn


def neo360_distortion_loss(results, mult: float = 0.01) -> jnp.ndarray:
    """Distortion on the FINE level's fg and bg histograms with uniform
    1/N interval (reference model.py:1246-1260, which feeds the CUDA
    eff_distloss; here it is the O(S) prefix-sum op).

    Divergence from the reference (bug not ported): bg midpoints DESCEND
    (inverse depth 1 -> 0), and the prefix-sum distortion formula assumes
    ascending order — the reference feeds descending mids to its CUDA kernel
    and silently gets a negative (wrong-sign) bg term. We flip bg to
    ascending so both terms are the true non-negative distortion.
    """
    fine = results[-1]
    n = fine["fg_weights"].shape[-1]
    loss = mult * eff_distloss(fine["fg_weights"], fine["fg_sdist"], 1.0 / n)
    loss += mult * eff_distloss(jnp.flip(fine["bg_weights"], -1),
                                jnp.flip(fine["bg_sdist"], -1), 1.0 / n)
    return loss


def _hist_edges_fg(tvals: jnp.ndarray, far: jnp.ndarray) -> jnp.ndarray:
    """Point-convention t_vals (B,S) -> ascending edges (B,S+1): weight i
    covers [t_i, t_{i+1}] with the last interval closed by the per-ray
    sphere-exit `far` (matching volumetric_rendering_nerfpp in_sphere)."""
    return jnp.concatenate([tvals, jnp.maximum(far, tvals[..., -1:])], -1)


def _hist_edges_bg(tvals: jnp.ndarray):
    """Descending s-space t_vals (B,S) -> (ascending edges (B,S+1), flipped
    weights order): weight i covers [t_{i+1}, t_i]; after the flip, entry j
    covers [a_{j-1}, a_j] with a = flip(t); the first (formerly-infinite)
    interval is clamped to a small epsilon bin below a_0 = 0."""
    a = jnp.flip(tvals, axis=-1)
    return jnp.concatenate([a[..., :1] - 1e-3, a], axis=-1)


def neo360_interlevel_loss(results, mult: float = 1.0) -> jnp.ndarray:
    """Proposal-to-fine histogram bound for `use_proposal` models: the prop
    level's fg/bg histograms must upper-bound the (stop-gradient) fine
    histograms (MipNeRF-360 lossfun_outer, reference mipnerf360/model.py:
    724-733, applied per NeRF++ branch). Both levels share the fg t-space
    [near, far] / bg s-space [0, 1] parameterizations."""
    from neo360_tpu.ops.losses import lossfun_outer

    prop, fine = results[0], results[-1]
    sg = jax.lax.stop_gradient

    fg_c = sg(_hist_edges_fg(fine["fg_tvals"], fine["far"]))
    fg_w = sg(fine["fg_weights"])
    loss = jnp.mean(lossfun_outer(
        fg_c, fg_w, _hist_edges_fg(prop["fg_tvals"], prop["far"]),
        prop["fg_weights"]))

    bg_c = sg(_hist_edges_bg(fine["bg_tvals"]))
    bg_w = sg(jnp.flip(fine["bg_weights"], -1))
    loss += jnp.mean(lossfun_outer(
        bg_c, bg_w, _hist_edges_bg(prop["bg_tvals"]),
        jnp.flip(prop["bg_weights"], -1)))
    return mult * loss
