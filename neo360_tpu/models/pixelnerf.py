"""PixelNeRF — reference models/vanilla_nerf/model_pixel.py.

Pixel-aligned conditioning: source images are ResNet-encoded once per batch;
each 3D sample is projected into every source view, bilinear-samples the
512-ch latent, and a small MLP (4x128, mid-trunk average fusion over views at
`combine_layer`) predicts density/rgb. Two levels, 64+64 samples, vanilla
compositing with ReLU sigma and plain sigmoid rgb
(model_pixel.py:140-258, 35-131).

Deliberate divergences from the reference (bugs not ported):
  - viewdir conditioning is broadcast per-ray in (ray, sample) order; the
    reference's torch.tile at model_pixel.py:230-233 interleaves it in
    (sample, ray) order, misaligning viewdirs across the batch.
  - fy is negated in the projection (like the reference's own tri-plane
    encoder, encoder_tp_fusion_conv.py:491-493); the reference PixelNeRF
    projects with +fy (model_pixel.py:209-212), sampling features vertically
    flipped.

TPU design: `encode()` is separate from ray rendering so full-image eval
encodes the source views ONCE (the reference re-encodes per 1024-ray chunk).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from neo360_tpu.core import encoding, geometry, render, sampling
from neo360_tpu.nn.mlp import combine_interleaved
from neo360_tpu.nn.resnet import SpatialEncoder, index_latent

_XAVIER = nn.initializers.xavier_uniform()


class PixelNeRFMLP(nn.Module):
    """4x128 trunk with per-view evaluation, bottleneck before view fusion
    (parity with model_pixel.py:35-131)."""

    netdepth: int = 4
    netwidth: int = 128
    netdepth_condition: int = 2
    netwidth_condition: int = 128
    skip_layer: int = 4
    combine_layer: int = 3
    latent_size: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, viewdirs_enc: jnp.ndarray,
                 latent: jnp.ndarray, num_views: int):
        """x: (NV*B, S, Dp) pos-enc'd cam-frame samples; viewdirs_enc:
        (NV*B, Dv); latent: (NV*B, S, L). Returns (raw_rgb, raw_density) at
        (B, S, ...) after view fusion."""
        dense = lambda w, name: nn.Dense(w, kernel_init=_XAVIER,
                                         dtype=self.dtype, name=name)

        x = jnp.concatenate([x, latent], axis=-1)
        inputs = x
        bottleneck = None
        for idx in range(self.netdepth):
            x = nn.relu(dense(self.netwidth, f"pts_{idx}")(x))
            if idx == self.combine_layer:
                bottleneck = dense(self.netwidth, "bottleneck")(x)
                x = combine_interleaved(x, num_views)
            if idx % self.skip_layer == 0 and idx > 0 and idx != self.combine_layer:
                x = jnp.concatenate([x, inputs], axis=-1)

        raw_density = dense(1, "density")(x)

        cond = jnp.broadcast_to(
            viewdirs_enc[..., None, :],
            bottleneck.shape[:-1] + (viewdirs_enc.shape[-1],))
        h = jnp.concatenate([bottleneck, cond], axis=-1)
        for idx in range(self.netdepth_condition):
            h = dense(self.netwidth_condition, f"views_{idx}")(h)
            if idx == 0:
                h = combine_interleaved(h, num_views)
            h = nn.relu(h)
        raw_rgb = dense(3, "rgb")(h)
        return raw_rgb.astype(jnp.float32), raw_density.astype(jnp.float32)


class PixelNeRF(nn.Module):
    num_levels: int = 2
    min_deg_point: int = 0
    max_deg_point: int = 10
    deg_view: int = 4
    num_coarse_samples: int = 64
    num_fine_samples: int = 64
    noise_std: float = 0.0
    lindisp: bool = False
    num_src_views: int = 3
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.encoder = SpatialEncoder(dtype=self.compute_dtype,
                                      name="encoder")
        self.coarse_mlp = PixelNeRFMLP(dtype=self.compute_dtype,
                                       name="coarse_mlp")
        self.fine_mlp = PixelNeRFMLP(dtype=self.compute_dtype,
                                     name="fine_mlp")

    def encode(self, src_imgs: jnp.ndarray, train: bool = False):
        """src_imgs (NV, H, W, 3) in [-1, 1] -> latent (NV, H/2, W/2, 512)."""
        return self.encoder(src_imgs, train)

    def __call__(self, rays: Dict[str, jnp.ndarray], randomized: bool,
                 white_bkgd: bool, near, far,
                 latent: Optional[jnp.ndarray] = None,
                 train: bool = False):
        """rays: rays_o/rays_d/viewdirs (B,3), src_imgs (NV,H,W,3),
        src_poses (NV,4,4), src_focal (NV,), src_c (NV,2).

        `latent` short-circuits encoding (pass `encode(src_imgs)` once when
        chunking a full image).
        """
        if latent is None:
            latent = self.encode(rays["src_imgs"], train)
        nv = self.num_src_views
        h_img, w_img = rays["src_imgs"].shape[1:3]
        image_size = (w_img, h_img)

        results = []
        t_vals, weights = None, None
        for i_level in range(self.num_levels):
            key = self.make_rng("sampling") if randomized else None
            if i_level == 0:
                t_vals, samples = sampling.sample_along_rays(
                    rays["rays_o"], rays["rays_d"],
                    self.num_coarse_samples, near, far, randomized,
                    self.lindisp, key)
                mlp = self.coarse_mlp
            else:
                t_mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
                t_vals, samples = sampling.sample_pdf(
                    t_mids, weights[..., 1:-1], rays["rays_o"],
                    rays["rays_d"], t_vals, self.num_fine_samples,
                    randomized, key)
                mlp = self.fine_mlp

            b, s, _ = samples.shape
            flat = samples.reshape(1, -1, 3)
            samples_cam = geometry.world2camera(
                flat, rays["src_poses"], ns=nv)          # (NV, B*S, 3)

            focal = jnp.stack(
                [rays["src_focal"][0], -rays["src_focal"][0]])[None]
            c = rays["src_c"][:1]
            uv = geometry.projection(samples_cam, focal, c, nv)
            lat, _ = index_latent(latent, uv, image_size,
                                  padding_mode="zeros")  # (NV, B*S, 512)

            samples_enc = encoding.pos_enc(
                samples_cam, self.min_deg_point, self.max_deg_point)
            viewdirs_cam = geometry.world2camera_viewdirs(
                rays["viewdirs"][None], rays["src_poses"], ns=nv)
            viewdirs_enc = encoding.pos_enc(viewdirs_cam, 0, self.deg_view)

            # reshape (NV, B*S, .) -> (NV*B, S, .) keeping view-major order
            samples_enc = samples_enc.reshape(nv * b, s, -1)
            lat = lat.reshape(nv * b, s, -1)
            viewdirs_enc = viewdirs_enc.reshape(nv * b, -1)

            raw_rgb, raw_sigma = mlp(samples_enc, viewdirs_enc, lat, nv)

            if self.noise_std > 0 and randomized:
                raw_sigma = raw_sigma + jax.random.uniform(
                    self.make_rng("sampling"), raw_sigma.shape) * self.noise_std

            rgb = nn.sigmoid(raw_rgb)
            sigma = nn.relu(raw_sigma)

            comp_rgb, acc, weights, depth = render.volumetric_rendering(
                rgb, sigma, t_vals, rays["rays_d"], white_bkgd=white_bkgd)
            results.append({"rgb": comp_rgb, "acc": acc, "depth": depth,
                            "weights": weights, "t_vals": t_vals})
        return results
