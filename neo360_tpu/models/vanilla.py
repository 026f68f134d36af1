"""Vanilla NeRF (coarse + fine) — reference models/vanilla_nerf/model.py.

Pure-functional: `VanillaNeRF` is a Flax module whose `__call__` runs BOTH
levels in one traced program (coarse stratified -> PDF resample -> fine),
so a train step is exactly one XLA executable. Randomness comes from the
"sampling" RNG collection.

Activation parity (reference model.py:195-204): rgb = sigmoid padded by
+-0.001; sigma = softplus(raw - 1).
"""

from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp

from neo360_tpu.core import encoding, render, sampling
from neo360_tpu.nn.mlp import NeRFMLP


class VanillaNeRF(nn.Module):
    num_levels: int = 2
    min_deg_point: int = 0
    max_deg_point: int = 10
    deg_view: int = 4
    num_coarse_samples: int = 64
    num_fine_samples: int = 128
    noise_std: float = 0.0
    lindisp: bool = False
    rgb_padding: float = 0.001
    sigma_bias: float = -1.0

    @nn.compact
    def __call__(self, rays: Dict[str, jnp.ndarray], randomized: bool,
                 white_bkgd: bool, near, far) -> List[Dict[str, Any]]:
        """rays: dict with rays_o, rays_d, viewdirs each (B, 3).

        Returns one dict per level: rgb, acc, depth, weights, t_vals.
        """
        coarse_mlp = NeRFMLP(name="coarse_mlp")
        fine_mlp = NeRFMLP(name="fine_mlp")

        results = []
        t_vals, weights = None, None
        for i_level in range(self.num_levels):
            key = self.make_rng("sampling") if randomized else None
            if i_level == 0:
                t_vals, samples = sampling.sample_along_rays(
                    rays["rays_o"], rays["viewdirs"],
                    self.num_coarse_samples, near, far,
                    randomized, self.lindisp, key)
                mlp = coarse_mlp
            else:
                t_mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
                t_vals, samples = sampling.sample_pdf(
                    t_mids, weights[..., 1:-1],
                    rays["rays_o"], rays["viewdirs"], t_vals,
                    self.num_fine_samples, randomized, key)
                mlp = fine_mlp

            samples_enc = encoding.pos_enc(
                samples, self.min_deg_point, self.max_deg_point)
            viewdirs_enc = encoding.pos_enc(rays["viewdirs"], 0, self.deg_view)
            raw_rgb, raw_sigma = mlp(samples_enc, viewdirs_enc)

            if self.noise_std > 0 and randomized:
                noise_key = self.make_rng("sampling")
                raw_sigma = raw_sigma + jax.random.uniform(
                    noise_key, raw_sigma.shape) * self.noise_std

            rgb = nn.sigmoid(raw_rgb)
            rgb = rgb * (1.0 + 2.0 * self.rgb_padding) - self.rgb_padding
            sigma = nn.softplus(raw_sigma + self.sigma_bias)

            comp_rgb, acc, weights, depth = render.volumetric_rendering(
                rgb, sigma, t_vals, rays["rays_d"], white_bkgd=white_bkgd)

            results.append({
                "rgb": comp_rgb,
                "acc": acc,
                "depth": depth,
                "weights": weights,
                "t_vals": t_vals,
            })
        return results
