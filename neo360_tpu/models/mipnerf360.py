"""MipNeRF-360 — reference models/mipnerf360/model.py, re-built in Flax.

Three levels (2 proposal rounds of 64 samples with a density-only PropMLP,
then 32 NeRF samples through an 8x1024 MLP), s-space sampling with weight
dilation and annealed resampling logits, conical-frustum Gaussians pushed
through the scene contraction (jax.vmap(jax.jacfwd) — the reference needed
functorch for this, mipnerf360/helper.py:33-66), lifted IPE over the
tesselated-icosahedron basis.

All three levels trace into ONE XLA program; the 8x1024 trunk is pure MXU
work. Randomness via the "sampling" RNG collection.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neo360_tpu.core import encoding, mip, render

_KAIMING = nn.initializers.kaiming_uniform()


class MipNeRF360MLP(nn.Module):
    """Shared trunk for PropMLP / NeRFMLP (reference model.py:30-173)."""

    netdepth: int = 8
    netwidth: int = 256
    bottleneck_width: int = 256
    netdepth_condition: int = 1
    netwidth_condition: int = 128
    min_deg_point: int = 0
    max_deg_point: int = 12
    skip_layer: int = 4
    skip_layer_dir: int = 4
    num_rgb_channels: int = 3
    deg_view: int = 4
    density_bias: float = -1.0
    rgb_premultiplier: float = 1.0
    rgb_bias: float = 0.0
    rgb_padding: float = 0.001
    basis_shape: str = "icosahedron"
    basis_subdivision: int = 2
    disable_rgb: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.pos_basis = jnp.asarray(
            encoding.generate_basis(self.basis_shape, self.basis_subdivision))

    def predict_density(self, means, covs):
        """Contract -> lift -> IPE -> trunk. Returns (raw_density, trunk_x).

        The contracted Gaussian is detached (parity with the reference's
        .detach() in contract, helper.py:63-66).
        """
        means, covs = encoding.track_linearize(encoding.contract, means, covs)
        means = jax.lax.stop_gradient(means)
        covs = jax.lax.stop_gradient(covs)

        lifted_means, lifted_vars = encoding.lift_and_diagonalize(
            means, covs, self.pos_basis)
        # J cov J^T loses PSD-ness to f32 rounding; a variance of even -5e-5
        # scaled by 2^(2*max_deg) overflows exp() in the IPE to inf and the
        # first matmul turns it into NaN. Variances are physically >= 0.
        lifted_vars = jnp.maximum(lifted_vars, 0.0)
        x = encoding.integrated_pos_enc(
            lifted_means, lifted_vars, self.min_deg_point, self.max_deg_point)

        dense = lambda w, name: nn.Dense(w, kernel_init=_KAIMING,
                                         dtype=self.dtype, name=name)
        inputs = x
        for idx in range(self.netdepth):
            x = nn.relu(dense(self.netwidth, f"pts_{idx}")(x))
            if idx % self.skip_layer == 0 and idx > 0:
                x = jnp.concatenate([x, inputs], axis=-1)
        raw_density = dense(1, "density")(x)[..., 0].astype(jnp.float32)
        return raw_density, x

    @nn.compact
    def __call__(self, gaussians: Tuple[jnp.ndarray, jnp.ndarray],
                 viewdirs: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        means, covs = gaussians
        raw_density, x = self.predict_density(means, covs)
        density = nn.softplus(raw_density + self.density_bias)

        if self.disable_rgb:
            return {"density": density, "rgb": jnp.zeros_like(means)}

        dense = lambda w, name: nn.Dense(w, kernel_init=_KAIMING,
                                         dtype=self.dtype, name=name)
        bottleneck = dense(self.bottleneck_width, "bottleneck")(x)

        dir_enc = encoding.pos_enc(viewdirs, 0, self.deg_view)
        dir_enc = jnp.broadcast_to(
            dir_enc[..., None, :],
            bottleneck.shape[:-1] + (dir_enc.shape[-1],))
        x = jnp.concatenate([bottleneck, dir_enc], axis=-1)

        inputs = x
        for idx in range(self.netdepth_condition):
            x = nn.relu(dense(self.netwidth_condition, f"views_{idx}")(x))
            if idx % self.skip_layer_dir == 0 and idx > 0:
                x = jnp.concatenate([x, inputs], axis=-1)

        rgb = nn.sigmoid(self.rgb_premultiplier * dense(
            self.num_rgb_channels, "rgb")(x).astype(jnp.float32)
            + self.rgb_bias)
        rgb = rgb * (1.0 + 2.0 * self.rgb_padding) - self.rgb_padding
        return {"density": density, "rgb": rgb}


class MipNeRF360(nn.Module):
    """Multi-level proposal + NeRF sampling (reference model.py:199-365)."""

    num_prop_samples: int = 64
    num_nerf_samples: int = 32
    num_levels: int = 3
    bg_intensity_range: Tuple[float, float] = (1.0, 1.0)
    anneal_slope: float = 10.0
    stop_level_grad: bool = True
    ray_shape: str = "cone"
    disable_integration: bool = False
    single_jitter: bool = True
    dilation_multiplier: float = 0.5
    dilation_bias: float = 0.0025
    resample_padding: float = 0.0
    opaque_background: bool = True
    nerf_netwidth: int = 1024
    prop_netdepth: int = 4
    prop_netwidth: int = 256
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rays: Dict[str, jnp.ndarray], train_frac,
                 randomized: bool, near, far):
        """rays: rays_o, rays_d, viewdirs (B,3), radii (B,1).

        Returns (renderings per level, ray_history per level).
        """
        mlps = [MipNeRF360MLP(netdepth=self.prop_netdepth,
                              netwidth=self.prop_netwidth, disable_rgb=True,
                              dtype=self.compute_dtype,
                              name=f"prop_mlp_{i}")
                for i in range(self.num_levels - 1)]
        mlps.append(MipNeRF360MLP(netwidth=self.nerf_netwidth,
                                  dtype=self.compute_dtype,
                                  name="nerf_mlp"))

        bsz = rays["rays_o"].shape[0]
        _, s_to_t = mip.construct_ray_warps(near, far)
        init_s_near, init_s_far = 0.0, 1.0

        sdist = jnp.concatenate(
            [jnp.full((bsz, 1), init_s_near), jnp.full((bsz, 1), init_s_far)],
            axis=-1)
        weights = jnp.ones((bsz, 1))
        prod_num_samples = 1

        ray_history: List[Dict[str, Any]] = []
        renderings: List[Dict[str, Any]] = []

        for i_level in range(self.num_levels):
            is_prop = i_level < self.num_levels - 1
            num_samples = (self.num_prop_samples if is_prop
                           else self.num_nerf_samples)

            dilation = (self.dilation_bias + self.dilation_multiplier
                        * (init_s_far - init_s_near) / prod_num_samples)
            prod_num_samples *= num_samples

            if self.stop_level_grad:
                # Stop grads BEFORE the resampling math. The reference's
                # sdist.detach() (model.py:309-310) cuts the torch graph so
                # log(weights) is never differentiated; in JAX the detached
                # branch would still run log's VJP with a zero cotangent —
                # 0 * (1/w) = NaN once converged weights hit exactly 0.
                sdist = jax.lax.stop_gradient(sdist)
                weights = jax.lax.stop_gradient(weights)

            if i_level > 0 and (self.dilation_bias > 0
                                or self.dilation_multiplier > 0):
                sdist, weights = mip.max_dilate_weights(
                    sdist, weights, dilation,
                    domain=(init_s_near, init_s_far), renormalize=True)
                sdist = sdist[..., 1:-1]
                weights = weights[..., 1:-1]

            if self.anneal_slope > 0:
                anneal = (self.anneal_slope * train_frac) / (
                    (self.anneal_slope - 1) * train_frac + 1)
            else:
                anneal = 1.0

            logits_resample = jnp.where(
                sdist[..., 1:] > sdist[..., :-1],
                anneal * jnp.log(weights + self.resample_padding),
                -jnp.inf)
            # Degenerate-row guard: once the model converges, a ray's whole
            # histogram mass can sit in the two edge intervals that the
            # dilation slice above drops — leaving all weights 0 and every
            # logit -inf, which softmaxes to NaN (the reference has the same
            # hazard; its NaN guards are commented out, neo360/model.py:757).
            # Fall back to uniform resampling for such rays.
            all_dead = jnp.all(jnp.isneginf(logits_resample), axis=-1,
                               keepdims=True)
            logits_resample = jnp.where(all_dead, 0.0, logits_resample)

            key = self.make_rng("sampling") if randomized else None
            sdist = mip.sample_intervals(
                sdist, logits_resample, num_samples, randomized, key,
                single_jitter=self.single_jitter,
                domain=(init_s_near, init_s_far))

            if self.stop_level_grad:
                sdist = jax.lax.stop_gradient(sdist)

            tdist = s_to_t(sdist)
            gaussians = mip.cast_rays_gaussian(
                tdist, rays["rays_o"], rays["rays_d"], rays["radii"],
                self.ray_shape, diag=False)
            if self.disable_integration:
                gaussians = (gaussians[0], jnp.zeros_like(gaussians[1]))

            ray_results = mlps[i_level](gaussians, rays["viewdirs"])

            weights = render.compute_alpha_weights(
                ray_results["density"], tdist, rays["rays_d"],
                opaque_background=self.opaque_background)[0]

            if self.bg_intensity_range[0] == self.bg_intensity_range[1]:
                bg_rgbs = self.bg_intensity_range[0]
            elif not randomized:
                bg_rgbs = sum(self.bg_intensity_range) / 2.0
            else:
                bg_key = self.make_rng("sampling")
                bg_rgbs = (jax.random.uniform(bg_key, (3,))
                           * (self.bg_intensity_range[1]
                              - self.bg_intensity_range[0])
                           + self.bg_intensity_range[0])

            rendering = render.render_mip(
                ray_results["rgb"], weights, tdist, bg_rgbs,
                compute_depth=True)

            ray_results = dict(ray_results, sdist=sdist, weights=weights)
            ray_history.append(ray_results)
            renderings.append(rendering)

        return renderings, ray_history


def interlevel_loss(ray_history) -> jnp.ndarray:
    """Proposal histograms must bound the (detached) NeRF histogram
    (reference model.py:724-733)."""
    from neo360_tpu.ops.losses import lossfun_outer
    c = jax.lax.stop_gradient(ray_history[-1]["sdist"])
    w = jax.lax.stop_gradient(ray_history[-1]["weights"])
    total = 0.0
    for ray_results in ray_history[:-1]:
        total += jnp.mean(lossfun_outer(c, w, ray_results["sdist"],
                                        ray_results["weights"]))
    return total


def distortion_loss(ray_history) -> jnp.ndarray:
    """O(S) distortion on the final level's s-space histogram
    (reference model.py:735-740)."""
    from neo360_tpu.ops.losses import distortion_loss as dist
    return jnp.mean(dist(ray_history[-1]["sdist"],
                         ray_history[-1]["weights"]))
