"""ResNet-34 feature backbone + pixel-aligned SpatialEncoder (Flax).

Replaces the reference's torchvision-pretrained `CustomResNet34` /
`SpatialEncoder` (models/neo360/encoder_pn.py:14-207, duplicated at
models/vanilla_nerf/encoder.py). Architecture parity with torchvision
resnet34 through layer3:

    conv1 7x7/2 (64) -> bn -> relu            -> latent[0]   (H/2)
    maxpool 3x3/2 -> layer1 3x BasicBlock(64) -> latent[1]   (H/4)
    layer2 4x BasicBlock(128, /2)             -> latent[2]   (H/8)
    layer3 6x BasicBlock(256, /2)             -> latent[3]   (H/16)

All four levels are bilinearly upsampled (align_corners=True) to latent[0]'s
resolution and concatenated -> 512-channel latent at half input resolution
(encoder_pn.py:89,196-207).

Data layout is NHWC (TPU conv layout). BatchNorm matches torch semantics
(eps 1e-5, running-average momentum 0.9 in flax's convention). ImageNet
weights are not bundled (zero-egress image); `convert_torch_state_dict`
loads a torchvision `resnet34().state_dict()` checkpoint when provided, and
the encoder trains fine from scratch otherwise.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from neo360_tpu.ops.interpolate import (grid_sample_2d, in_bounds_mask,
                                        resize_bilinear_align_corners)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        conv = lambda f, s, name: nn.Conv(
            f, (3, 3) if name != "downsample_conv" else (1, 1),
            strides=(s, s),
            padding=[(1, 1), (1, 1)] if name != "downsample_conv" else "VALID",
            use_bias=False, dtype=self.dtype, name=name)
        residual = x
        y = conv(self.features, self.stride, "conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = conv(self.features, 1, "conv2")(y)
        y = norm("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = conv(self.features, self.stride, "downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet34Features(nn.Module):
    """conv1..layer3 feature pyramid. Input NHWC float."""

    stage_sizes: Sequence[int] = (3, 4, 6)     # layer1..layer3
    stage_features: Sequence[int] = (64, 128, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        feats = [x]

        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])
        for stage, (blocks, width) in enumerate(
                zip(self.stage_sizes, self.stage_features)):
            for b in range(blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                x = BasicBlock(width, stride, dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(x, train)
            feats.append(x)
        return feats


class SpatialEncoder(nn.Module):
    """Pixel-aligned 512-ch latent at half input resolution."""

    latent_size: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        """images: (B, H, W, 3) normalized to [-1, 1] (reference
        util.py:get_image_to_tensor_balanced). Returns (B, H/2, W/2, 512)."""
        feats = ResNet34Features(dtype=self.dtype, name="backbone")(
            images.astype(self.dtype), train)
        target_hw = feats[0].shape[1:3]
        up = [resize_bilinear_align_corners(f, target_hw) for f in feats]
        return jnp.concatenate(up, axis=-1)


def latent_scaling(latent_hw) -> jnp.ndarray:
    """(w, h) scaling used to map pixel uv -> normalized grid coords
    (parity with encoder_pn.py:204-206): s = 2 * L / (L - 1)."""
    h, w = latent_hw
    s = jnp.asarray([w, h], dtype=jnp.float32)
    return s / (s - 1.0) * 2.0


def index_latent(latent: jnp.ndarray, uv: jnp.ndarray, image_size,
                 padding_mode: str = "border"):
    """Sample pixel-aligned features at pixel coordinates.

    latent: (B, Hl, Wl, C); uv: (B, N, 2) pixel coords in the ORIGINAL image
    frame of `image_size` = (w, h). Returns ((B, N, C), mask (B, N, 2)).
    Parity with SpatialEncoder.index (encoder_pn.py:101-152): uv is scaled by
    latent_scaling/image_size then shifted to [-1, 1]; mask = |uv_norm| <= 1.
    """
    scale = latent_scaling(latent.shape[1:3]) / jnp.asarray(
        image_size, dtype=jnp.float32)
    uv_norm = uv * scale - 1.0
    mask = in_bounds_mask(uv_norm)
    samples = grid_sample_2d(latent, uv_norm, padding_mode=padding_mode)
    return samples, mask


# ---------------------------------------------------------------------------
# torchvision weight conversion
# ---------------------------------------------------------------------------

def _conv_kernel(t) -> np.ndarray:
    # torch OIHW -> flax HWIO
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def convert_torch_state_dict(state_dict: Dict[str, Any],
                             prefix: str = "") -> Dict[str, Any]:
    """torchvision `resnet34().state_dict()` -> Flax variables for
    `ResNet34Features` ({'params': ..., 'batch_stats': ...})."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def get(name):
        return np.asarray(state_dict[prefix + name])

    def put_bn(dst_params, dst_stats, torch_name):
        dst_params["scale"] = get(f"{torch_name}.weight")
        dst_params["bias"] = get(f"{torch_name}.bias")
        dst_stats["mean"] = get(f"{torch_name}.running_mean")
        dst_stats["var"] = get(f"{torch_name}.running_var")

    params["conv1"] = {"kernel": _conv_kernel(get("conv1.weight"))}
    params["bn1"], stats["bn1"] = {}, {}
    put_bn(params["bn1"], stats["bn1"], "bn1")

    stage_sizes = (3, 4, 6)
    for stage, blocks in enumerate(stage_sizes):
        for b in range(blocks):
            t = f"layer{stage + 1}.{b}"
            f = f"layer{stage + 1}_{b}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            p["conv1"] = {"kernel": _conv_kernel(get(f"{t}.conv1.weight"))}
            p["conv2"] = {"kernel": _conv_kernel(get(f"{t}.conv2.weight"))}
            p["bn1"], s["bn1"] = {}, {}
            put_bn(p["bn1"], s["bn1"], f"{t}.bn1")
            p["bn2"], s["bn2"] = {}, {}
            put_bn(p["bn2"], s["bn2"], f"{t}.bn2")
            if prefix + f"{t}.downsample.0.weight" in state_dict:
                p["downsample_conv"] = {
                    "kernel": _conv_kernel(get(f"{t}.downsample.0.weight"))}
                p["downsample_bn"], s["downsample_bn"] = {}, {}
                put_bn(p["downsample_bn"], s["downsample_bn"],
                       f"{t}.downsample.1")
            params[f] = p
            stats[f] = s

    return {"params": params, "batch_stats": stats}


def load_pretrained(path: Optional[str]):
    """Load pretrained backbone weights if `path` exists; returns Flax
    variables or None. Accepts either a torch resnet34 state_dict checkpoint
    or the torch-free `.npz` artifact written by scripts/convert_weights.py."""
    if path is None:
        return None
    import os
    if not os.path.exists(path):
        return None
    if path.endswith(".npz"):
        from neo360_tpu.utils.io import load_variables_npz
        return load_variables_npz(path)
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_torch_state_dict(sd)
