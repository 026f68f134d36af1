"""LPIPS perceptual metric/loss (VGG-16 backbone) in Flax.

Replaces the reference's `lpips.LPIPS(net="vgg")` (neo360/model.py:33,623-630,
used both as the stage-2 training loss x0.3 and as an eval metric via piqa,
interface.py:102-122).

Architecture parity with the public LPIPS 'vgg' variant: inputs in [-1, 1]
are normalized by the LPIPS shift/scale constants, run through VGG-16
features, tapped after relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3,
channel-unit-normalized, squared-differenced, weighted by 1x1 "lin" convs and
spatially averaged.

Pretrained weights: the image has no network access, so weights load from a
torch checkpoint on disk when available (`load_torch_weights`, accepting the
combined dict of torchvision VGG16 features + lpips lin weights). With random
weights the metric is NOT meaningful — `LPIPSModel.pretrained` tracks this
and eval code should report lpips as unavailable.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# LPIPS input scaling constants (public lpips package, scaling_layer)
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)

# VGG16 feature config and the tap points (relu indices per block)
_VGG_CFG = (2, 2, 3, 3, 3)           # convs per block
_CHANNELS = (64, 128, 256, 512, 512)


class VGG16Features(nn.Module):
    """VGG16 conv tower; returns the 5 post-relu tap activations."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        taps = []
        for b, (n_convs, ch) in enumerate(zip(_VGG_CFG, _CHANNELS)):
            for i in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)],
                            name=f"conv{b}_{i}")(x)
                x = nn.relu(x)
            taps.append(x)
            if b < len(_VGG_CFG) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """LPIPS distance between two (B, H, W, 3) images in [-1, 1]."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        vgg = VGG16Features(name="vgg")
        fx = vgg((x - shift) / scale)
        fy = vgg((y - shift) / scale)

        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(
                jnp.sum(a ** 2, axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(
                jnp.sum(b ** 2, axis=-1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones,
                           (diff.shape[-1],))
            # lpips lin layers are 1x1 convs with non-negative weights
            total = total + jnp.mean(
                jnp.sum(diff * jnp.maximum(w, 0.0), axis=-1), axis=(-2, -1))
        return total


class LPIPSModel:
    """Bound LPIPS with (optionally pretrained) weights."""

    def __init__(self, weights_path: Optional[str] = None):
        import jax
        self.module = LPIPS()
        dummy = jnp.zeros((1, 32, 32, 3))
        self.variables = self.module.init(jax.random.PRNGKey(0), dummy, dummy)
        self.pretrained = False
        if weights_path is not None:
            loaded = load_torch_weights(weights_path)
            if loaded is not None:
                self.variables = loaded
                self.pretrained = True

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """x, y: (B, H, W, 3) in [0, 1] (rescaled internally to [-1, 1])."""
        return self.module.apply(self.variables, 2 * x - 1, 2 * y - 1)


def load_torch_weights(path: str) -> Optional[Dict[str, Any]]:
    """Load VGG16+lin weights from a torch checkpoint.

    Expected dict keys: torchvision VGG16 `features.{idx}.weight/.bias`
    plus lpips `lin{i}.model.1.weight`. Also accepts the torch-free `.npz`
    artifact written by scripts/convert_weights.py. Returns Flax variables
    or None.
    """
    import os
    if not os.path.exists(path):
        return None
    if path.endswith(".npz"):
        from neo360_tpu.utils.io import load_variables_npz
        loaded = load_variables_npz(path)
        return loaded if "params" in loaded else None
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: np.asarray(v) for k, v in sd.items()}

    params: Dict[str, Any] = {"vgg": {}}
    # torchvision features indices of convs per block
    idx = 0
    for b, n_convs in enumerate(_VGG_CFG):
        for i in range(n_convs):
            wkey, bkey = f"features.{idx}.weight", f"features.{idx}.bias"
            if wkey not in sd:
                return None
            params["vgg"][f"conv{b}_{i}"] = {
                "kernel": np.transpose(sd[wkey], (2, 3, 1, 0)),
                "bias": sd[bkey],
            }
            idx += 2          # conv + relu
        idx += 1              # maxpool
    for i in range(5):
        lkey = f"lin{i}.model.1.weight"
        if lkey not in sd:
            return None
        params[f"lin{i}"] = sd[lkey].reshape(-1)
    return {"params": params}
