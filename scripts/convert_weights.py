#!/usr/bin/env python
"""Pretrained-weight conversion workflow (one-time, on a machine with the
torch checkpoints available).

The reference's generalizable results assume two pretrained torch models:
  - ImageNet ResNet34 for the SpatialEncoder backbone
    (reference models/neo360/encoder_pn.py:19, torchvision
    `resnet34(pretrained=True)`), and
  - VGG16 + LPIPS linear heads for the perceptual loss/metric
    (reference models/neo360/model.py:623-630, models/interface.py:102-122).

This image has zero egress, so the checkpoints cannot be downloaded here;
this script converts them to the torch-free `.npz` artifacts that
`--resnet_weights` / `--lpips_weights` accept, once you have them:

  # on any machine with torchvision + internet:
  python - <<'PY'
  import torch, torchvision, lpips
  torch.save(torchvision.models.resnet34(weights="IMAGENET1K_V1").state_dict(),
             "resnet34.pth")
  net = lpips.LPIPS(net="vgg")                       # pip install lpips
  sd = dict(net.net.slice1.state_dict())             # or save net.state_dict()
  torch.save({**torchvision.models.vgg16(weights="IMAGENET1K_V1")
                .features.state_dict(prefix="features."),
              **{f"lin{i}.model.1.weight": net.lins[i].model[1].weight
                 for i in range(5)}}, "vgg16_lpips.pth")
  PY

  # then here:
  python scripts/convert_weights.py --resnet34 resnet34.pth \
      --out_resnet weights/resnet34.npz
  python scripts/convert_weights.py --vgg16_lpips vgg16_lpips.pth \
      --out_lpips weights/vgg16_lpips.npz

  # and train/eval with:
  python -m neo360_tpu.cli ... --resnet_weights weights/resnet34.npz \
      --lpips_weights weights/vgg16_lpips.npz

Without the artifacts, training starts the backbone from random init and
eval writes `"lpips_status": "skipped: no pretrained weights"` into
results.json instead of an LPIPS number.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def convert_resnet(src: str, dst: str) -> str:
    import torch
    from neo360_tpu.nn.resnet import convert_torch_state_dict
    from neo360_tpu.utils.io import save_variables_npz
    sd = torch.load(src, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    variables = convert_torch_state_dict(sd)
    path = save_variables_npz(dst, variables)
    print(f"resnet34: {src} -> {path}")
    return path


def convert_lpips(src: str, dst: str) -> str:
    from neo360_tpu.nn.lpips import load_torch_weights
    from neo360_tpu.utils.io import save_variables_npz
    variables = load_torch_weights(src)
    if variables is None:
        raise SystemExit(
            f"{src}: not a combined VGG16+LPIPS checkpoint (needs "
            "features.{idx}.weight/.bias and lin{i}.model.1.weight keys)")
    path = save_variables_npz(dst, variables)
    print(f"vgg16+lpips: {src} -> {path}")
    return path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    p.add_argument("--resnet34", help="torchvision resnet34 state_dict .pth")
    p.add_argument("--out_resnet", default="weights/resnet34.npz")
    p.add_argument("--vgg16_lpips",
                   help="combined VGG16 features + lpips lin .pth")
    p.add_argument("--out_lpips", default="weights/vgg16_lpips.npz")
    a = p.parse_args(argv)
    if not a.resnet34 and not a.vgg16_lpips:
        p.error("nothing to do: pass --resnet34 and/or --vgg16_lpips")
    if a.resnet34:
        convert_resnet(a.resnet34, a.out_resnet)
    if a.vgg16_lpips:
        convert_lpips(a.vgg16_lpips, a.out_lpips)


if __name__ == "__main__":
    main()
