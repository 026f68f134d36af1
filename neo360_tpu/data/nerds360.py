"""NERDS360 single-scene ("overfit") dataset — reference datasets/nerds360.py.

TPU-native layout: instead of a torch Dataset yielding one ray at a time
through 32 worker processes, this builds the complete ray/rgb buffers ONCE
(host loads + LANCZOS-resizes the images; a single jitted vmap over cameras
generates every ray on device) and hands back device-resident arrays. The
train loop then samples random ray batches directly from HBM
(train/loop.py:make_buffer_trainer) — no host in the steady state.

Parity notes:
  - near=0.2, far=3.0 (reference nerds360.py:210-211).
  - focal scaled by img_wh[0] / native_width (nerds360.py:274-276).
  - rays stored as [o, viewdir, near, far] + rgb + radii (nerds360.py:320-338).
  - val split = train cameras 100: ; test split parses val/pose with the
    train scale factor (nerds360.py:137-153, 224-255).
  - instance masks: semantic id 5 (Car), nearest-neighbor resized
    (nerds360.py:412-421).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from neo360_tpu.core import rays as ray_core
from neo360_tpu.data import poses as pose_io

NEAR = 0.2
FAR = 3.0
CAR_SEMANTIC_ID = 5


def _load_rgb(path: str, wh) -> np.ndarray:
    img = Image.open(path)
    img = img.resize(wh, Image.LANCZOS)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return arr[..., :3]


def _load_instance_mask(path: str, wh) -> np.ndarray:
    import cv2
    seg = np.array(Image.open(path))
    seg = (seg == CAR_SEMANTIC_ID).astype(np.uint8)
    seg = cv2.resize(seg, wh, interpolation=cv2.INTER_NEAREST)
    return seg.astype(bool)


class NeRDS360:
    """Single-scene ray dataset.

    split: "train" (ray buffers over cameras 0:100), "val" (full images from
    cameras 100:), or "test" (full images from the val/ directory, train
    scale factor).
    """

    def __init__(self, root_dir: str, split: str = "train",
                 img_wh=(320, 240), white_back: bool = False):
        self.root_dir = root_dir
        self.split = split
        self.img_wh = tuple(img_wh)
        self.white_back = white_back
        self.near = NEAR
        self.far = FAR

        train_dir = os.path.join(root_dir, "train")
        img_files_train = pose_io.sorted_image_files(root_dir, "train")
        cams = pose_io.read_poses(
            os.path.join(train_dir, "pose"), img_files_train,
            output_boxes=False)
        self.pose_scale_factor = cams.pose_scale_factor
        w, h = self.img_wh
        self.focal = cams.focal * w / cams.img_wh[0]

        if split == "train":
            self.base_dir = train_dir
            self.img_files = img_files_train[:100][: len(cams.c2w_train)]
            self.c2w = cams.c2w_train
        elif split == "val":
            self.base_dir = train_dir
            self.img_files = img_files_train[100:]
            self.c2w = cams.c2w_val
        elif split == "test":
            self.base_dir = os.path.join(root_dir, "val")
            self.img_files = pose_io.sorted_image_files(root_dir, "val")
            self.c2w = pose_io.read_poses_with_scale(
                os.path.join(self.base_dir, "pose"), self.img_files,
                cams.pose_scale_factor)
        else:
            raise ValueError(f"unknown split {split!r}")

        self.num_images = len(self.c2w)
        self.image_sizes = np.array([[h, w]] * self.num_images)

    # -- device-side ray generation ------------------------------------

    def _rays_for_cameras(self, c2w: np.ndarray) -> Dict[str, jnp.ndarray]:
        w, h = self.img_wh
        fn = jax.jit(jax.vmap(
            lambda m: ray_core.rays_for_camera(h, w, self.focal, m)))
        out = fn(jnp.asarray(c2w[:, :3, :4]))
        return {k: v.reshape((-1,) + v.shape[2:]) for k, v in out.items()}

    def ray_buffers(self) -> Dict[str, jnp.ndarray]:
        """All rays + targets for the split, flat (N_imgs*H*W, ...)."""
        r = self._rays_for_cameras(self.c2w)
        w, h = self.img_wh
        rgbs = np.stack([
            _load_rgb(os.path.join(self.base_dir, "rgb", f), (w, h))
            for f in self.img_files])
        r["target"] = jnp.asarray(rgbs.reshape(-1, 3))
        return r

    def pose_rays(self, c2w: np.ndarray) -> Dict[str, jnp.ndarray]:
        """Rays for an ARBITRARY camera pose (4x4 or 3x4) — no target;
        powers the vis_only 360-spiral flythrough (reference spiral poses
        nerds360.py:264-269)."""
        return self._rays_for_cameras(np.asarray(c2w, np.float32)[None])

    def image_rays(self, idx: int) -> Dict[str, jnp.ndarray]:
        """Rays + target (+ instance mask if available) for image `idx`."""
        w, h = self.img_wh
        out = self._rays_for_cameras(self.c2w[idx:idx + 1])
        img = _load_rgb(
            os.path.join(self.base_dir, "rgb", self.img_files[idx]), (w, h))
        out["target"] = jnp.asarray(img.reshape(-1, 3))
        seg_path = os.path.join(self.base_dir, "semantic_segmentation_2d",
                                self.img_files[idx])
        if os.path.exists(seg_path):
            out["instance_mask"] = jnp.asarray(
                _load_instance_mask(seg_path, (w, h)).reshape(-1))
        return out
