"""Synthetic micro-scene fixture in the NERDS360 on-disk layout.

Generates a procedural scene (a shaded sphere at the origin under a direction-
gradient sky) rendered analytically with EXACTLY the framework's ray
conventions, and writes it as:

    root/
      train/ rgb/*.png  pose/pose.json  semantic_segmentation_2d/*.png
             nocs_2d/*.png
      val/   rgb/*.png  pose/pose.json  semantic_segmentation_2d/*.png
             nocs_2d/*.png

so the real dataset classes (data/nerds360.py, data/nerds360_ae.py) load it
unmodified — the replacement for the reference's 19.5 GB download in tests
(SURVEY §4). Poses are stored in Parallel-Domain axes with a non-zero
obj_location so the full PD->NeRF normalization path is exercised.

The image content is scale- and translation-invariant by construction (colors
depend only on ray direction and surface normal), so the pose_scale_factor
normalization leaves renders consistent with the stored pixels.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np
from PIL import Image

_PD_FLIP = np.array(
    [[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
    dtype=np.float64)
_PD_FLIP_INV = np.linalg.inv(_PD_FLIP)

SPHERE_RADIUS_FRAC = 0.35  # of camera ring radius
CAR_ID = 5


def _look_at_nerf(position: np.ndarray, target: np.ndarray,
                  up=np.array([0.0, 0.0, 1.0])) -> np.ndarray:
    """OpenGL/NeRF c2w: x right, y up, camera looks down -z."""
    z = position - target
    z = z / np.linalg.norm(z)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, position
    return c2w


def _camera_ring(n: int, radius: float, seed: int) -> np.ndarray:
    """n cameras on a jittered upper hemisphere looking at the origin."""
    rng = np.random.default_rng(seed)
    c2ws = []
    for i in range(n):
        az = 2 * np.pi * i / n + rng.uniform(-0.05, 0.05)
        el = np.deg2rad(rng.uniform(15.0, 55.0))
        p = radius * np.array([
            np.cos(az) * np.cos(el), np.sin(az) * np.cos(el), np.sin(el)])
        c2ws.append(_look_at_nerf(p, np.zeros(3)))
    return np.stack(c2ws)


def _render(c2w: np.ndarray, w: int, h: int, focal: float,
            sphere_radius: float):
    """Analytic render; returns (rgb uint8 (h,w,3), seg uint8, nocs uint8)."""
    i, j = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    dirs = np.stack(
        [(i - w / 2) / focal, -(j - h / 2) / focal, -np.ones_like(i)], -1)
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape)
    d_unit = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)

    # sphere at origin
    b = np.sum(d_unit * rays_o, axis=-1)
    c = np.sum(rays_o * rays_o, axis=-1) - sphere_radius ** 2
    disc = b ** 2 - c
    hit = disc > 0
    t_hit = -b - np.sqrt(np.maximum(disc, 0.0))
    hit &= t_hit > 0

    p = rays_o + t_hit[..., None] * d_unit
    normal = p / (np.linalg.norm(p, axis=-1, keepdims=True) + 1e-12)

    sky = 0.55 + 0.4 * np.stack(
        [0.5 + 0.5 * d_unit[..., 0], 0.5 + 0.5 * d_unit[..., 1],
         0.5 + 0.5 * d_unit[..., 2]], -1) * np.array([0.4, 0.55, 0.9])
    sphere_rgb = 0.5 + 0.5 * normal
    rgb = np.where(hit[..., None], sphere_rgb, sky)
    rgb8 = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)

    seg = np.where(hit, CAR_ID, 0).astype(np.uint8)
    nocs = np.where(hit[..., None], 0.5 + 0.5 * normal, 0.0)
    nocs8 = (np.clip(nocs, 0, 1) * 255).astype(np.uint8)
    return rgb8, seg, nocs8


def _write_split(split_dir: str, c2ws_nerf: np.ndarray, w: int, h: int,
                 focal: float, radius: float, obj_location: np.ndarray):
    os.makedirs(os.path.join(split_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(split_dir, "pose"), exist_ok=True)
    os.makedirs(os.path.join(split_dir, "semantic_segmentation_2d"),
                exist_ok=True)
    os.makedirs(os.path.join(split_dir, "nocs_2d"), exist_ok=True)

    transform = {}
    for idx, c2w in enumerate(c2ws_nerf):
        name = f"{idx:05d}"
        rgb8, seg, nocs8 = _render(
            c2w, w, h, focal, radius * SPHERE_RADIUS_FRAC)
        Image.fromarray(rgb8).save(
            os.path.join(split_dir, "rgb", name + ".png"))
        Image.fromarray(seg).save(
            os.path.join(split_dir, "semantic_segmentation_2d", name + ".png"))
        Image.fromarray(nocs8).save(
            os.path.join(split_dir, "nocs_2d", name + ".png"))

        # store in PD axes with obj_location added back:
        # read path does c2w[:3,3] -= obj_location; then c2w_pd @ _PD_FLIP.
        c2w_pd = c2w @ _PD_FLIP_INV
        c2w_pd[:3, 3] += obj_location
        transform[name] = c2w_pd.tolist()

    box = radius * SPHERE_RADIUS_FRAC
    pose = {
        "focal": focal,
        "img_size": [w, h],
        "obj_location": obj_location.tolist(),
        "transform": transform,
        "bbox_dimensions": {"obj_0": [[-box] * 3, [box] * 3]},
        "obj_rotations": {"obj_0": np.eye(3).tolist()},
        "obj_translations": {"obj_0": obj_location.tolist()},
    }
    with open(os.path.join(split_dir, "pose", "pose.json"), "w") as f:
        json.dump(pose, f)


def make_micro_scene(root: str, n_train: int = 103, n_val: int = 5,
                     wh: Tuple[int, int] = (40, 30), focal: float = None,
                     radius: float = 8.0, seed: int = 0) -> str:
    """Write one micro scene under `root`; returns `root`.

    n_train >= 101 so the loader's 100-train/rest-val split has both sides.
    focal defaults to 1.1 * width (~49 deg horizontal FOV) so that, like the
    real NERDS360 captures, every camera ray intersects the unit sphere after
    pose normalization — the NeRF++ background parameterization requires it
    (reference neo360/helper.py:271 asserts it).
    """
    w, h = wh
    if focal is None:
        focal = 1.1 * w
    obj_location = np.array([0.5, 0.3, 0.2])
    _write_split(os.path.join(root, "train"),
                 _camera_ring(n_train, radius, seed), w, h, focal, radius,
                 obj_location)
    _write_split(os.path.join(root, "val"),
                 _camera_ring(n_val, radius, seed + 1), w, h, focal, radius,
                 obj_location)
    return root


def make_multi_scene_root(root: str, n_scenes: int = 3, **kwargs) -> str:
    """Multiple micro scenes (for the generalizable NERDS360_AE loader)."""
    for s in range(n_scenes):
        make_micro_scene(os.path.join(root, f"scene_{s:03d}"),
                         seed=100 + s, **kwargs)
    return root
