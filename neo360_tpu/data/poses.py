"""NERDS360 `pose.json` parsing and normalization (host-side numpy).

Format and semantics — parity with reference datasets/nerds360.py:97-153:
  pose.json keys: "focal", "img_size" [W, H], "obj_location" [3],
  "transform" {image_stem: 4x4 c2w in Parallel-Domain axes},
  "bbox_dimensions"/"obj_rotations"/"obj_translations" {obj_id: ...}.

Normalization pipeline:
  1. subtract obj_location from each translation,
  2. PD -> NeRF axis flip (core.rays.convert_pose_pd_to_nerf),
  3. scale all translations by pose_scale_factor = 1 / max |t| computed over
     the TRAIN cameras (the same factor is re-used for val/test poses —
     reference nerds360.py:137-153).
Split: first 100 cameras are train, the rest are val (nerds360.py:115-116).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from neo360_tpu.core.rays import convert_pose_pd_to_nerf


@dataclass
class SceneCameras:
    c2w_train: np.ndarray          # (N_train, 4, 4)
    c2w_val: np.ndarray            # (N_val, 4, 4)
    focal: float                   # at native resolution
    img_wh: tuple                  # native (W, H)
    pose_scale_factor: float
    boxes: Optional[dict] = None   # {"R": [...], "T": [...], "s": [...]}
    img_files_train: List[str] = field(default_factory=list)


def _load_raw(pose_dir: str):
    with open(os.path.join(pose_dir, "pose.json"), "r") as f:
        return json.load(f)


def read_poses(pose_dir: str, img_files: List[str],
               output_boxes: bool = False) -> SceneCameras:
    """Parse + normalize train-split poses; split 100 train / rest val."""
    data = _load_raw(pose_dir)
    focal = data["focal"]
    img_wh = tuple(data["img_size"])
    obj_location = np.array(data["obj_location"], dtype=np.float64)

    all_c2w = []
    for img_file in img_files:
        c2w = np.array(data["transform"][img_file.split(".")[0]],
                       dtype=np.float64)
        c2w[:3, 3] -= obj_location
        all_c2w.append(convert_pose_pd_to_nerf(c2w))
    all_c2w = np.stack(all_c2w)

    pose_scale_factor = 1.0 / np.max(np.abs(all_c2w[:, :3, 3]))
    all_c2w[:, :3, 3] *= pose_scale_factor

    boxes = None
    if output_boxes and "bbox_dimensions" in data:
        all_boxes, all_t, all_r = [], [], []
        for k, v in data["bbox_dimensions"].items():
            all_boxes.append(np.array(v) * pose_scale_factor)
            all_r.append(np.array(data["obj_rotations"][k]))
            all_t.append((np.array(data["obj_translations"][k]) - obj_location)
                         * pose_scale_factor)
        boxes = {"R": all_r, "T": all_t, "s": all_boxes}

    return SceneCameras(
        c2w_train=all_c2w[:100].astype(np.float32),
        c2w_val=all_c2w[100:].astype(np.float32),
        focal=float(focal),
        img_wh=img_wh,
        pose_scale_factor=float(pose_scale_factor),
        boxes=boxes,
        img_files_train=list(img_files),
    )


def read_poses_with_scale(pose_dir: str, img_files: List[str],
                          pose_scale_factor: float) -> np.ndarray:
    """Parse poses normalized by an externally supplied scale (val/test
    split re-uses the train scale — reference nerds360.py:137-153)."""
    data = _load_raw(pose_dir)
    obj_location = np.array(data["obj_location"], dtype=np.float64)
    all_c2w = []
    for img_file in img_files:
        c2w = np.array(data["transform"][img_file.split(".")[0]],
                       dtype=np.float64)
        c2w[:3, 3] -= obj_location
        all_c2w.append(convert_pose_pd_to_nerf(c2w))
    all_c2w = np.stack(all_c2w)
    all_c2w[:, :3, 3] *= pose_scale_factor
    return all_c2w.astype(np.float32)


def sorted_image_files(scene_dir: str, split: str) -> List[str]:
    files = os.listdir(os.path.join(scene_dir, split, "rgb"))
    files.sort()
    return files


def get_rotation_matrix(rotation_deg: float,
                        rng: Optional[np.random.Generator] = None
                        ) -> np.ndarray:
    """Random small rotation R = Rx @ Ry @ Rz with each Euler angle drawn
    uniformly from +-rotation_deg (reference nerds360_ae.py:22-42)."""
    rng = rng or np.random.default_rng()
    phi = rotation_deg * (np.pi / 180.0)
    x, y, z = rng.uniform(-phi, phi, size=3)
    rot_x = np.array([[1, 0, 0],
                      [0, np.cos(x), -np.sin(x)],
                      [0, np.sin(x), np.cos(x)]])
    rot_y = np.array([[np.cos(y), 0, -np.sin(y)],
                      [0, 1, 0],
                      [np.sin(y), 0, np.cos(y)]])
    rot_z = np.array([[np.cos(z), -np.sin(z), 0],
                      [np.sin(z), np.cos(z), 0],
                      [0, 0, 1]])
    return (rot_x @ rot_y @ rot_z).astype(np.float64)


def rot_from_origin(c2w: np.ndarray, rotation_deg: float = 10.0,
                    rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Jitter a camera-to-world pose by a random rotation about the world
    origin — the "near pose" used by the reference's smoothing-loss path
    (nerds360_ae.py:12-19, called at :354). Returns a (3|4, 4) pose matching
    the input's leading shape."""
    rot_mat = get_rotation_matrix(rotation_deg, rng)
    out = np.array(c2w, dtype=np.float64, copy=True)
    out[:3, :3] = rot_mat @ c2w[:3, :3]
    out[:3, 3:4] = rot_mat @ c2w[:3, 3:4]
    return out.astype(c2w.dtype if hasattr(c2w, "dtype") else np.float32)
