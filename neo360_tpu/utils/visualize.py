"""Validation image grids + 3D scene inspection helpers.

Grids: parity with the reference's W&B grid builders
(utils/train_helper.py:126-383) — GT / prediction / depth / fg / bg /
opacity tiles side by side — built with numpy (no torchvision).

3D: depth-map back-projection to world point clouds and camera frustums
(the computational core of the reference's Open3D inspector,
visualize/visualize_nerds360.py:89-497). Interactive display is gated on
open3d being importable; the geometry itself is plain numpy and tested.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from neo360_tpu.utils.io import visualize_depth


def _to_hw3(x, h: int, w: int) -> np.ndarray:
    """Accepts (H,W,3), flat (H*W,3), grayscale (H,W) or flat (H*W,)."""
    x = np.asarray(x)
    if x.shape == (h, w):
        x = np.repeat(x[..., None], 3, axis=-1)
    elif x.ndim == 1:
        x = np.repeat(x.reshape(h, w, 1), 3, axis=-1)
    return x.reshape(h, w, 3)


def tile_images(images: Sequence[np.ndarray], pad: int = 2,
                pad_value: float = 1.0) -> np.ndarray:
    """Horizontal strip of equally sized (H, W, 3) images."""
    h = images[0].shape[0]
    spacer = np.full((h, pad, 3), pad_value, dtype=np.float32)
    row: List[np.ndarray] = []
    for i, img in enumerate(images):
        if i:
            row.append(spacer)
        row.append(np.asarray(img, np.float32))
    return np.concatenate(row, axis=1)


def visualize_val_rgb_depth(img_wh, target, rgb, depth=None) -> np.ndarray:
    """GT | prediction [| depth] grid (train_helper.py:126-200)."""
    w, h = img_wh
    tiles = [_to_hw3(target, h, w), _to_hw3(np.clip(rgb, 0, 1), h, w)]
    if depth is not None:
        tiles.append(visualize_depth(np.asarray(depth).reshape(h, w)))
    return tile_images(tiles)


def visualize_val_fg_bg(img_wh, target, rgb, fg_rgb, bg_rgb,
                        depth=None, acc=None) -> np.ndarray:
    """GT | comp | fg | bg [| depth] [| opacity] grid
    (train_helper.py:203-383)."""
    w, h = img_wh
    tiles = [_to_hw3(target, h, w),
             _to_hw3(np.clip(rgb, 0, 1), h, w),
             _to_hw3(np.clip(fg_rgb, 0, 1), h, w),
             _to_hw3(np.clip(bg_rgb, 0, 1), h, w)]
    if depth is not None:
        tiles.append(visualize_depth(np.asarray(depth).reshape(h, w)))
    if acc is not None:
        tiles.append(_to_hw3(np.clip(acc, 0, 1), h, w))
    return tile_images(tiles)


# ---------------------------------------------------------------------------
# 3D geometry (numpy core of the Open3D inspector)
# ---------------------------------------------------------------------------

def depth_to_points(depth: np.ndarray, c2w: np.ndarray, focal: float,
                    max_depth: Optional[float] = None) -> np.ndarray:
    """Back-project an (H, W) depth map to world points (N, 3) using the
    framework's ray conventions (depth measured along unnormalized -z=1
    camera rays, like the renderer's expected-depth output)."""
    h, w = depth.shape
    i, j = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    dirs = np.stack([(i - w / 2) / focal, -(j - h / 2) / focal,
                     -np.ones_like(i)], -1)
    rays_d = dirs @ np.asarray(c2w)[:3, :3].T
    pts = np.asarray(c2w)[:3, 3] + depth[..., None] * rays_d
    pts = pts.reshape(-1, 3)
    if max_depth is not None:
        pts = pts[depth.reshape(-1) <= max_depth]
    return pts


def camera_frustum_lines(c2w: np.ndarray, focal: float, img_wh,
                         scale: float = 0.1):
    """(points (5, 3), line index pairs (8, 2)) of a camera frustum wireframe."""
    w, h = img_wh
    corners_cam = np.array([
        [0, 0, 0],
        [(0 - w / 2) / focal, (h / 2) / focal, -1.0],
        [(w - w / 2) / focal, (h / 2) / focal, -1.0],
        [(w - w / 2) / focal, (0 - h / 2) / focal, -1.0],
        [(0 - w / 2) / focal, (0 - h / 2) / focal, -1.0],
    ]) * scale
    pts = corners_cam @ np.asarray(c2w)[:3, :3].T + np.asarray(c2w)[:3, 3]
    lines = np.array([[0, 1], [0, 2], [0, 3], [0, 4],
                      [1, 2], [2, 3], [3, 4], [4, 1]])
    return pts, lines


def show_scene_open3d(pointclouds: Sequence[np.ndarray],
                      cameras: Sequence[Dict] = (),
                      unit_sphere: bool = True):  # pragma: no cover
    """Interactive viewer (requires open3d; parity with
    visualize/visualize_nerds360.py). cameras: dicts with c2w/focal/img_wh."""
    try:
        import open3d as o3d
    except ImportError as e:
        raise ImportError(
            "open3d is not installed in this image; use depth_to_points / "
            "camera_frustum_lines for headless geometry checks") from e
    geoms = []
    for pts in pointclouds:
        pc = o3d.geometry.PointCloud(
            o3d.utility.Vector3dVector(np.asarray(pts)))
        geoms.append(pc)
    for cam in cameras:
        pts, lines = camera_frustum_lines(cam["c2w"], cam["focal"],
                                          cam["img_wh"])
        ls = o3d.geometry.LineSet(
            o3d.utility.Vector3dVector(pts),
            o3d.utility.Vector2iVector(lines))
        geoms.append(ls)
    if unit_sphere:
        sphere = o3d.geometry.TriangleMesh.create_sphere(1.0)
        geoms.append(o3d.geometry.LineSet.create_from_triangle_mesh(sphere))
    o3d.visualization.draw_geometries(geoms)
