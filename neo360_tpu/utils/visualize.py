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


def visualize_val_rgb(img_wh, target, rgb) -> np.ndarray:
    """GT | prediction (train_helper.py:126-135)."""
    w, h = img_wh
    return tile_images([_to_hw3(target, h, w),
                        _to_hw3(np.clip(rgb, 0, 1), h, w)])


def visualize_val_opacity(img_wh, rgb, acc) -> np.ndarray:
    """prediction | opacity (train_helper.py:108-123)."""
    w, h = img_wh
    return tile_images([_to_hw3(np.clip(rgb, 0, 1), h, w),
                        _to_hw3(np.clip(acc, 0, 1), h, w)])


def visualize_val_rgb_opa_depth(img_wh, target, rgb, acc,
                                depth) -> np.ndarray:
    """GT | pred | opacity | depth (train_helper.py:138-159)."""
    w, h = img_wh
    return tile_images([
        _to_hw3(target, h, w), _to_hw3(np.clip(rgb, 0, 1), h, w),
        _to_hw3(np.clip(acc, 0, 1), h, w),
        visualize_depth(np.asarray(depth).reshape(h, w))])


def visualize_val_rgb_opacity_nocs(img_wh, target, rgb, acc, nocs_gt,
                                   nocs_pred) -> np.ndarray:
    """GT | pred | opacity | NOCS GT | NOCS pred (train_helper.py:275-301)."""
    w, h = img_wh
    return tile_images([
        _to_hw3(target, h, w), _to_hw3(np.clip(rgb, 0, 1), h, w),
        _to_hw3(np.clip(acc, 0, 1), h, w),
        _to_hw3(np.clip(nocs_gt, 0, 1), h, w),
        _to_hw3(np.clip(nocs_pred, 0, 1), h, w)])


def visualize_val_fg_bg_opacity(img_wh, target, rgb, fg_rgb, bg_rgb,
                                fg_acc, bg_acc) -> np.ndarray:
    """GT | comp | fg | bg | fg opacity | bg opacity
    (train_helper.py:246-272)."""
    w, h = img_wh
    return tile_images([
        _to_hw3(target, h, w), _to_hw3(np.clip(rgb, 0, 1), h, w),
        _to_hw3(np.clip(fg_rgb, 0, 1), h, w),
        _to_hw3(np.clip(bg_rgb, 0, 1), h, w),
        _to_hw3(np.clip(fg_acc, 0, 1), h, w),
        _to_hw3(np.clip(bg_acc, 0, 1), h, w)])


def depth_normals(depth: np.ndarray) -> np.ndarray:
    """Screen-space normals from a depth map ((H,W) -> (H,W,3) in [0,1]),
    the visualization of train_helper.py:180-210's normals tile."""
    d = np.asarray(depth, np.float32)
    gy, gx = np.gradient(d)
    n = np.stack([-gx, -gy, np.ones_like(d)], axis=-1)
    n = n / np.linalg.norm(n, axis=-1, keepdims=True)
    return 0.5 * (n + 1.0)


def visualize_val_rgb_opa_depth_normals(img_wh, target, rgb, acc,
                                        depth) -> np.ndarray:
    """GT | pred | opacity | depth | normals (train_helper.py:180-210)."""
    w, h = img_wh
    d = np.asarray(depth).reshape(h, w)
    return tile_images([
        _to_hw3(target, h, w), _to_hw3(np.clip(rgb, 0, 1), h, w),
        _to_hw3(np.clip(acc, 0, 1), h, w), visualize_depth(d),
        depth_normals(d)])


def build_val_grid(img_wh, target, outputs: Dict) -> np.ndarray:
    """Richest grid the rendered `outputs` dict supports — the per-system
    dispatch of the reference's validation_step grid choice (e.g.
    neo360/model.py:939-942 uses the fg/bg builders; vanilla uses
    rgb+depth)."""
    has = lambda *ks: all(k in outputs and outputs[k] is not None
                          for k in ks)
    if has("fg_rgb", "bg_rgb", "fg_acc", "bg_acc"):
        return visualize_val_fg_bg_opacity(
            img_wh, target, outputs["rgb"], outputs["fg_rgb"],
            outputs["bg_rgb"], outputs["fg_acc"], outputs["bg_acc"])
    if has("fg_rgb", "bg_rgb"):
        return visualize_val_fg_bg(img_wh, target, outputs["rgb"],
                                   outputs["fg_rgb"], outputs["bg_rgb"],
                                   outputs.get("depth"),
                                   outputs.get("acc"))
    if has("acc", "depth"):
        return visualize_val_rgb_opa_depth(img_wh, target, outputs["rgb"],
                                           outputs["acc"], outputs["depth"])
    return visualize_val_rgb_depth(img_wh, target, outputs["rgb"],
                                   outputs.get("depth"))


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


def look_at_pose(cam_location: np.ndarray, point: np.ndarray) -> np.ndarray:
    """4x4 c2w looking from `cam_location` toward `point` (+z forward,
    reference visualize/visualize_poses.py look_at)."""
    cam_location = np.asarray(cam_location, np.float64)
    forward = np.asarray(point, np.float64) - cam_location
    forward = forward / (np.linalg.norm(forward) + 1e-9)
    tmp = np.array([0.0, -1.0, 0.0])
    right = np.cross(tmp, forward)
    right = right / (np.linalg.norm(right) + 1e-9)
    up = np.cross(forward, right)
    up = up / (np.linalg.norm(up) + 1e-9)
    mat = np.eye(4)
    mat[:3, 0], mat[:3, 1], mat[:3, 2], mat[:3, 3] = (right, up, forward,
                                                      cam_location)
    return mat


def merge_frustums(frustums: Sequence) -> tuple:
    """[(points (5,3), lines (8,2)), ...] -> merged (N*5,3), (N*8,2)
    wireframe arrays (reference frustums2lineset without the o3d object)."""
    pts, lines = [], []
    for i, (p, l) in enumerate(frustums):
        pts.append(np.asarray(p))
        lines.append(np.asarray(l) + i * 5)
    return np.concatenate(pts, axis=0), np.concatenate(lines, axis=0)


def sphere_wireframe(radius: float = 1.0, n_lat: int = 8,
                     n_lon: int = 12, n_seg: int = 24) -> np.ndarray:
    """(N, 2, 3) line segments tracing latitude/longitude circles of a
    sphere — the unit-sphere overlay of the pose viewer."""
    segs = []
    for k in range(1, n_lat):
        phi = np.pi * k / n_lat
        t = np.linspace(0, 2 * np.pi, n_seg + 1)
        ring = np.stack([np.sin(phi) * np.cos(t), np.sin(phi) * np.sin(t),
                         np.full_like(t, np.cos(phi))], axis=-1) * radius
        segs.append(np.stack([ring[:-1], ring[1:]], axis=1))
    for k in range(n_lon):
        lam = 2 * np.pi * k / n_lon
        t = np.linspace(0, np.pi, n_seg + 1)
        arc = np.stack([np.sin(t) * np.cos(lam), np.sin(t) * np.sin(lam),
                        np.cos(t)], axis=-1) * radius
        segs.append(np.stack([arc[:-1], arc[1:]], axis=1))
    return np.concatenate(segs, axis=0)


def ray_segments(c2w: np.ndarray, focal: float, img_wh,
                 n_rays: int = 64, near: float = 0.02, far: float = 2.0,
                 seed: int = 0) -> np.ndarray:
    """(n_rays, 2, 3) world-space ray segments from random pixels of one
    camera (the pose viewer's plot_rays, visualize_poses.py:147-169), using
    the framework's -z ray convention (core.rays, no +0.5 centering)."""
    w, h = img_wh
    rng = np.random.default_rng(seed)
    xs = rng.uniform(0, w, size=n_rays)
    ys = rng.uniform(0, h, size=n_rays)
    dirs = np.stack([(xs - w / 2) / focal, -(ys - h / 2) / focal,
                     -np.ones_like(xs)], axis=-1)
    c2w = np.asarray(c2w)
    rays_d = dirs @ c2w[:3, :3].T
    rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape)
    return np.stack([rays_o + near * rays_d, rays_o + far * rays_d], axis=1)


def pose_sphere_geometry(c2ws: Sequence[np.ndarray], focal: float, img_wh,
                         n_ray_views: int = 1, rays_per_view: int = 64,
                         frustum_scale: float = 0.1) -> Dict:
    """Headless payload of the reference pose-sphere viewer
    (visualize/visualize_poses.py): camera frustum wireframes on the
    normalized pose sphere, sampled ray segments for the first
    `n_ray_views` cameras, and the unit-sphere overlay. Feed to
    show_poses_open3d for display, or assert on it in tests."""
    frustums = [camera_frustum_lines(c2w, focal, img_wh, frustum_scale)
                for c2w in c2ws]
    points, lines = merge_frustums(frustums)
    rays = [ray_segments(c2w, focal, img_wh, rays_per_view, seed=i)
            for i, c2w in enumerate(c2ws[:n_ray_views])]
    return {
        "frustum_points": points,
        "frustum_lines": lines,
        "ray_segments": (np.concatenate(rays, axis=0) if rays
                         else np.zeros((0, 2, 3))),
        "sphere_segments": sphere_wireframe(),
    }


def show_poses_open3d(c2ws, focal, img_wh, **kw):  # pragma: no cover
    """Interactive pose-sphere viewer (parity with
    visualize/visualize_poses.py; requires open3d)."""
    try:
        import open3d as o3d
    except ImportError as e:
        raise ImportError(
            "open3d is not installed in this image; use "
            "pose_sphere_geometry for headless checks") from e
    geo = pose_sphere_geometry(c2ws, focal, img_wh, **kw)
    ls = o3d.geometry.LineSet(
        o3d.utility.Vector3dVector(geo["frustum_points"]),
        o3d.utility.Vector2iVector(geo["frustum_lines"]))
    geoms = [ls]
    for name in ("ray_segments", "sphere_segments"):
        segs = geo[name]
        pts = segs.reshape(-1, 3)
        idx = np.arange(len(pts)).reshape(-1, 2)
        geoms.append(o3d.geometry.LineSet(
            o3d.utility.Vector3dVector(pts),
            o3d.utility.Vector2iVector(idx)))
    o3d.visualization.draw_geometries(geoms)


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
