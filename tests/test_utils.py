import json
import os

import numpy as np

from neo360_tpu.utils import semantic_labels as sl
from neo360_tpu.utils import visualize as vz


def test_semantic_label_table():
    assert sl.CAR_ID == 5
    assert sl.ROAD_ID == 24
    assert sl.ID_TO_LABEL[5].name == "Car"
    assert sl.ID_TO_LABEL[29].name == "Sky"
    assert len(sl.LABELS) == 43
    # ids are unique and contiguous 0..42
    ids = sorted(l.id for l in sl.LABELS)
    assert ids == list(range(43))


def test_colorize_semantic():
    seg = np.array([[5, 24], [0, 29]])
    img = sl.colorize_semantic(seg)
    assert img.shape == (2, 2, 3)
    np.testing.assert_array_equal(img[0, 0], sl.ID_TO_LABEL[5].color)
    np.testing.assert_array_equal(img[1, 1], (70, 130, 180))


def test_visual_grids():
    h, w = 6, 8
    rng = np.random.default_rng(0)
    target = rng.uniform(size=(h * w, 3))
    rgb = rng.uniform(size=(h * w, 3))
    depth = rng.uniform(0, 2, size=(h * w,))
    grid = vz.visualize_val_rgb_depth((w, h), target, rgb, depth)
    assert grid.shape == (h, 3 * w + 2 * 2, 3)
    grid2 = vz.visualize_val_fg_bg((w, h), target, rgb, rgb, rgb,
                                   depth, rng.uniform(size=(h * w,)))
    assert grid2.shape == (h, 6 * w + 5 * 2, 3)
    assert np.isfinite(grid2).all()


def test_visual_grid_builders_full_set():
    """The full reference builder set (train_helper.py:126-383 combos)."""
    h, w = 6, 8
    rng = np.random.default_rng(1)
    f = lambda c=3: rng.uniform(size=(h * w, c) if c > 1 else (h * w,))
    target, rgb, acc, depth = f(), f(), f(1), f(1)

    assert vz.visualize_val_rgb((w, h), target, rgb).shape == (h, 2 * w + 2, 3)
    assert vz.visualize_val_opacity((w, h), rgb, acc).shape == \
        (h, 2 * w + 2, 3)
    assert vz.visualize_val_rgb_opa_depth((w, h), target, rgb, acc,
                                          depth).shape == (h, 4 * w + 6, 3)
    assert vz.visualize_val_rgb_opacity_nocs(
        (w, h), target, rgb, acc, f(), f()).shape == (h, 5 * w + 8, 3)
    assert vz.visualize_val_fg_bg_opacity(
        (w, h), target, rgb, f(), f(), acc, f(1)).shape == (h, 6 * w + 10, 3)
    grid = vz.visualize_val_rgb_opa_depth_normals((w, h), target, rgb, acc,
                                                  depth)
    assert grid.shape == (h, 5 * w + 8, 3) and np.isfinite(grid).all()

    # dispatcher picks the richest grid the outputs support
    full = vz.build_val_grid((w, h), target, {
        "rgb": rgb, "fg_rgb": f(), "bg_rgb": f(), "fg_acc": acc,
        "bg_acc": f(1)})
    assert full.shape == (h, 6 * w + 10, 3)
    basic = vz.build_val_grid((w, h), target, {"rgb": rgb, "depth": depth})
    assert basic.shape == (h, 3 * w + 4, 3)
    mid = vz.build_val_grid((w, h), target, {"rgb": rgb, "depth": depth,
                                             "acc": acc})
    assert mid.shape == (h, 4 * w + 6, 3)


def test_depth_to_points_roundtrip():
    # constant depth 1 along -z with identity pose: z = -1 plane
    h, w, focal = 4, 6, 10.0
    depth = np.ones((h, w))
    pts = vz.depth_to_points(depth, np.eye(4), focal)
    assert pts.shape == (h * w, 3)
    np.testing.assert_allclose(pts[:, 2], -1.0, atol=1e-9)
    # max_depth filter
    depth[0, 0] = 5.0
    pts = vz.depth_to_points(depth, np.eye(4), focal, max_depth=2.0)
    assert pts.shape == (h * w - 1, 3)


def test_pose_sphere_viewer_geometry():
    """Headless pose-sphere viewer parity (visualize/visualize_poses.py)."""
    # look_at: camera at +2x looking at origin -> forward = -x
    pose = vz.look_at_pose([2.0, 0.0, 0.0], [0.0, 0.0, 0.0])
    np.testing.assert_allclose(pose[:3, 2], [-1, 0, 0], atol=1e-9)
    np.testing.assert_allclose(pose[:3, 3], [2, 0, 0])
    # rotation is orthonormal
    np.testing.assert_allclose(pose[:3, :3] @ pose[:3, :3].T, np.eye(3),
                               atol=1e-9)

    c2ws = [vz.look_at_pose(p, [0, 0, 0]) for p in
            ([1.5, 0, 0.5], [0, 1.5, 0.5], [-1.5, 0, 0.5])]
    geo = vz.pose_sphere_geometry(c2ws, focal=20.0, img_wh=(16, 12),
                                  n_ray_views=2, rays_per_view=8)
    assert geo["frustum_points"].shape == (3 * 5, 3)
    assert geo["frustum_lines"].shape == (3 * 8, 2)
    assert geo["frustum_lines"].max() == 14
    assert geo["ray_segments"].shape == (16, 2, 3)
    # rays start near the camera and head toward the scene (unit sphere)
    starts = geo["ray_segments"][:8, 0]
    np.testing.assert_allclose(starts, starts[:1].repeat(8, 0), atol=0.05)
    sphere = geo["sphere_segments"]
    np.testing.assert_allclose(np.linalg.norm(sphere.reshape(-1, 3), axis=1),
                               1.0, atol=1e-9)


def test_camera_frustum_lines():
    pts, lines = vz.camera_frustum_lines(np.eye(4), 10.0, (8, 6))
    assert pts.shape == (5, 3) and lines.shape == (8, 2)
    np.testing.assert_allclose(pts[0], 0.0)  # apex at camera center


def test_blender_export(micro_scene):
    from neo360_tpu.data.blender_export import export_transforms, focal2fov
    path = export_transforms(micro_scene, "train")
    assert os.path.exists(path)
    with open(path) as f:
        data = json.load(f)
    assert "camera_angle_x" in data
    assert len(data["frames"]) == 103
    m = np.array(data["frames"][0]["transform_matrix"])
    assert m.shape == (4, 4)
    # normalized translations (pose_scale_factor applied)
    assert np.abs(m[:3, 3]).max() <= 1.0 + 1e-6
    assert 0 < focal2fov(35.0, 40) < np.pi
