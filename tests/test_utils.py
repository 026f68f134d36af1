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
