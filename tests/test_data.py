import json
import os

import numpy as np

from neo360_tpu.data.nerds360 import NeRDS360


def test_fixture_layout(micro_scene):
    for split in ("train", "val"):
        assert os.path.isdir(os.path.join(micro_scene, split, "rgb"))
        pose_file = os.path.join(micro_scene, split, "pose", "pose.json")
        with open(pose_file) as f:
            data = json.load(f)
        for key in ("focal", "img_size", "obj_location", "transform",
                    "bbox_dimensions"):
            assert key in data


def test_train_split_buffers(micro_scene):
    ds = NeRDS360(micro_scene, split="train", img_wh=(40, 30))
    assert ds.num_images == 100
    buffers = ds.ray_buffers()
    n = 100 * 40 * 30
    assert buffers["rays_o"].shape == (n, 3)
    assert buffers["viewdirs"].shape == (n, 3)
    assert buffers["radii"].shape == (n, 1)
    assert buffers["target"].shape == (n, 3)
    v = np.asarray(buffers["viewdirs"])
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    t = np.asarray(buffers["target"])
    assert t.min() >= 0.0 and t.max() <= 1.0


def test_val_and_test_splits(micro_scene):
    val = NeRDS360(micro_scene, split="val", img_wh=(40, 30))
    assert val.num_images == 3  # fixture writes 103 train-split images
    test = NeRDS360(micro_scene, split="test", img_wh=(40, 30))
    assert test.num_images == 5
    sample = test.image_rays(0)
    assert sample["target"].shape == (40 * 30, 3)
    assert "instance_mask" in sample
    # scale factor shared between train and test parse paths
    np.testing.assert_allclose(val.pose_scale_factor, test.pose_scale_factor)


def test_cameras_inside_unit_ball_after_scaling(micro_scene):
    """Pose normalization must keep origins usable for the NeRF++ sphere."""
    ds = NeRDS360(micro_scene, split="train", img_wh=(40, 30))
    t = ds.c2w[:, :3, 3]
    assert np.max(np.abs(t)) <= 1.0 + 1e-5
