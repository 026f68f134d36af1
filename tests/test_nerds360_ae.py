import numpy as np
import pytest

from neo360_tpu.data.nerds360_ae import NeRDS360AE, get_nearest_pose_ids


@pytest.fixture(scope="module")
def ds(multi_scene_root):
    return NeRDS360AE(multi_scene_root, split="train", img_wh=(40, 30),
                      ray_batch_size=128, dest_views_per_sample=5)


def test_scene_discovery(ds):
    assert len(ds.scene_ids) == 3
    meta = ds.scene_meta(ds.scene_ids[0])
    assert meta.c2w_train.shape == (100, 4, 4)
    assert len(meta.c2w_val_tail) == 3      # fixture: 103 train-split views
    assert len(meta.c2w_test) == 5


def test_train_sample_shapes(ds):
    rng = np.random.default_rng(0)
    s = ds.sample_train(rng)
    assert s["src_imgs"].shape == (3, 30, 40, 3)
    assert s["src_poses"].shape == (3, 4, 4)
    assert s["src_focal"].shape == (3,)
    assert s["src_c"].shape == (3, 2)
    for k in ("rays_o", "viewdirs", "rays_d", "target", "nocs_2d"):
        assert s[k].shape == (128, 3), k
    assert s["radii"].shape == (128, 1)
    assert s["instance_mask"].shape == (128, 1)
    # src images normalized to [-1, 1]
    assert s["src_imgs"].min() >= -1.0 and s["src_imgs"].max() <= 1.0
    assert s["src_imgs"].min() < -0.01
    # viewdirs unit norm
    np.testing.assert_allclose(
        np.linalg.norm(s["viewdirs"], axis=-1), 1.0, atol=1e-5)


def test_train_targets_match_pixels(ds):
    """Ray->pixel correspondence: shoot the sampled ray through the fixture
    renderer's conventions by re-reading the pixel from the image."""
    rng = np.random.default_rng(1)
    s = ds.sample_train(rng)
    assert s["target"].min() >= 0.0 and s["target"].max() <= 1.0
    # rays originate at camera centers: only num_src-excluded dest views used
    origins = np.unique(np.round(s["rays_o"], 5), axis=0)
    assert len(origins) <= 5  # dest_views_per_sample


def test_lpips_patch_mode(multi_scene_root):
    ds = NeRDS360AE(multi_scene_root, split="train", img_wh=(40, 30),
                    finetune_lpips=True, patch_size=8)
    s = ds.sample_train(np.random.default_rng(0))
    assert s["target"].shape == (64, 3)
    # single view -> single origin
    assert len(np.unique(np.round(s["rays_o"], 5), axis=0)) == 1


def test_val_and_test_samples(multi_scene_root):
    ds = NeRDS360AE(multi_scene_root, split="val", img_wh=(40, 30))
    s = ds.sample_val(0, dest_offset=1, src_views=[0, 38, 44])
    assert s["target"].shape == (40 * 30, 3)
    assert s["src_imgs"].shape == (3, 30, 40, 3)

    ds_t = NeRDS360AE(multi_scene_root, split="test", img_wh=(40, 30))
    s = ds_t.sample_test(1, 2, src_views=[0, 15, 38])
    assert s["target"].shape == (40 * 30, 3)


def test_optimize_mode_fixed_views(multi_scene_root):
    ds = NeRDS360AE(multi_scene_root, split="train", img_wh=(40, 30),
                    optimize=True, ray_batch_size=64)
    s = ds.sample_train(np.random.default_rng(0))
    # sample_train picks a random scene first; replicate the draw
    scene = np.random.default_rng(0).integers(len(ds.scene_ids))
    meta = ds.scene_meta(ds.scene_ids[scene])
    # sources are the fixed [0, 38, 44] list
    np.testing.assert_allclose(s["src_poses"][0], meta.c2w_train[0])
    np.testing.assert_allclose(s["src_poses"][1], meta.c2w_train[38])


def test_nearest_pose_ids(multi_scene_root):
    ds = NeRDS360AE(multi_scene_root, split="train", img_wh=(40, 30))
    meta = ds.scene_meta(ds.scene_ids[0])
    ids = get_nearest_pose_ids(meta.c2w_train[10], meta.c2w_train,
                               num_select=4, tar_id=10)
    assert 10 not in ids
    assert len(ids) == 4
    # nearest by look-vector should be nearby indices on the camera ring
    for m in ("matrix", "dist"):
        ids_m = get_nearest_pose_ids(meta.c2w_train[10], meta.c2w_train,
                                     num_select=4, tar_id=10,
                                     angular_dist_method=m)
        assert len(ids_m) == 4


def test_prefetch_pipeline(ds):
    import itertools
    from neo360_tpu.train.pipeline import prefetch_to_device, train_iterator
    it = prefetch_to_device(itertools.islice(train_iterator(ds, seed=1), 3))
    items = list(it)
    assert len(items) == 3
    import jax
    assert isinstance(items[0]["rays_o"], jax.Array)


def test_prefetch_propagates_producer_error():
    """A crashed producer must raise at the consumer, not silently end the
    stream (silent StopIteration would truncate a training run or eval
    sweep with no error)."""
    from neo360_tpu.train.pipeline import prefetch_to_device

    def boom():
        yield {"ok": 1}
        raise RuntimeError("sampler died")

    it = prefetch_to_device(boom(), size=2, place_fn=lambda x: x)
    assert next(it)["ok"] == 1
    with pytest.raises(RuntimeError, match="sampler died"):
        for _ in it:
            pass


def test_prefetch_slow_consumer_terminates():
    """Sentinel delivery with a FULL queue at producer exhaustion: a finite
    stream consumed slower than it is produced (run_eval's shape — each view
    renders for seconds) must still terminate instead of blocking forever in
    q.get() after the last item (round-4 advisor high)."""
    import time
    from neo360_tpu.train.pipeline import prefetch_to_device

    it = prefetch_to_device(iter(range(5)), size=1, place_fn=lambda x: x)
    time.sleep(0.5)  # producer exhausts the iterator while queue is full
    got = []
    for x in it:
        time.sleep(0.05)  # slow consumer
        got.append(x)
    assert got == [0, 1, 2, 3, 4]
    # repeated iteration after exhaustion terminates deterministically
    with pytest.raises(StopIteration):
        next(it)
    with pytest.raises(StopIteration):
        next(it)


def test_prefetch_error_with_full_queue():
    """Producer raises while the queue is full: the stored exception must
    still reach the consumer (round-4 advisor medium)."""
    import time
    from neo360_tpu.train.pipeline import prefetch_to_device

    def boom():
        yield 1
        yield 2
        raise RuntimeError("late sampler death")

    it = prefetch_to_device(boom(), size=1, place_fn=lambda x: x)
    time.sleep(0.5)  # queue full (1 slot) when the producer raises
    with pytest.raises(RuntimeError, match="late sampler death"):
        for _ in it:
            time.sleep(0.05)
