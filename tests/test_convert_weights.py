"""Pretrained-weight conversion workflow (scripts/convert_weights.py):
torch checkpoints -> torch-free npz artifacts -> the --resnet_weights /
--lpips_weights loaders. Uses randomly-initialized torch state dicts (the
zero-egress image has no pretrained downloads; shapes and key layouts are
identical to the real checkpoints)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def _fake_vgg16_lpips_state(seed=0):
    """Random state dict with the real combined-checkpoint key layout:
    torchvision VGG16 `features.{idx}.weight/.bias` + lpips
    `lin{i}.model.1.weight`."""
    rng = np.random.default_rng(seed)
    sd = {}
    cfg = (2, 2, 3, 3, 3)
    channels = (64, 128, 256, 512, 512)
    idx, in_ch = 0, 3
    for n_convs, ch in zip(cfg, channels):
        for _ in range(n_convs):
            sd[f"features.{idx}.weight"] = rng.normal(
                size=(ch, in_ch, 3, 3)).astype(np.float32)
            sd[f"features.{idx}.bias"] = rng.normal(size=ch).astype(
                np.float32)
            in_ch = ch
            idx += 2
        idx += 1
    for i, ch in enumerate(channels):
        sd[f"lin{i}.model.1.weight"] = np.abs(rng.normal(
            size=(1, ch, 1, 1))).astype(np.float32)
    return sd


def test_npz_variables_roundtrip(tmp_path):
    from neo360_tpu.utils.io import load_variables_npz, save_variables_npz
    tree = {"params": {"a": np.arange(6.0).reshape(2, 3),
                       "nested": {"b": np.ones(4, np.float32)}},
            "batch_stats": {"m": np.zeros(2)}}
    path = save_variables_npz(str(tmp_path / "w.npz"), tree)
    back = load_variables_npz(path)
    np.testing.assert_array_equal(back["params"]["a"], tree["params"]["a"])
    np.testing.assert_array_equal(back["params"]["nested"]["b"],
                                  tree["params"]["nested"]["b"])
    np.testing.assert_array_equal(back["batch_stats"]["m"],
                                  tree["batch_stats"]["m"])


@pytest.mark.slow
def test_convert_resnet_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    torchvision = pytest.importorskip("torchvision")
    import convert_weights
    from neo360_tpu.nn.resnet import convert_torch_state_dict, load_pretrained

    model = torchvision.models.resnet34()        # random init, no download
    src = str(tmp_path / "resnet34.pth")
    torch.save(model.state_dict(), src)
    dst = str(tmp_path / "resnet34.npz")
    convert_weights.convert_resnet(src, dst)

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    expect = convert_torch_state_dict(sd)
    got = load_pretrained(dst)
    np.testing.assert_array_equal(
        got["params"]["conv1"]["kernel"], expect["params"]["conv1"]["kernel"])
    np.testing.assert_array_equal(
        got["batch_stats"]["layer3_5"]["bn2"]["var"],
        expect["batch_stats"]["layer3_5"]["bn2"]["var"])
    # loader also still accepts the raw torch checkpoint
    direct = load_pretrained(src)
    np.testing.assert_array_equal(
        direct["params"]["conv1"]["kernel"],
        expect["params"]["conv1"]["kernel"])


def test_convert_lpips_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    import convert_weights
    from neo360_tpu.nn.lpips import LPIPSModel, load_torch_weights

    sd = _fake_vgg16_lpips_state()
    src = str(tmp_path / "vgg16_lpips.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, src)
    dst = str(tmp_path / "vgg16_lpips.npz")
    convert_weights.convert_lpips(src, dst)

    expect = load_torch_weights(src)
    got = load_torch_weights(dst)
    np.testing.assert_array_equal(got["params"]["lin3"],
                                  expect["params"]["lin3"])
    np.testing.assert_array_equal(
        got["params"]["vgg"]["conv2_1"]["kernel"],
        expect["params"]["vgg"]["conv2_1"]["kernel"])

    model = LPIPSModel(dst)
    assert model.pretrained
    x = np.zeros((1, 16, 16, 3), np.float32)
    y = np.full((1, 16, 16, 3), 0.5, np.float32)
    d = np.asarray(model(x, y))
    assert np.isfinite(d).all() and float(d[0]) > 0


def test_missing_weights_marker(tmp_path):
    """Eval without LPIPS weights writes an explicit skip marker into
    results.json instead of silently omitting the metric."""
    import json
    from neo360_tpu.train.eval import evaluate_and_save

    h, w = 6, 8
    rng = np.random.default_rng(0)

    def render_fn(sample):
        return {"rgb": rng.uniform(size=(h * w, 3)).astype(np.float32),
                "depth": rng.uniform(size=(h * w,)).astype(np.float32)}

    samples = [{"target": rng.uniform(size=(h * w, 3)).astype(np.float32)}
               for _ in range(2)]
    rj = str(tmp_path / "results.json")
    summary = evaluate_and_save(render_fn, samples, (w, h),
                                str(tmp_path / "out"), None,
                                results_json=rj)
    assert "psnr" in summary and "lpips" not in summary
    payload = json.load(open(rj))
    assert payload["lpips_status"].startswith("skipped")
    out = os.listdir(tmp_path / "out")
    assert sum(f.startswith("image") for f in out) == 2
    assert sum(f.startswith("depth_raw") for f in out) == 2
    assert sum(f.startswith("depth_img") for f in out) == 2
