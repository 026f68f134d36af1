"""Streaming pipelined eval loop (train/eval.evaluate_and_save).

The loop dispatches view i's device work, then fetches/writes view i-1
while i renders (one-view software pipeline). These tests pin the
semantics that must survive that overlap: per-view artifact order,
summary math, mid-loop error propagation with a drained writer, and
writer-error fail-fast."""

import json
import os

import numpy as np
import pytest

from neo360_tpu.train import eval as ev


def _mk_samples(n, w, h, with_mask=True):
    samples = []
    for i in range(n):
        s = {"target": np.full((h * w, 3), i / (n + 1), np.float32)}
        if with_mask:
            m = np.zeros((h, w), np.float32)
            m[1:4, 1:5] = 1.0
            s["instance_mask"] = m.reshape(-1)
        samples.append(s)
    return samples


def _render_fn_for(w, h, n):
    def render_fn(sample):
        # recover the view index from the constant target value
        i = int(round(float(sample["target"][0, 0]) * (n + 1)))
        return {"rgb": np.full((h * w, 3), (i + 1) / (n + 2), np.float32),
                "depth": np.full((h * w,), 1.0 + i, np.float32)}
    return render_fn


def test_streaming_eval_artifacts_and_summary(tmp_path):
    w, h, n = 8, 6, 4
    out_dir = str(tmp_path / "views")
    rj = str(tmp_path / "results.json")
    samples = _mk_samples(n, w, h)
    summary = ev.evaluate_and_save(
        _render_fn_for(w, h, n), samples, (w, h), out_dir,
        results_json=rj, extra={"eval_bn_mode": "running"})

    # per-view artifacts, in order, all views
    for i in range(n):
        assert os.path.exists(os.path.join(out_dir, f"image{i:03d}.jpg"))
        path = os.path.join(out_dir, f"depth_raw{i:03d}.npz")
        assert os.path.exists(path)
        # depth written for the RIGHT view (pipelining must not swap views)
        assert float(np.load(path)["depth"][0, 0]) == 1.0 + i
        assert os.path.exists(os.path.join(out_dir, f"depth_img{i:03d}.jpg"))

    # summary = mean over per-view psnr of constant images
    expect = np.mean([-10 * np.log10(((i + 1) / (n + 2) - i / (n + 1)) ** 2)
                      for i in range(n)])
    assert summary["psnr"] == pytest.approx(expect, abs=0.05)
    assert "ssim" in summary and "psnr_obj" in summary
    stats = json.load(open(rj))
    assert stats["eval_bn_mode"] == "running"
    assert "skipped" in stats["lpips_status"]
    assert stats["psnr"]["mean"] == pytest.approx(summary["psnr"], rel=1e-6)


def test_streaming_eval_render_error_propagates_and_drains(tmp_path):
    """A render error on view k must raise (not hang), with views < k-1
    already written by the drained writer thread."""
    w, h, n = 8, 6, 5
    base = _render_fn_for(w, h, n)

    def failing(sample):
        i = int(round(float(sample["target"][0, 0]) * (n + 1)))
        if i == 3:
            raise RuntimeError("boom on view 3")
        return base(sample)

    with pytest.raises(RuntimeError, match="boom on view 3"):
        ev.evaluate_and_save(failing, _mk_samples(n, w, h), (w, h),
                             str(tmp_path / "v"))
    # pipelined: views finish one behind dispatch — views 0/1 are fetched
    # before view 3 dispatches, so at least their jpgs must exist
    for i in range(2):
        assert os.path.exists(str(tmp_path / "v" / f"image{i:03d}.jpg"))


def test_streaming_eval_writer_error_fails_fast(tmp_path, monkeypatch):
    """A WRITER-thread failure (e.g. disk full on view 0's npz) must abort
    the loop promptly instead of rendering all remaining views first."""
    import time
    rendered = []
    w, h, n = 8, 6, 50
    base = _render_fn_for(w, h, n)

    def counting(sample):
        rendered.append(1)
        time.sleep(0.01)   # give the writer thread time to hit the error
        return base(sample)

    def bad_savez(*a, **kw):
        raise OSError("disk full")

    monkeypatch.setattr(ev.np, "savez_compressed", bad_savez)
    with pytest.raises(OSError, match="disk full"):
        ev.evaluate_and_save(counting, _mk_samples(n, w, h, with_mask=False),
                             (w, h), str(tmp_path / "v"))
    assert len(rendered) < n, "loop rendered every view despite the error"
