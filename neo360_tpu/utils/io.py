"""Image / depth / video / stats output utilities.

Parity with reference models/utils.py:12-109: `to8b`, JPEG image sequences,
globally-normalized JET depth colormaps, raw npz depths, mp4 at 20 fps, and
the results.json stats writer. Host-side (numpy / imageio / cv2).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def to8b(x: np.ndarray) -> np.ndarray:
    return (255 * np.clip(np.asarray(x), 0.0, 1.0)).astype(np.uint8)


def store_image(dirpath: str, rgbs: Sequence[np.ndarray],
                name: str = "image") -> List[str]:
    """Save a list of (H, W, 3) float images as JPEGs image000.jpg..."""
    from PIL import Image
    os.makedirs(dirpath, exist_ok=True)
    paths = []
    for i, rgb in enumerate(rgbs):
        path = os.path.join(dirpath, f"{name}{str(i).zfill(3)}.jpg")
        Image.fromarray(to8b(rgb)).save(path)
        paths.append(path)
    return paths


def store_depth_img(dirpath: str, depths: Sequence[np.ndarray],
                    name: str = "depth_img") -> List[str]:
    """JET-colormapped depths, normalized by the GLOBAL max over the set
    (parity with models/utils.py:29-43)."""
    import cv2
    os.makedirs(dirpath, exist_ok=True)
    arrs = [np.asarray(d) for d in depths]
    global_max = max((float(np.nanmax(d)) for d in arrs), default=1.0) or 1.0
    paths = []
    for i, depth in enumerate(arrs):
        d8 = to8b(depth / global_max)
        img = cv2.applyColorMap(d8, cv2.COLORMAP_JET)
        path = os.path.join(dirpath, f"{name}{str(i).zfill(3)}.jpg")
        cv2.imwrite(path, img)
        paths.append(path)
    return paths


def store_depth_raw(dirpath: str, depths: Sequence[np.ndarray],
                    name: str = "depth_raw") -> List[str]:
    os.makedirs(dirpath, exist_ok=True)
    paths = []
    for i, depth in enumerate(depths):
        path = os.path.join(dirpath, f"{name}{str(i).zfill(3)}.npz")
        np.savez_compressed(path, depth=np.asarray(depth))
        paths.append(path)
    return paths


def store_video(dirpath: str, rgbs: Sequence[np.ndarray],
                name: str = "video.mp4", fps: int = 20) -> str:
    """mp4 via OpenCV's bundled codec; falls back to an animated GIF when no
    video codec is available (this image has no ffmpeg)."""
    import cv2
    os.makedirs(dirpath, exist_ok=True)
    path = os.path.join(dirpath, name)
    frames = [to8b(r) for r in rgbs]
    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (w, h))
    if writer.isOpened():
        for f in frames:
            writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        writer.release()
        if os.path.getsize(path) > 0:
            return path
    # codec unavailable: animated GIF
    from PIL import Image
    path = os.path.splitext(path)[0] + ".gif"
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    return path


def write_stats(path: str, **metric_groups) -> str:
    """results.json writer (parity with models/utils.py:62-73):
    write_stats(path, psnr=..., ssim=..., lpips=..., psnr_obj=...)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {}
    for name, values in metric_groups.items():
        if values is None:
            continue
        if isinstance(values, str):
            payload[name] = values
        elif isinstance(values, dict):
            payload[name] = {k: float(v) for k, v in values.items()}
        elif np.isscalar(values) or np.ndim(values) == 0:
            payload[name] = float(values)
        else:
            payload[name] = [float(v) for v in np.asarray(values).ravel()]
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
    return path


def save_variables_npz(path: str, variables: Dict) -> str:
    """Save a (nested) Flax variables dict as a flat npz with '/'-joined
    keys — the torch-free pretrained-weight artifact format
    (scripts/convert_weights.py)."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else str(k), v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", variables)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)
    return path


def load_variables_npz(path: str) -> Dict:
    """Inverse of save_variables_npz: flat '/'-joined npz -> nested dict."""
    out: Dict = {}
    with np.load(path) as data:
        for key in data.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = data[key]
    return out


def visualize_depth(depth: np.ndarray,
                    near_far: Optional[tuple] = None) -> np.ndarray:
    """Single-image JET colormap (RGB float in [0,1]) for logging grids
    (parity with utils/train_helper.py:9-30)."""
    import cv2
    d = np.asarray(depth, np.float32)
    lo, hi = (near_far if near_far is not None
              else (np.nanmin(d), np.nanmax(d)))
    d = (d - lo) / max(hi - lo, 1e-8)
    img = cv2.applyColorMap(to8b(d), cv2.COLORMAP_JET)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
