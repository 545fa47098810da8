"""Image/video IO helpers (host-side, PIL/numpy).

Parity target: reference src/misc/image_io.py:38-98.
"""
from __future__ import annotations

import pathlib

import numpy as np
from PIL import Image


def to_uint8(image: np.ndarray) -> np.ndarray:
    return (np.clip(np.asarray(image), 0.0, 1.0) * 255).round().astype(np.uint8)


def save_image(image: np.ndarray, path) -> None:
    """(H, W, 3) or (H, W) float [0,1] -> PNG/JPEG."""
    path = pathlib.Path(path)
    path.parent.mkdir(exist_ok=True, parents=True)
    Image.fromarray(to_uint8(image)).save(path)


def load_image(path) -> np.ndarray:
    """-> (H, W, 3) float32 [0, 1]."""
    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def save_video(frames: np.ndarray, path, fps: int = 30) -> None:
    """(T, H, W, 3) float [0,1] -> mp4 via OpenCV (fallback: per-frame PNGs)."""
    path = pathlib.Path(path)
    path.parent.mkdir(exist_ok=True, parents=True)
    frames8 = to_uint8(frames)
    try:
        import cv2

        h, w = frames8.shape[1:3]
        writer = cv2.VideoWriter(
            str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
        )
        for f in frames8:
            writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        writer.release()
    except Exception:
        stem = path.with_suffix("")
        stem.mkdir(exist_ok=True, parents=True)
        for i, f in enumerate(frames8):
            Image.fromarray(f).save(stem / f"{i:04d}.png")


def hcat(*images: np.ndarray, gap: int = 2) -> np.ndarray:
    """Horizontally concatenate images (pad heights to max)."""
    h = max(im.shape[0] for im in images)
    cols = []
    for im in images:
        if im.ndim == 2:
            im = np.repeat(im[..., None], 3, -1)
        pad = h - im.shape[0]
        if pad:
            im = np.pad(im, ((0, pad), (0, 0), (0, 0)))
        cols.append(im)
        cols.append(np.ones((h, gap, 3), im.dtype))
    return np.concatenate(cols[:-1], axis=1)


def vcat(*images: np.ndarray, gap: int = 2) -> np.ndarray:
    return hcat(*[im.transpose(1, 0, 2) for im in images], gap=gap).transpose(1, 0, 2)


def vis_depth_map(depth: np.ndarray, lo_q: float = 0.01, hi_q: float = 0.99) -> np.ndarray:
    """Log-quantile normalized turbo-ish colormap of a depth map
    (reference src/misc/utils.py:13-35 semantics)."""
    import matplotlib.cm as cm

    d = np.asarray(depth, np.float64)
    valid = d > 0
    if valid.any():
        lo = np.quantile(np.log(d[valid]), lo_q)
        hi = np.quantile(np.log(d[valid]), hi_q)
        x = np.zeros_like(d)
        x[valid] = (np.log(d[valid]) - lo) / max(hi - lo, 1e-9)
        x = np.clip(x, 0, 1)
    else:
        x = np.zeros_like(d)
    return cm.get_cmap("turbo")(1.0 - x)[..., :3].astype(np.float32)
