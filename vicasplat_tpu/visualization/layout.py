"""Image layout utilities: concatenation, borders, labels.

Parity target: reference src/visualization/{layout,annotation}.py — pure
image ops used to build validation/test comparison grids. Numpy (H, W, 3)
float [0,1] images.
"""
from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw, ImageFont


def _to3(im: np.ndarray) -> np.ndarray:
    if im.ndim == 2:
        im = np.repeat(im[..., None], 3, -1)
    return im.astype(np.float32)


def add_border(image: np.ndarray, border: int = 8, color=1.0) -> np.ndarray:
    image = _to3(image)
    h, w, _ = image.shape
    out = np.full((h + 2 * border, w + 2 * border, 3), color, np.float32)
    out[border:border + h, border:border + w] = image
    return out


def _pad_to(im: np.ndarray, h: int, w: int, color=1.0) -> np.ndarray:
    out = np.full((h, w, 3), color, np.float32)
    oh, ow = (h - im.shape[0]) // 2, (w - im.shape[1]) // 2
    out[oh:oh + im.shape[0], ow:ow + im.shape[1]] = im
    return out


def hcat(*images, align: str = "center", gap: int = 0, gap_color=1.0):
    images = [_to3(im) for im in images]
    h = max(im.shape[0] for im in images)
    cols = []
    for i, im in enumerate(images):
        cols.append(_pad_to(im, h, im.shape[1], gap_color))
        if gap and i < len(images) - 1:
            cols.append(np.full((h, gap, 3), gap_color, np.float32))
    return np.concatenate(cols, axis=1)


def vcat(*images, align: str = "center", gap: int = 0, gap_color=1.0):
    images = [_to3(im) for im in images]
    w = max(im.shape[1] for im in images)
    rows = []
    for i, im in enumerate(images):
        rows.append(_pad_to(im, im.shape[0], w, gap_color))
        if gap and i < len(images) - 1:
            rows.append(np.full((gap, w, 3), gap_color, np.float32))
    return np.concatenate(rows, axis=0)


def add_label(image: np.ndarray, label: str, font_size: int = 14) -> np.ndarray:
    """Render a text label above the image (reference annotation.py)."""
    image = _to3(image)
    w = image.shape[1]
    bar_h = font_size + 8
    bar = Image.new("RGB", (w, bar_h), (255, 255, 255))
    draw = ImageDraw.Draw(bar)
    try:
        font = ImageFont.load_default(size=font_size)
    except TypeError:
        font = ImageFont.load_default()
    draw.text((4, 3), label, fill=(0, 0, 0), font=font)
    bar_np = np.asarray(bar, np.float32) / 255.0
    return np.concatenate([bar_np, image], axis=0)


def apply_color_map(x: np.ndarray, cmap: str = "inferno") -> np.ndarray:
    """Scalar map [0,1] -> RGB via matplotlib colormap."""
    import matplotlib

    return matplotlib.colormaps[cmap](np.clip(x, 0, 1))[..., :3].astype(np.float32)
