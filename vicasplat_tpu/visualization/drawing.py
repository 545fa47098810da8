"""Drawing utilities: project and draw camera wireframes, points, and lines
over images; matplotlib camera-trajectory figures.

Parity target: reference src/visualization/drawing/ (lines/points/cameras)
and `create_plotly_cameras_visualization` (cameras.py:42) — replaced with a
matplotlib 3D figure since plotly isn't available in this environment.
"""
from __future__ import annotations

import numpy as np

from ..geometry_np import get_fov_np


def _frustum_points(extrinsic: np.ndarray, intrinsic: np.ndarray,
                    scale: float = 0.2) -> np.ndarray:
    """5 points (apex + 4 image corners) of a camera frustum in world space."""
    fov = get_fov_np(intrinsic)
    tx, ty = np.tan(fov[0] / 2) * scale, np.tan(fov[1] / 2) * scale
    corners_cam = np.array(
        [
            [0.0, 0.0, 0.0],
            [-tx, -ty, scale],
            [tx, -ty, scale],
            [tx, ty, scale],
            [-tx, ty, scale],
        ]
    )
    R, t = extrinsic[:3, :3], extrinsic[:3, 3]
    return corners_cam @ R.T + t


def draw_points(image: np.ndarray, xy: np.ndarray, color=(1.0, 0.0, 0.0),
                radius: int = 2) -> np.ndarray:
    """Draw normalized-coordinate points onto an (H, W, 3) image."""
    out = image.copy()
    h, w = image.shape[:2]
    for x, y in np.atleast_2d(xy):
        cx, cy = int(x * w), int(y * h)
        y0, y1 = max(0, cy - radius), min(h, cy + radius + 1)
        x0, x1 = max(0, cx - radius), min(w, cx + radius + 1)
        out[y0:y1, x0:x1] = color
    return out


def draw_line(image: np.ndarray, p0, p1, color=(0.0, 1.0, 0.0)) -> np.ndarray:
    """Draw a line between normalized coords via dense sampling."""
    h, w = image.shape[:2]
    n = int(max(h, w) * max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]))) + 2
    ts = np.linspace(0, 1, n)
    xs = ((p0[0] + (p1[0] - p0[0]) * ts) * w).astype(int)
    ys = ((p0[1] + (p1[1] - p0[1]) * ts) * h).astype(int)
    ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    out = image.copy()
    out[ys[ok], xs[ok]] = color
    return out


_EDGES = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]


def draw_cameras_figure(gt_extrinsics: np.ndarray,
                        pred_extrinsics: np.ndarray | None = None,
                        scale: float = 0.15):
    """Matplotlib 3D figure of camera frustums (GT blue, predicted red).

    Returns an (H, W, 3) float image (the rendered figure).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    K = np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])

    def plot(extr, color, label):
        for i, e in enumerate(extr):
            pts = _frustum_points(e, K, scale)
            for a, b in _EDGES:
                ax.plot(*zip(pts[a], pts[b]), color=color, linewidth=0.8,
                        label=label if (i == 0 and (a, b) == _EDGES[0]) else None)

    plot(np.asarray(gt_extrinsics), "tab:blue", "ground truth")
    if pred_extrinsics is not None:
        plot(np.asarray(pred_extrinsics), "tab:red", "predicted")
    ax.legend(loc="upper right")
    ax.set_box_aspect((1, 1, 1))
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return buf.astype(np.float32) / 255.0
