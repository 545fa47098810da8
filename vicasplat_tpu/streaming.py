"""Long-video reconstruction: sliding-window inference with scale-aligned
pose chaining and Gaussian re-basing into one global frame.

The model reconstructs a fixed clip length T (reference VicaSplat trains
at 2/4/8 context views and its demo consumes exactly one clip,
reference demo.py:85-132 — there is no long-video story). Streaming here
is windowed:

  - slide a T-frame window with `overlap` shared frames (stride T-overlap);
  - each window is reconstructed independently (frame 0 = identity, its
    own arbitrary monocular scale);
  - the window's scale is aligned to the running global scale by the
    median ratio of relative-translation magnitudes over the shared
    frames (the standard sliding-window SfM fix for per-window scale
    ambiguity);
  - poses chain through the shared frame: G_k = G_prev @ pose_prev[shift]
    (so re-detected overlap frames agree by construction at the seam);
  - Gaussians of the T-overlap NEW frames are rigidly re-based into the
    global frame on device (means/covariances/rotations rotated, SH
    rotated with ops.sh.rotate_sh, scale factor applied), and the overlap
    frames keep the earlier window's Gaussians (no duplicates).

Chunking math is host-side numpy on (4, 4) matrices; all heavy work (the
per-window forward and the per-window Gaussian re-basing) is jitted and
shape-stable, so the whole stream reuses two compiled programs.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .geometry.quaternion import matrix_to_quat, qmul
from .models.adapter import Gaussians
from .ops.sh import rotate_sh


# ---------------------------------------------------------------------------
# pure chaining math (host, numpy) — unit-testable without a model
# ---------------------------------------------------------------------------

def plan_windows(n_frames: int, window: int, overlap: int):
    """Start indices of each window; the last window is shifted left to end
    exactly at n_frames (its overlap with the previous one then grows)."""
    if n_frames < window:
        raise ValueError(f"need >= {window} frames, got {n_frames}")
    if not 1 <= overlap < window:
        raise ValueError("overlap must be in [1, window)")
    step = window - overlap
    starts = list(range(0, n_frames - window + 1, step))
    if starts[-1] + window < n_frames:
        starts.append(n_frames - window)
    return starts


def align_window_scale(prev_poses: np.ndarray, cur_poses: np.ndarray,
                      shift: int) -> float:
    """Scale of the current window relative to the previous one.

    `prev_poses`/`cur_poses` are (T, 4, 4) c2w in each window's own frame;
    the current window's frame j corresponds to the previous window's
    frame j + shift. Relative translations between consecutive shared
    frames are scale-covariant, so the median magnitude ratio is the
    per-window monocular scale drift."""
    T = cur_poses.shape[0]
    n_shared = T - shift
    ratios = []
    for j in range(n_shared - 1):
        d_prev = np.linalg.norm(prev_poses[shift + j + 1, :3, 3]
                                - prev_poses[shift + j, :3, 3])
        d_cur = np.linalg.norm(cur_poses[j + 1, :3, 3]
                               - cur_poses[j, :3, 3])
        if d_cur > 1e-9 and d_prev > 1e-9:
            ratios.append(d_prev / d_cur)
    return float(np.median(ratios)) if ratios else 1.0


def chain_windows(window_poses, starts):
    """Chain per-window local poses into global c2w.

    window_poses: list of (T, 4, 4) numpy arrays (local: frame 0 identity,
    per-window scale). Returns (global_poses (F, 4, 4), scales, bases):
    window k's local pose p becomes `bases[k] @ scale_t(p, scales[k])`
    where scale_t scales the translation. Overlap frames keep the earlier
    window's pose (seam frames agree by construction).
    """
    T = window_poses[0].shape[0]
    n_frames = starts[-1] + T
    global_poses = np.zeros((n_frames, 4, 4))
    scales, bases = [], []
    base = np.eye(4)
    scale = 1.0
    for k, (s, poses) in enumerate(zip(starts, window_poses)):
        if k > 0:
            shift = s - starts[k - 1]
            rel_scale = align_window_scale(window_poses[k - 1], poses, shift)
            scale = scales[k - 1] * rel_scale
            prev_anchor = window_poses[k - 1][shift].copy()
            prev_anchor[:3, 3] *= scales[k - 1]
            base = bases[k - 1] @ prev_anchor
        scales.append(scale)
        bases.append(base)
        first_new = 0 if k == 0 else (starts[k - 1] + T) - s
        for j in range(first_new, T):
            p = poses[j].copy()
            p[:3, 3] *= scale
            global_poses[s + j] = base @ p
    return global_poses, np.asarray(scales), np.stack(bases)


# ---------------------------------------------------------------------------
# device-side Gaussian re-basing
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("sh_degree",))
def rebase_gaussians(g: Gaussians, base: jnp.ndarray, scale: jnp.ndarray,
                     sh_degree: int) -> Gaussians:
    """Rigidly transform pixel-aligned Gaussians (leading dims arbitrary)
    by the 4x4 `base` after scaling the window's metric by `scale`."""
    R, t = base[:3, :3], base[:3, 3]
    means = scale * g.means @ R.T + t
    cov = (scale ** 2) * jnp.einsum(
        "ij,...jk,lk->...il", R, g.covariances, R)
    q_r = jnp.broadcast_to(matrix_to_quat(R), g.rotations.shape)
    rotations = qmul(q_r, g.rotations)
    harmonics = rotate_sh(g.harmonics, R, degree=sh_degree)
    return Gaussians(means=means, covariances=cov, harmonics=harmonics,
                     opacities=g.opacities, scales=scale * g.scales,
                     rotations=rotations)


# ---------------------------------------------------------------------------
# engine orchestration
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class StreamedScene:
    """Global-frame reconstruction of a long video."""
    gaussians: Gaussians          # leading dims (F, H, W) — per NEW frame
    poses: np.ndarray             # (F, 4, 4) global c2w, frame 0 identity
    intrinsics: Optional[np.ndarray]  # (F, 3, 3) when predicted
    window_scales: np.ndarray     # per-window scale factors applied


def reconstruct_video(engine, images01, intrinsics=None, window: int = 8,
                      overlap: int = 2) -> StreamedScene:
    """Reconstruct an arbitrarily long monocular video with a fixed-T
    engine. images01: (F, H, W, 3) float in [0, 1]; intrinsics (F, 3, 3)
    normalized (optional if the model predicts them)."""
    images01 = np.asarray(images01)
    F = images01.shape[0]
    starts = plan_windows(F, window, overlap)
    if overlap < 2 and len(starts) > 1:
        import warnings

        warnings.warn(
            "overlap=1 leaves zero shared relative translations, so "
            "per-window monocular scale cannot be aligned (scale factors "
            "stay 1.0 and the global metric may drift between windows); "
            "use overlap >= 2", stacklevel=2)
    sh_degree = engine.cfg.gaussian_adapter.sh_degree

    window_poses, window_scenes, window_intr = [], [], []
    for s in starts:
        K = None if intrinsics is None else \
            jnp.asarray(intrinsics[s:s + window])[None]
        scene = engine.reconstruct(jnp.asarray(
            images01[s:s + window])[None], K)
        window_scenes.append(scene)
        window_poses.append(np.asarray(scene.poses[0], np.float64))
        window_intr.append(
            None if scene.intrinsics is None
            else np.asarray(scene.intrinsics[0]))

    global_poses, scales, bases = chain_windows(window_poses, starts)

    frame_gaussians = [None] * F
    intr_out = None if window_intr[0] is None else np.zeros((F, 3, 3))
    for k, (s, scene) in enumerate(zip(starts, window_scenes)):
        first_new = 0 if k == 0 else (starts[k - 1] + window) - s
        g = jax.tree.map(lambda x: x[0], scene.gaussians)  # drop batch
        g_new = jax.tree.map(lambda x: x[first_new:], g)
        g_new = rebase_gaussians(
            g_new, jnp.asarray(bases[k], jnp.float32),
            jnp.float32(scales[k]), sh_degree=sh_degree)
        for j in range(first_new, window):
            frame_gaussians[s + j] = jax.tree.map(
                lambda x: x[j - first_new], g_new)
            if intr_out is not None:
                intr_out[s + j] = window_intr[k][j]
    gaussians = jax.tree.map(
        lambda *xs: jnp.stack(xs), *frame_gaussians)
    return StreamedScene(gaussians=gaussians, poses=global_poses,
                         intrinsics=intr_out, window_scales=scales)
