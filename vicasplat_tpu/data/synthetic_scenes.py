"""Synthetic multi-scene dataset with EXACT ground-truth poses.

The environment ships no RE10K chunks and no released checkpoints (zero
egress), so nothing in-env could exercise the pose-metric stack
(evaluation/pose_evaluator.py, reference src/evaluation/pose_evaluator.py:
34-245) with actual learning signal. This generator closes that gap:
procedurally-textured scenes — clustered anisotropic Gaussian geometry
with per-splat color jitter — rendered to video frames by our own
rasterizer along smooth random camera trajectories whose poses are known
exactly. Training a model across many such scenes and evaluating
`eval_pose` on held-out scenes yields a non-degenerate pose-AUC.

Example dicts match DatasetRE10k's contract (dataset_re10k.py:_process):
relative poses (frame-0-normalized), baseline-1 scaling, context/target
views chosen by the configured view sampler. Registered as dataset name
"synthetic" in data_module.DATASETS.
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class SyntheticScenesConfig:
    name: str = "synthetic"
    n_scenes: int = 64            # train split size
    n_val_scenes: int = 4
    n_test_scenes: int = 8        # held-out: never seen in training
    n_frames: int = 8             # frames rendered per scene
    input_image_shape: tuple = (64, 64)
    n_gaussians: int = 3072
    n_clusters: int = 24
    fov_deg: float = 60.0
    near: float = 0.05
    far: float = 100.0
    seed: int = 0
    # epochs over the scene list per __iter__ pass (train only)
    repeats: int = 1_000_000
    overfit_to_scene: Optional[str] = None
    cameras_are_circular: bool = False
    # x-reflection augmentation at train time (shims.reflect_views — the
    # reference's augmentation_shim): doubles effective scene diversity,
    # which is what pose generalization is starved for (the 64-scene run
    # memorized train trajectories exactly: trans err 0.27 deg train vs
    # 81 deg test — tools/diag_pose_train_vs_test.py)
    augment: bool = False
    # spatial-frequency multiplier for the procedural textures (backdrop
    # color waves + its height ripple). 1.0 = the original low-frequency
    # blobs; >1 adds high-frequency content so NVS PSNR has headroom to
    # discriminate (round-5 K-ablation, judge r4 weak #3). Changing it
    # changes the dataset — keep 1.0 for runs compared against committed
    # v5/v6 numbers.
    texture_detail: float = 1.0


def _look_at(eye: np.ndarray, center: np.ndarray, up: np.ndarray):
    """c2w with camera -z ... +z forward convention (OpenCV: +z forward,
    +y down) matching the rasterizer's projection."""
    f = center - eye
    f = f / np.linalg.norm(f)
    r = np.cross(f, up)
    r = r / np.linalg.norm(r)
    d = np.cross(f, r)  # down
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = r
    c2w[:3, 1] = d
    c2w[:3, 2] = f
    c2w[:3, 3] = eye
    return c2w


def scene_gaussians(rng: np.random.Generator, cfg: SyntheticScenesConfig):
    """Clustered, textured random geometry: `n_clusters` anisotropic blobs
    in the camera frustum plus a far backdrop plane (so every ray
    terminates — pure-background pixels carry no parallax signal)."""
    n, k = cfg.n_gaussians, cfg.n_clusters
    n_back = n // 4
    n_fg = n - n_back
    centers = np.stack([
        rng.uniform(-1.2, 1.2, k),
        rng.uniform(-0.9, 0.9, k),
        rng.uniform(1.8, 4.0, k),
    ], -1)
    sizes = rng.uniform(0.08, 0.35, (k, 3))
    palette = rng.uniform(-1.5, 1.5, (k, 3))
    idx = rng.integers(0, k, n_fg)
    means = centers[idx] + rng.normal(0, 1, (n_fg, 3)) * sizes[idx]
    # texture: per-splat color jitter on the cluster palette
    colors = palette[idx] + rng.normal(0, 0.45, (n_fg, 3))
    scales = np.exp(rng.normal(np.log(0.035), 0.4, (n_fg, 3)))
    # backdrop: a wall at z ~ 5.5 spanning the frustum
    bx = rng.uniform(-4.5, 4.5, n_back)
    by = rng.uniform(-3.5, 3.5, n_back)
    td = cfg.texture_detail
    bz = 5.5 + 0.2 * np.sin(3.0 * td * bx) * np.cos(2.0 * td * by)
    b_means = np.stack([bx, by, bz], -1)
    b_colors = np.stack([
        0.5 * np.sin(2.5 * td * bx) + 0.2 * np.cos(4.0 * td * by),
        0.5 * np.cos(1.7 * td * bx + 2.0 * td * by),
        0.4 * np.sin(3.3 * td * by),
    ], -1) + rng.normal(0, 0.25, (n_back, 3))
    b_scales = np.exp(rng.normal(np.log(0.12), 0.3, (n_back, 3)))

    means = np.concatenate([means, b_means]).astype(np.float32)
    colors = np.concatenate([colors, b_colors]).astype(np.float32)
    scales = np.concatenate([scales, b_scales]).astype(np.float32)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.55, 0.95, n).astype(np.float32)
    # SH degree 0: color = C0 * sh0 with C0 = 0.2820947917
    sh0 = (colors / 0.2820947917)[:, :, None]
    return {"means": means, "scales": scales, "rotations": quats,
            "harmonics": sh0.astype(np.float32), "opacities": opac}


def scene_trajectory(rng: np.random.Generator, cfg: SyntheticScenesConfig):
    """Smooth forward+lateral arc with look-at jitter. Returns c2w (T,4,4)
    float32 with meaningful (non-degenerate) rotation AND translation."""
    T = cfg.n_frames
    t = np.linspace(0.0, 1.0, T)
    base = np.array([0.0, 0.0, 0.0])
    dirv = np.array([rng.uniform(-0.8, 0.8),
                     rng.uniform(-0.4, 0.4),
                     rng.uniform(-0.35, 0.55)])
    wob_f = rng.uniform(1.5, 3.0, 2)
    wob_a = rng.uniform(0.03, 0.12, 2)
    eyes = base[None] + t[:, None] * dirv[None]
    eyes[:, 0] += wob_a[0] * np.sin(2 * np.pi * wob_f[0] * t)
    eyes[:, 1] += wob_a[1] * np.sin(2 * np.pi * wob_f[1] * t + 1.0)
    center0 = np.array([rng.uniform(-0.4, 0.4), rng.uniform(-0.3, 0.3),
                        rng.uniform(2.2, 3.2)])
    drift = np.array([rng.uniform(-0.5, 0.5), rng.uniform(-0.3, 0.3), 0.0])
    up = np.array([0.0, -1.0, 0.0])
    poses = np.stack([
        _look_at(eyes[i], center0 + t[i] * drift, up) for i in range(T)
    ])
    return poses.astype(np.float32)


def intrinsics_for(cfg: SyntheticScenesConfig) -> np.ndarray:
    f = 0.5 / np.tan(np.radians(cfg.fov_deg) / 2)
    return np.array([[f, 0, 0.5], [0, f, 0.5], [0, 0, 1]], np.float32)


_RENDER_JIT: dict = {}


def render_scene_frames(gauss: dict, poses: np.ndarray, K: np.ndarray,
                        image_shape: tuple) -> np.ndarray:
    """Golden frames from our own rasterizer, (T, H, W, 3) in [0, 1].

    The render is jitted once per (T, n, shape) — generating hundreds of
    scenes (the pose-generalization recipe needs O(512)) with an eager
    render would pay per-op dispatch overhead per scene (50-70 ms/dispatch
    on the axon tunnel)."""
    import jax
    import jax.numpy as jnp

    from ..models.adapter import build_covariance
    from ..ops.rasterize import RasterizeConfig, render

    T = poses.shape[0]
    n = gauss["means"].shape[0]
    key = (T, n, tuple(image_shape))
    if key not in _RENDER_JIT:
        cfg = RasterizeConfig(max_per_tile=256)

        def _render(means, scales, rotations, harmonics, opacities, poses, K):
            cov = build_covariance(scales, rotations)
            color, _, _ = render(
                means, cov, harmonics, opacities, poses,
                jnp.broadcast_to(K, (T, 3, 3)), tuple(image_shape),
                jnp.zeros(3), 0, cfg=cfg,
            )
            return jnp.clip(color, 0.0, 1.0)

        _RENDER_JIT[key] = jax.jit(_render)
    color = _RENDER_JIT[key](
        gauss["means"], gauss["scales"], gauss["rotations"],
        gauss["harmonics"], gauss["opacities"], poses, K,
    )
    return np.asarray(color)


def generate_scene(scene_id: int, cfg: SyntheticScenesConfig) -> dict:
    """Deterministic per-id scene: gaussians + GT cameras + rendered
    frames. Same id -> bit-identical scene across processes."""
    rng = np.random.default_rng(cfg.seed * 1_000_003 + scene_id)
    gauss = scene_gaussians(rng, cfg)
    poses = scene_trajectory(rng, cfg)
    K = intrinsics_for(cfg)
    images = render_scene_frames(gauss, poses, K, cfg.input_image_shape)
    return {"gaussians": gauss, "extrinsics": poses, "intrinsics": K,
            "images": images, "scene": f"synthetic_{scene_id:05d}"}


class DatasetSyntheticScenes:
    """Stage-split procedural scenes. Scene ids: train [0, n_scenes),
    val [n_scenes, +n_val), test [n_scenes+n_val, +n_test) — test scenes
    are NEVER iterated during training (held-out generalization)."""

    def __init__(self, cfg: SyntheticScenesConfig, stage: str, view_sampler,
                 seed: int = 0):
        self.cfg = cfg
        self.stage = stage
        self.view_sampler = view_sampler
        self.rng = np.random.default_rng(seed + 17)
        if stage == "train":
            self.ids = list(range(cfg.n_scenes))
        elif stage == "val":
            self.ids = list(range(cfg.n_scenes, cfg.n_scenes + cfg.n_val_scenes))
        else:
            s0 = cfg.n_scenes + cfg.n_val_scenes
            self.ids = list(range(s0, s0 + cfg.n_test_scenes))
        self._cache: dict = {}

    def _scene(self, sid: int) -> dict:
        if sid not in self._cache:
            self._cache[sid] = generate_scene(sid, self.cfg)
        return self._cache[sid]

    def _example(self, sid: int) -> Optional[dict]:
        from .view_samplers import NotEnoughFramesError

        sc = self._scene(sid)
        T = sc["images"].shape[0]
        try:
            ctx_idx, tgt_idx, _ = self.view_sampler.sample(
                sc["scene"], T, self.rng)
        except NotEnoughFramesError:
            return None
        extrinsics = sc["extrinsics"]
        # baseline-1 + frame-0-relative normalization (the training-time
        # camera convention, dataset_re10k.py:_process)
        a, b = extrinsics[ctx_idx[0], :3, 3], extrinsics[ctx_idx[-1], :3, 3]
        scale = float(np.linalg.norm(a - b))
        if scale < 1e-6:
            return None
        extrinsics = extrinsics.copy()
        extrinsics[:, :3, 3] /= scale
        rel = np.linalg.inv(extrinsics[ctx_idx[0]])[None] @ extrinsics
        K = sc["intrinsics"]

        def views(idx):
            idx = np.asarray(idx)
            return {
                "extrinsics": rel[idx].astype(np.float32),
                "intrinsics": np.broadcast_to(K, (len(idx), 3, 3)).astype(
                    np.float32),
                "image": sc["images"][idx].astype(np.float32),
                "near": np.full(len(idx), self.cfg.near / scale, np.float32),
                "far": np.full(len(idx), self.cfg.far / scale, np.float32),
                "index": idx.astype(np.int64),
            }

        example = {"context": views(ctx_idx), "target": views(tgt_idx),
                   "scene": sc["scene"]}
        if self.cfg.augment and self.stage == "train":
            from .shims import apply_augmentation_shim

            example = apply_augmentation_shim(example, self.rng)
        return example

    def __iter__(self) -> Iterator[dict]:
        reps = self.cfg.repeats if self.stage == "train" else 1
        for _ in range(reps):
            ids = list(self.ids)
            if self.stage == "train":
                self.rng.shuffle(ids)
            for sid in ids:
                ex = self._example(sid)
                if ex is not None:
                    yield ex
