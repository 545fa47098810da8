"""Evaluation-index generator: pick context pairs within an epipolar-overlap
band + random target views, per scene, writing the frozen JSON index the
evaluation view sampler consumes.

Parity target: reference src/evaluation/evaluation_index_generator.py
(IndexEntry schema :30-34, search loop :49-160).
"""
from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.epipolar import view_overlap_fraction


@dataclasses.dataclass(frozen=True)
class IndexGeneratorConfig:
    num_target_views: int = 3
    min_distance: int = 45
    max_distance: int = 135
    min_overlap: float = 0.6
    max_overlap: float = 0.8
    output_path: str = "outputs/evaluation_index"
    seed: int = 0


@dataclasses.dataclass
class IndexEntry:
    context: tuple
    target: tuple
    overlap: Optional[float] = None


class EvaluationIndexGenerator:
    def __init__(self, cfg: IndexGeneratorConfig):
        self.cfg = cfg
        self.rng = np.random.default_rng(cfg.seed)
        self.index: dict = {}
        self._overlap_fn = jax.jit(view_overlap_fraction)

    def process_scene(self, scene: str, extrinsics: np.ndarray,
                      intrinsics: np.ndarray) -> Optional[IndexEntry]:
        """extrinsics (V,4,4) c2w, intrinsics (V,3,3). Returns chosen entry
        (also recorded in self.index; None entries mark unusable scenes)."""
        cfg = self.cfg
        v = extrinsics.shape[0]
        ext = jnp.asarray(extrinsics)
        K = jnp.asarray(intrinsics)

        for context_index in self.rng.permutation(v):
            valid = []
            for step in (1, -1):
                current = int(context_index) + step * cfg.min_distance
                while 0 <= current < v:
                    ov_a = float(self._overlap_fn(
                        ext[current], K[current], ext[context_index], K[context_index]
                    ))
                    ov_b = float(self._overlap_fn(
                        ext[context_index], K[context_index], ext[current], K[current]
                    ))
                    overlap = min(ov_a, ov_b)
                    delta = abs(current - int(context_index))
                    if cfg.min_overlap <= overlap <= cfg.max_overlap:
                        valid.append((current, overlap))
                    if overlap < cfg.min_overlap or delta > cfg.max_distance:
                        break
                    current += step
            if valid:
                chosen, overlap = valid[self.rng.integers(len(valid))]
                left, right = sorted((chosen, int(context_index)))
                if right - left < cfg.num_target_views:
                    continue
                target = self.rng.choice(
                    np.arange(left, right + 1), size=cfg.num_target_views,
                    replace=False,
                )
                entry = IndexEntry(
                    context=(left, right),
                    target=tuple(int(t) for t in np.sort(target)),
                    overlap=overlap,
                )
                self.index[scene] = entry
                return entry
        self.index[scene] = None
        return None

    def save(self):
        out = pathlib.Path(self.cfg.output_path)
        out.mkdir(exist_ok=True, parents=True)
        serial = {
            k: (None if v is None else dataclasses.asdict(v))
            for k, v in self.index.items()
        }
        with open(out / "evaluation_index.json", "w") as f:
            json.dump(serial, f, indent=2)
        return out / "evaluation_index.json"
