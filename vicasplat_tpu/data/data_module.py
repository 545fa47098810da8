"""Batching + async prefetch data module.

Parity target: reference src/dataset/data_module.py (per-dataset loaders,
seeded per-rank generators, validation wrapper). TPU-native shape: the input
pipeline lives in-process — a background thread batches numpy examples and
stages them ahead of the training loop; jax.device_put overlaps with compute.
"""
from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Iterator, Optional

import numpy as np

from ..utils.step_tracker import StepTracker
from .dataset_re10k import DatasetRE10k, DatasetRE10kConfig
from .dataset_scannet import DatasetScannet, DatasetScannetConfig
from .view_samplers import make_view_sampler


@dataclasses.dataclass(frozen=True)
class DataLoaderConfig:
    batch_size: int = 2
    seed: int = 1234
    prefetch: int = 2
    # parallel decode workers per dataset (the reference DataLoader's
    # num_workers, data_module.py:90-110). 0 = single-thread deterministic
    # iteration; >0 shards chunks across threads (PIL JPEG decode and
    # torch.load release the GIL, so threads scale without forking under
    # a live JAX runtime).
    num_workers: int = 0


def collate(examples: list[dict]) -> dict:
    """Stack a list of example dicts into batched numpy arrays."""
    def stack(key_path, items):
        first = items[0]
        if isinstance(first, dict):
            return {k: stack(key_path + (k,), [it[k] for it in items]) for k in first}
        if isinstance(first, str):
            return list(items)
        return np.stack(items)

    return stack((), examples)


class PrefetchIterator:
    """Collates batches from one or more example iterators on background
    threads. With several iterators (num_workers shards), each runs on its
    own thread feeding a shared example queue — decode parallelism — and one
    collator thread assembles batches ahead of the training loop."""

    def __init__(self, example_iters, batch_size: int,
                 prefetch: int = 2, drop_last: bool = True):
        if not isinstance(example_iters, (list, tuple)):
            example_iters = [example_iters]
        self.batch_size = batch_size
        self.drop_last = drop_last
        self._stop = threading.Event()
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        if len(example_iters) == 1:
            self._threads = [threading.Thread(
                target=self._single_worker, args=(example_iters[0],),
                daemon=True,
            )]
        else:
            self._ex_q: queue.Queue = queue.Queue(
                maxsize=max(2 * batch_size, 8)
            )
            self._threads = [
                threading.Thread(target=self._producer, args=(it,), daemon=True)
                for it in example_iters
            ]
            self._threads.append(threading.Thread(
                target=self._collator, args=(len(example_iters),), daemon=True
            ))
        for t in self._threads:
            t.start()

    def _put(self, q: queue.Queue, item) -> bool:
        """put() that aborts when the consumer closed the iterator — a
        producer blocked in put() at interpreter exit dies inside C
        extension code ('terminate called without an active exception')."""
        while not self._stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _single_worker(self, it):
        batch = []
        try:
            for ex in it:
                if self._stop.is_set():
                    return
                batch.append(ex)
                if len(batch) == self.batch_size:
                    if not self._put(self._q, collate(batch)):
                        return
                    batch = []
            if batch and not self.drop_last:
                self._put(self._q, collate(batch))
        except Exception as e:  # surface worker errors to the consumer
            self._put(self._q, e)
        self._put(self._q, None)

    def _producer(self, it):
        try:
            for ex in it:
                if not self._put(self._ex_q, ex):
                    return
        except Exception as e:
            self._put(self._ex_q, e)
        self._put(self._ex_q, StopIteration())

    def _collator(self, n_producers: int):
        batch = []
        done = 0
        try:
            while done < n_producers and not self._stop.is_set():
                try:
                    item = self._ex_q.get(timeout=0.2)
                except queue.Empty:
                    continue
                if isinstance(item, StopIteration):
                    done += 1
                    continue
                if isinstance(item, Exception):
                    raise item
                batch.append(item)
                if len(batch) == self.batch_size:
                    if not self._put(self._q, collate(batch)):
                        return
                    batch = []
            if batch and not self.drop_last:
                self._put(self._q, collate(batch))
        except Exception as e:
            self._put(self._q, e)
        self._put(self._q, None)

    def close(self):
        """Stop producer/collator threads (safe after partial iteration)."""
        self._stop.set()
        # drain so any thread blocked in put() sees the flag promptly
        for q in (self._q, getattr(self, "_ex_q", None)):
            if q is None:
                continue
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
        for t in self._threads:
            t.join(timeout=2.0)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        return item


DATASETS = {
    "re10k": (DatasetRE10k, DatasetRE10kConfig),
    "acid": (DatasetRE10k, DatasetRE10kConfig),
    "dl3dv": (DatasetRE10k, DatasetRE10kConfig),
    "scannetpp": (DatasetRE10k, DatasetRE10kConfig),
    "mvimgnet": (DatasetRE10k, DatasetRE10kConfig),
    "scannet": (DatasetScannet, DatasetScannetConfig),
    "scannet_pose": (DatasetScannet, DatasetScannetConfig),
}

from .synthetic_scenes import (  # noqa: E402
    DatasetSyntheticScenes,
    SyntheticScenesConfig,
)

DATASETS["synthetic"] = (DatasetSyntheticScenes, SyntheticScenesConfig)


def _build_dataset(ds_dict: dict, stage: str, step_tracker, seed: int):
    d = dict(ds_dict)
    sampler_cfg = d.pop("view_sampler", {"name": "bounded"})
    name = d.get("name", "re10k")
    cls, cfg_cls = DATASETS[name]
    fields = {f.name for f in dataclasses.fields(cfg_cls)}
    kwargs = {
        k: tuple(v) if isinstance(v, list) else v
        for k, v in d.items()
        if k in fields
    }
    cfg = cfg_cls(**kwargs)
    sampler = make_view_sampler(
        sampler_cfg, stage, step_tracker,
        is_overfitting=cfg.overfit_to_scene is not None,
        cameras_are_circular=cfg.cameras_are_circular,
    )
    return cls(cfg, stage, sampler, seed=seed)


class DataModule:
    """Builds per-stage prefetching loaders from the config's dataset dict
    (one or more named datasets; multiple datasets round-robin)."""

    def __init__(self, dataset_cfgs: dict, data_loader_cfg: dict,
                 step_tracker: Optional[StepTracker] = None,
                 global_rank: int = 0):
        self.dataset_cfgs = dataset_cfgs
        self.loader_cfg = data_loader_cfg or {}
        self.step_tracker = step_tracker
        self.global_rank = global_rank

    def _loader_params(self, stage: str, ds_name: str) -> DataLoaderConfig:
        section = self.loader_cfg.get(stage, {})
        if ds_name in section:  # per-dataset override
            section = section[ds_name]
        fields = {f.name for f in dataclasses.fields(DataLoaderConfig)}
        # strict schema: a typo'd key (e.g. batchsize) must raise, not
        # silently fall back to defaults — the train loop sizes its device
        # mesh from batch_size, so a silent default would stop sharding
        unknown = [k for k in section
                   if k not in fields and k not in self.dataset_cfgs]
        if unknown:
            raise ValueError(
                f"unknown data_loader.{stage} key(s) {unknown}; expected "
                f"one of {sorted(fields)} or per-dataset overrides "
                f"{sorted(self.dataset_cfgs)}"
            )
        return DataLoaderConfig(**{k: v for k, v in section.items() if k in fields})

    def train_batch_size(self) -> int:
        """Global train batch size from the typed loader config (the train
        loop shards this over the device mesh)."""
        return self._loader_params(
            "train", next(iter(self.dataset_cfgs), "")
        ).batch_size

    def loader(self, stage: str):
        lp = self._loader_params(stage, next(iter(self.dataset_cfgs), ""))
        nw = lp.num_workers if stage == "train" else 0
        iters = []
        for name, ds_dict in self.dataset_cfgs.items():
            dlp = self._loader_params(stage, name)
            seed = dlp.seed + self.global_rank  # per-rank seeding
            ds = _build_dataset(dict(ds_dict, name=ds_dict.get("name", name)),
                                stage, self.step_tracker, seed)
            if nw > 0 and hasattr(ds, "iter_shard"):
                # decode parallelism: each worker owns a chunk shard
                iters.extend(ds.iter_shard(w, nw) for w in range(nw))
            else:
                iters.append(iter(ds))

        if nw > 0:
            return PrefetchIterator(
                iters, batch_size=lp.batch_size, prefetch=lp.prefetch,
                drop_last=stage == "train",
            )

        def round_robin():
            live = list(iters)
            while live:
                for it in list(live):
                    try:
                        yield next(it)
                    except StopIteration:
                        live.remove(it)

        return PrefetchIterator(
            round_robin(), batch_size=lp.batch_size, prefetch=lp.prefetch,
            drop_last=stage == "train",
        )

    def train_dataloader(self):
        return self.loader("train")

    def val_dataloader(self, num_examples: int = 1):
        """Validation yields a handful of random examples per pass
        (the reference's ValidationWrapper, validation_wrapper.py)."""
        loader = self.loader("val")

        def limited():
            for i, batch in enumerate(loader):
                if i >= num_examples:
                    break
                yield batch

        return limited()

    def test_dataloader(self):
        return self.loader("test")
