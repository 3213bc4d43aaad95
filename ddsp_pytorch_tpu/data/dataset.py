"""Cached feature dataset + loaders.

Parity: reference ddsp/data.py — Dataset over four .npy arrays
(signals/pitchs/loudness/mfccs), a Lightning-style Datamodule facade, and a
dict collate.  Loading differs TPU-side: arrays are memory-mapped and batches
are assembled as contiguous numpy (pinned by jax.device_put in the trainer),
with a deterministic per-epoch shuffle keyed by (seed, epoch) so a resumed
run sees the exact same data order (SURVEY.md §5 failure-recovery plan).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Iterator, Optional

import numpy as np


class Dataset:
    """Feature cache produced by data/preprocess.py."""

    def __init__(self, out_dir):
        out_dir = Path(out_dir)
        self.signals = np.load(out_dir / "signals.npy", mmap_mode="r")
        self.pitchs = np.load(out_dir / "pitchs.npy", mmap_mode="r")
        self.loudness = np.load(out_dir / "loudness.npy", mmap_mode="r")
        mfcc_path = out_dir / "mfccs.npy"
        self.mfccs = (
            np.load(mfcc_path, mmap_mode="r") if mfcc_path.exists() else None
        )

    def __len__(self) -> int:
        return self.signals.shape[0]

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        item = {
            "sig": np.asarray(self.signals[idx], np.float32),
            "pitch": np.asarray(self.pitchs[idx], np.float32)[:, None],
            "loudness": np.asarray(self.loudness[idx], np.float32)[:, None],
        }
        if self.mfccs is not None:
            # one more frame than blocks (center-padded STFT); trim to F
            # frames like the reference Dataset (data.py:25)
            item["mfcc"] = np.asarray(self.mfccs[idx], np.float32)[:-1, :]
        return item


def dict_collate(records) -> Dict[str, np.ndarray]:
    """Stack a list of feature dicts into a dict of batched arrays."""
    return {k: np.stack([r[k] for r in records]) for k in records[0]}


class DataLoader:
    """Minimal deterministic batch loader.

    Shuffle order is a function of (seed, epoch): call `set_epoch(e)` before
    iterating epoch e (the Trainer does) — exact-resume safe.
    """

    def __init__(
        self,
        dataset: Dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
    ):
        """batch_size is the *per-shard* batch.  With num_shards > 1 (one
        shard per host in a multi-host run) every shard derives the same
        global order from (seed, epoch) and takes its interleaved slice, so
        the union of shards is exactly the single-host epoch."""
        assert 0 <= shard_index < num_shards
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _shard_order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(order)
        if self.num_shards > 1:
            # interleaved split of the shared global order; truncate to the
            # common length so shards stay in lockstep
            per = len(order) // self.num_shards
            order = order[self.shard_index :: self.num_shards][:per]
        return order

    def __len__(self) -> int:
        n = len(self._shard_order())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._shard_order()
        n = len(order)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, end, self.batch_size):
            idx = order[start : start + self.batch_size]
            yield dict_collate([self.dataset[int(i)] for i in idx])


class Datamodule:
    """Train/val loader pair from a Config (reference data.py:35-56)."""

    def __init__(self, config):
        self.config = config
        self.train_data: Optional[Dataset] = None
        self.val_data: Optional[Dataset] = None

    def setup(self) -> None:
        out_dir = Path(self.config.preprocess.out_dir)
        self.train_data = Dataset(out_dir / "train")
        self.val_data = Dataset(out_dir / "validation")

    def train_dataloader(self) -> DataLoader:
        # Multi-host: config.train.batch is the *global* batch; each host
        # loads its interleaved shard of it (jax.process_count()==1 on a
        # single host, preserving reference behavior).
        import jax

        nproc = jax.process_count()
        per_host = max(1, self.config.train.batch // nproc)
        return DataLoader(
            self.train_data,
            batch_size=per_host,
            shuffle=True,
            drop_last=True,
            seed=self.config.train.seed,
            num_shards=nproc,
            shard_index=jax.process_index(),
        )

    def val_dataloader(self) -> DataLoader:
        return DataLoader(
            self.val_data, batch_size=self.config.train.batch, shuffle=False
        )
