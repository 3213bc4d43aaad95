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


class DeviceDataLoader:
    """Device-resident loader: uploads the whole feature cache to the
    accelerator once and assembles batches by on-device indexing.

    For DDSP-scale datasets (minutes of audio ≈ tens of MB) this removes the
    per-step host→device batch transfer entirely — on hosts with slow
    transport (or remote-tunneled chips) that transfer dominates the 0.5 ms
    train step.  Same deterministic (seed, epoch) order as DataLoader.
    """

    def __init__(
        self,
        dataset: Dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
    ):
        import jax
        import jax.numpy as jnp

        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self._n = len(dataset)
        # one upload per array; trailing feature axes added like __getitem__
        self._data = {
            "sig": jnp.asarray(np.asarray(dataset.signals, np.float32)),
            "pitch": jnp.asarray(np.asarray(dataset.pitchs, np.float32))[..., None],
            "loudness": jnp.asarray(np.asarray(dataset.loudness, np.float32))[
                ..., None
            ],
        }
        if dataset.mfccs is not None:
            self._data["mfcc"] = jnp.asarray(
                np.asarray(dataset.mfccs, np.float32)
            )[:, :-1, :]
        self._take = jax.jit(lambda data, idx: jax.tree.map(lambda a: a[idx], data))

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    @property
    def device_data(self) -> dict:
        """The device-resident dataset arrays (N, ...) — the cache the
        in-scan-gather multi step (make_train_multi_step_indexed) indexes
        inside its compiled scan."""
        return self._data

    def __len__(self) -> int:
        if self.drop_last:
            return self._n // self.batch_size
        return (self._n + self.batch_size - 1) // self.batch_size

    def index_batches(self):
        """Per-step index arrays (numpy) in EXACTLY __iter__'s order — the
        zero-dispatch iteration mode: the Trainer collects indices and
        materializes a whole (n_steps, batch, ...) super-batch with ONE
        device gather (take_stacked) instead of one dispatch per batch.
        Through a high-latency transport (this container's TPU tunnel has
        multi-ms — in degraded windows ~100 ms — per-dispatch RPCs) the
        per-batch dispatches dominate the step itself."""
        order = np.arange(self._n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(order)
        end = (
            (self._n // self.batch_size) * self.batch_size
            if self.drop_last
            else self._n
        )
        for start in range(0, end, self.batch_size):
            yield order[start : start + self.batch_size]

    def take(self, idx) -> dict:
        """One batch from index array (B,) — a single jitted gather."""
        import jax.numpy as jnp

        return self._take(self._data, jnp.asarray(idx))

    def take_stacked(self, idx2d) -> dict:
        """A (n_steps, B, ...) super-batch from indices (n_steps, B) —
        still a single jitted gather (the extra leading axis rides through
        the fancy-index)."""
        return self.take(idx2d)

    def loudness_stats(self) -> tuple:
        """(mean, std) exactly equal to ops.mean_std_loudness over this
        loader's batch sequence, in ≤2 device dispatches instead of one
        per batch: per-batch f32 means/stds are computed vectorized on
        device (grouped by batch length — the final partial batch is its
        own dispatch), then the estimator's host-float running mean runs
        over them in the original batch order, so the accumulated values
        are bit-identical to the streaming version's."""
        import jax
        import jax.numpy as jnp

        batches = list(self.index_batches())
        per_batch = [None] * len(batches)
        stats = jax.jit(
            lambda loud, idx: (
                jnp.mean(loud[idx], axis=(1, 2, 3)),
                jnp.std(loud[idx], axis=(1, 2, 3), ddof=1),
            )
        )
        for size in sorted({len(b) for b in batches}):
            group = [i for i, b in enumerate(batches) if len(b) == size]
            idx = jnp.asarray(np.stack([batches[i] for i in group]))
            means, stds = jax.device_get(stats(self._data["loudness"], idx))
            for j, i in enumerate(group):
                per_batch[i] = (float(means[j]), float(stds[j]))
        mean = std = 0.0
        for n, (m, s) in enumerate(per_batch, start=1):
            mean += (m - mean) / n
            std += (s - std) / n
        return mean, std

    def __iter__(self):
        for idx in self.index_batches():
            yield self.take(idx)


class Datamodule:
    """Train/val loader pair from a Config (reference data.py:35-56).

    device_cache=True swaps in DeviceDataLoader (whole cache uploaded once;
    single-host only — multi-host runs use the sharded host loaders).
    """

    def __init__(self, config, device_cache: bool = False):
        self.config = config
        self.device_cache = device_cache
        self.train_data: Optional[Dataset] = None
        self.val_data: Optional[Dataset] = None

    def setup(self) -> None:
        out_dir = Path(self.config.preprocess.out_dir)
        self.train_data = Dataset(out_dir / "train")
        self.val_data = Dataset(out_dir / "validation")

    def train_dataloader(self):
        # Multi-host: config.train.batch is the *global* batch; each host
        # loads its interleaved shard of it (jax.process_count()==1 on a
        # single host, preserving reference behavior).
        import jax

        nproc = jax.process_count()
        if self.device_cache and nproc == 1:
            return DeviceDataLoader(
                self.train_data,
                batch_size=self.config.train.batch,
                shuffle=True,
                drop_last=True,
                seed=self.config.train.seed,
            )
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
        # Multi-host: like the train loader, every process yields only its
        # interleaved shard of the global val batch and the Trainer
        # reassembles the global array (were every process to feed the FULL
        # batch as its "local" slice, each sample would be evaluated
        # process_count times).
        import jax

        nproc = jax.process_count()
        per_host = max(1, self.config.train.batch // nproc)
        return DataLoader(
            self.val_data,
            batch_size=per_host,
            shuffle=False,
            num_shards=nproc,
            shard_index=jax.process_index(),
        )
