"""Sharding specs for the train step (data parallelism via pjit).

Parameters and optimizer state are replicated (the model is ~6 M params —
SURVEY.md §2.7 concludes TP is unnecessary); batches shard over 'data'.
jit with these shardings makes XLA insert the gradient psum over ICI — the
TPU-native replacement for the DDP/NCCL layer the reference lacks.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Leading axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicate_state(state: Any, mesh: Mesh) -> Any:
    return jax.device_put(state, replicated(mesh))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a batch with its leading axis over 'data'.

    Single-host: one device_put.  Multi-host: each process holds only its
    local slice of the global batch (data/dataset.py interleaved shards), so
    the global array is assembled with make_array_from_process_local_data.
    """
    sharding = data_sharded(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    import numpy as np

    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )


def superbatch_sharded(mesh: Mesh) -> NamedSharding:
    """Stacked multi-step batches: (n_steps, batch, ...) — axis 1 over 'data'."""
    return NamedSharding(mesh, P(None, "data"))


def shard_superbatch(batch: Any, mesh: Mesh) -> Any:
    """Place a stacked (n_steps, batch, ...) super-batch, axis 1 over 'data'."""
    sharding = superbatch_sharded(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    import numpy as np

    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


def shard_train_multi_step(multi_step: Callable, mesh: Mesh) -> Callable:
    """pjit the scanned multi-step: state replicated+donated, super-batch
    data-sharded on axis 1; metrics (stacked per-substep scalars) replicated."""
    return jax.jit(
        multi_step,
        in_shardings=(replicated(mesh), superbatch_sharded(mesh)),
        out_shardings=(replicated(mesh), replicated(mesh)),
        donate_argnums=(0,),
    )


def shard_train_step(train_step: Callable, mesh: Mesh) -> Callable:
    """pjit the train step: state replicated+donated, batch data-sharded."""
    return jax.jit(
        train_step,
        in_shardings=(replicated(mesh), data_sharded(mesh)),
        out_shardings=(replicated(mesh), replicated(mesh)),
        donate_argnums=(0,),
    )


# ------------------------------------------------ ('data','time') training

def _time_batch_spec(key: str, lead: int = 0) -> P:
    """PartitionSpec for one batch entry under time-sharded training.

    Audio ('sig') shards samples over 'time'; frame-rate controls (pitch /
    loudness / mfcc) stay whole per data shard — the GRU scan needs all
    frames (training/time_sharded.py) and the DSP stage reshards them
    internally via its shard_map in_specs.  `lead` prepends unsharded axes
    (1 for the (n_steps, ...) super-batch).
    """
    head = (None,) * lead
    if key == "sig":
        return P(*head, "data", "time")
    return P(*head, "data")


def time_batch_sharding(batch: Any, mesh: Mesh, lead: int = 0) -> Any:
    return {
        k: NamedSharding(mesh, _time_batch_spec(k, lead)) for k in batch
    }


def shard_time_batch(batch: Any, mesh: Mesh, lead: int = 0) -> Any:
    """Place a batch for the time-sharded train step: sig over
    ('data','time'), frame-rate controls over 'data' only."""
    shardings = time_batch_sharding(batch, mesh, lead)
    if jax.process_count() == 1:
        return {
            k: jax.device_put(v, shardings[k]) for k, v in batch.items()
        }
    import numpy as np

    return {
        k: jax.make_array_from_process_local_data(shardings[k], np.asarray(v))
        for k, v in batch.items()
    }


def _shard_time_step(step: Callable, mesh: Mesh, lead: int) -> Callable:
    """jit `step` with time-sharded batch shardings, cached per key set
    (state replicated+donated; batch via time_batch_sharding with `lead`
    unsharded leading axes)."""
    _cache = {}

    def jitted(state, batch):
        key = tuple(sorted(batch))
        fn = _cache.get(key)
        if fn is None:
            fn = jax.jit(
                step,
                in_shardings=(
                    replicated(mesh),
                    time_batch_sharding(batch, mesh, lead),
                ),
                out_shardings=(replicated(mesh), replicated(mesh)),
                donate_argnums=(0,),
            )
            _cache[key] = fn
        return fn(state, batch)

    return jitted


def shard_time_train_step(train_step: Callable, mesh: Mesh) -> Callable:
    """pjit the time-sharded train step (training/time_sharded.py): state
    replicated+donated, sig over ('data','time'), controls over 'data'."""
    return _shard_time_step(train_step, mesh, lead=0)


def shard_time_train_multi_step(multi_step: Callable, mesh: Mesh) -> Callable:
    """pjit the scanned time-sharded multi-step: super-batch axis 0 whole,
    sig over (None,'data','time'), controls over (None,'data')."""
    return _shard_time_step(multi_step, mesh, lead=1)
