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
