"""Train state + checkpoint/resume.

The reference checkpoints only ``model.state_dict()`` on best train loss
(train.py:149-158) — no optimizer state, no step counter, no resume path at
all (restart = retrain, SURVEY.md §5).  Here the checkpoint is the *full*
train state (params, optimizer state, step, PRNG key, loudness stats, best
loss), saved via Orbax (sharding-aware, works for pjit'd states) with
configurable retention, plus the reference-compatible best-loss artifact.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


def bulk_device_get(tree):
    """Host (numpy) copy of a device pytree in ONE jitted pack + one
    transfer per dtype.

    Through the axon tunnel, BOTH per-leaf transfers and per-op eager
    dispatches pay a large fixed round-trip cost, and the first completed
    device→host transfer drops the session into a ~100× slower degraded
    regime (BASELINE.md).  Orbax's leaf-wise save measured ~75 KB/s
    effective (a ~70 MB train state ≈ 16-minute segment tail); even eager
    ravel+concat packing stalled for minutes on dispatch latency alone
    (~2 000 ops × tunnel RPC).  So the pack is ONE jitted call (one
    dispatch, persistent-compilation-cacheable) producing one flat array
    per dtype, pulled largest-first so the big f32 payload rides the
    still-undegraded session.

    Single-process only (a multi-host state is not fully addressable);
    callers fall back to plain Orbax saves under jax.distributed.
    """
    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not any(isinstance(x, jax.Array) for x in leaves):
        return jax.device_get(tree)  # already host-side: no device trip

    by_dtype: dict = {}
    for i, x in enumerate(leaves):
        by_dtype.setdefault(jnp.asarray(x).dtype, []).append(i)

    def pack(ls):
        out = {}
        for dt, idxs in by_dtype.items():
            flats = [jnp.ravel(jnp.asarray(ls[i])) for i in idxs]
            out[str(dt)] = (
                jnp.concatenate(flats) if len(flats) > 1 else flats[0]
            )
        return out

    import time as _time

    _dbg = os.environ.get("DDSP_BULK_DEBUG")

    def _mark(label):
        if _dbg:
            print(f"[bulk_device_get +{_time.time() - _t0:7.1f}s] {label}",
                  flush=True)

    _t0 = _time.time()
    _mark(f"pack dispatch ({len(leaves)} leaves)")
    packed = jax.jit(pack)(leaves)
    _mark("pack returned (compiled)")
    # pull the LARGEST group first: it moves at the pre-degradation rate,
    # and the leftovers (an int32 optimizer count, a uint32 rng) are tiny
    order = sorted(by_dtype, key=lambda dt: -sum(
        int(np.prod(jnp.shape(leaves[i])) or 1) for i in by_dtype[dt]))
    host: list = [None] * len(leaves)
    for dt in order:
        buf = np.asarray(jax.device_get(packed[str(dt)]))
        _mark(f"pulled {buf.nbytes / 1e6:.1f} MB {dt}")
        off = 0
        for i in by_dtype[dt]:
            shape = jnp.shape(leaves[i])
            n = int(np.prod(shape)) if shape else 1
            host[i] = buf[off : off + n].reshape(shape)
            off += n
    return jax.tree_util.tree_unflatten(treedef, host)


def _all_leaves_single_device(tree) -> bool:
    """True when every jax.Array leaf lives wholly on one device (i.e. the
    state is unsharded — replicated-on-one-chip or host arrays)."""
    return all(
        len(x.sharding.device_set) == 1
        for x in jax.tree_util.tree_leaves(tree)
        if isinstance(x, jax.Array)
    )


@struct.dataclass
class TrainState:
    """Everything needed to resume training exactly."""

    step: jax.Array  # int32 scalar
    params: Any
    opt_state: Any
    rng: jax.Array  # PRNG key (threads the noise-synth randomness)
    mean_loudness: jax.Array  # dataset loudness stats — baked into export
    std_loudness: jax.Array


def create_train_state(
    model,
    sample_batch,
    tx: optax.GradientTransformation,
    seed: int = 0,
    mean_loudness: float = 0.0,
    std_loudness: float = 1.0,
) -> TrainState:
    """Initialize parameters from a sample batch and wrap the optimizer."""
    # old-style uint32 keys: checkpointable as plain arrays by any backend
    rng = jax.random.PRNGKey(seed)
    init_rng, noise_rng, state_rng = jax.random.split(rng, 3)
    variables = model.init(
        {"params": init_rng, "noise": noise_rng}, sample_batch
    )
    params = variables["params"]
    if isinstance(params, FrozenDict):
        params = params.unfreeze()
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=state_rng,
        mean_loudness=jnp.asarray(mean_loudness, jnp.float32),
        std_loudness=jnp.asarray(std_loudness, jnp.float32),
    )


class Checkpointer:
    """Orbax-backed full-train-state checkpointing with resume.

    Layout under ``run_dir``:
      checkpoints/<step>/   — Orbax StandardSave of the TrainState pytree
      best/                 — best-(train)-loss params only (the artifact
                              export consumes; role of reference state.pth)
      best/meta.json        — step + loss of the best snapshot
    """

    def __init__(self, run_dir: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.run_dir = os.path.abspath(run_dir)
        self.ckpt_dir = os.path.join(self.run_dir, "checkpoints")
        self.best_dir = os.path.join(self.run_dir, "best")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._best_ckptr = ocp.StandardCheckpointer()

    # ------------------------------------------------------------- full state
    def save(self, state: TrainState, wait: bool = False) -> None:
        if jax.process_count() == 1 and _all_leaves_single_device(state):
            # one bulk pull instead of Orbax's per-leaf transfers — see
            # bulk_device_get (tunnel-attached chips: 10-40× faster tail).
            # Restricted to unsharded states: for a single-process
            # multi-device pjit mesh the jitted pack would implicitly
            # all-gather sharded leaves onto one device (an OOM risk for
            # large states) and persist host numpy instead of the sharded
            # arrays — those states take the plain (sharding-aware) Orbax
            # path.
            state = bulk_device_get(state)
        step = int(state.step)
        self.manager.save(step, args=self._ocp.args.StandardSave(state))
        if wait:
            self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, abstract_state: TrainState) -> Optional[TrainState]:
        """Restore the newest checkpoint, or None if there is none.

        `abstract_state` provides the pytree structure/shardings (build it
        with `create_train_state` on a sample batch, or `jax.eval_shape`).
        """
        step = self.manager.latest_step()
        if step is None:
            return None
        return self.manager.restore(
            step, args=self._ocp.args.StandardRestore(abstract_state)
        )

    # ---------------------------------------------------------------- best
    def save_best(self, params, step: int, loss: float) -> None:
        """Save the best-loss params.  COLLECTIVE in a multi-process run:
        every process must call it (the Orbax save contains a global
        barrier); host-side file surgery runs on process 0 only."""
        import jax

        primary = jax.process_index() == 0
        path = os.path.join(self.best_dir, "params")
        if primary and os.path.exists(path):
            # Orbax refuses to overwrite; clear the previous snapshot first.
            import shutil

            shutil.rmtree(path)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("ddsp_save_best_rm")
        self._best_ckptr.save(path, params)
        self._best_ckptr.wait_until_finished()
        if primary:
            with open(os.path.join(self.best_dir, "meta.json"), "w") as f:
                json.dump({"step": step, "loss": loss}, f)

    def restore_best(self, abstract_params):
        path = os.path.join(self.best_dir, "params")
        return self._best_ckptr.restore(path, target=abstract_params)

    def best_meta(self) -> Optional[dict]:
        path = os.path.join(self.best_dir, "meta.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()
