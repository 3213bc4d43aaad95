"""Jitted/pjitted train step + Trainer loop.

Parity: reference train.py (epoch loop sized to reach `steps`, loudness
normalization per batch, multiscale spectral loss over target and
reconstruction, Adam, per-step loss scalar, validation every
VAL_INTERVAL epochs, best-train-loss checkpoint + media log every
LOG_INTERVAL epochs) — improved with full-state periodic checkpoints and
exact resume (SURVEY.md §5).

TPU-native structure: one `train_step(state, batch, rng)` pure function,
jit-compiled once with donated state; under a device mesh the same function
is pjit'd with the batch sharded over the 'data' axis and parameters
replicated — XLA inserts the psum gradient reduction (parallel/sharding.py).
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ddsp_pytorch_tpu.config import Config
from ddsp_pytorch_tpu.training.loss import spectral_loss_from_signals
from ddsp_pytorch_tpu.training.state import Checkpointer, TrainState, create_train_state


def make_optimizer(config: Config) -> optax.GradientTransformation:
    tc = config.train
    if tc.lr_stop is not None:
        # Linear decay lr → lr_stop over lr_decay_steps, then constant
        # (the schedule the reference defines at utils.py:5-14).
        decay_steps = tc.lr_decay_steps or tc.steps
        lr = optax.linear_schedule(tc.lr, tc.lr_stop, decay_steps)
    else:
        lr = tc.lr  # reference behavior: constant-LR Adam (train.py:62)
    if tc.optimizer == "sgd":
        tx = optax.sgd(lr)
    elif tc.optimizer == "adam":
        tx = optax.adam(lr)
    else:
        raise ValueError(f"unknown train.optimizer: {tc.optimizer!r}")
    if tc.grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(tc.grad_clip_norm), tx)
    return tx


def _as_jnp(x):
    """Identity on jax.Arrays: a dtype-matching jnp.asarray still costs a
    device dispatch (~80 us through a remote-TPU transport) — with the
    device-resident loader (data/dataset.py DeviceDataLoader) batches are
    already on device and must not pay it per key per step."""
    return x if isinstance(x, jax.Array) else jnp.asarray(x)


def _normalize_loudness(batch, mean, std):
    batch = dict(batch)
    batch["loudness"] = (batch["loudness"] - mean) / std
    return batch


def apply_gradient_update(
    state: TrainState,
    tx: optax.GradientTransformation,
    loss: jax.Array,
    grads,
    rng: jax.Array,
):
    """Optimizer update + NaN guard + metrics — the step half shared by the
    data-parallel step below and the time-sharded step
    (training/time_sharded.py), so both can never drift apart.

    NaN guard: a non-finite loss (bad batch, overflow) skips the update
    instead of poisoning the parameters — the step still advances so the
    data order stays deterministic.  The reference would silently corrupt
    the run (no guard anywhere).
    """
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)

    finite = jnp.isfinite(loss)
    params = jax.tree.map(
        lambda new, old: jnp.where(finite, new, old), params, state.params
    )
    opt_state = jax.tree.map(
        lambda new, old: jnp.where(finite, new, old),
        opt_state,
        state.opt_state,
    )

    new_state = state.replace(
        step=state.step + 1,
        params=params,
        opt_state=opt_state,
        rng=rng,
    )
    metrics = {
        "loss": loss,
        "grad_norm": optax.global_norm(grads),
        "update_skipped": jnp.logical_not(finite).astype(jnp.int32),
    }
    return new_state, metrics


def make_train_step(
    model, tx: optax.GradientTransformation, config: Config
) -> Callable:
    """Build the pure train-step function (uncompiled)."""
    scales = tuple(config.train.scales)
    overlap = config.train.overlap

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        rng, noise_rng = jax.random.split(state.rng)

        def loss_fn(params):
            model_batch = _normalize_loudness(
                batch, state.mean_loudness, state.std_loudness
            )
            out = model.apply(
                {"params": params}, model_batch, rngs={"noise": noise_rng}
            )
            loss, _, _ = spectral_loss_from_signals(
                batch["sig"], out["signal"], scales, overlap
            )
            return loss, out

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return apply_gradient_update(state, tx, loss, grads, rng)

    return train_step


def make_train_multi_step(
    train_step: Callable, n_steps: int, unroll: int = 1
) -> Callable:
    """Run `n_steps` optimizer steps in ONE compiled call via lax.scan.

    `batches` is the per-step batch pytree with an extra leading axis of
    length n_steps (e.g. sig (n, B, T)).  The scan body is exactly the
    single-step function, so the result is bit-identical to n_steps
    sequential calls; metrics come back stacked with shape (n_steps,).

    Why: at the reference workload one train step is ~0.5 ms of device time
    but each dispatch costs a host round-trip (BASELINE.md ablation — the
    step is dispatch-bound, the chip ~50x underutilized at batch 16).  One
    dispatch per n steps removes that wall.  No reference analogue (its loop
    is one eager step per Python iteration, train.py:122-146).
    """

    def multi_step(state: TrainState, batches):
        lead = jax.tree.leaves(batches)[0].shape[0]
        assert lead == n_steps, (
            f"super-batch has a leading axis of {lead}, expected "
            f"steps_per_call={n_steps}"
        )
        return jax.lax.scan(train_step, state, batches, unroll=unroll)

    return multi_step


def make_train_multi_step_indexed(
    train_step: Callable, n_steps: int, unroll: int = 1
):
    """`n_steps` optimizer steps in ONE compiled call, gathering each
    step's batch from the device-resident dataset cache INSIDE the scan.

    Same math as make_train_multi_step, but the (n_steps, B, ...)
    super-batch (1.2 GB at the reference workload with steps_per_call
    100) never exists as a client-visible buffer — only the (n_steps, B)
    int32 index array crosses the dispatch boundary and the per-step
    (B, ...) gather lives inside the compiled scan.  Through the axon
    tunnel the materialized variant's per-call GB-scale buffer churn left
    the remote session with MINUTES of server-side bookkeeping at the
    segment tail (round-4 measurement: the tail's first RPC after 1000
    such calls got no socket data for >10 min; with in-scan gathers the
    tail completes in seconds).
    """

    def multi_step(state: TrainState, cache, idx2d):
        assert idx2d.shape[0] == n_steps, (
            f"index array leading axis {idx2d.shape[0]} != "
            f"steps_per_call={n_steps}"
        )

        def body(st, idx):
            batch = jax.tree.map(lambda a: a[idx], cache)
            return train_step(st, batch)

        return jax.lax.scan(body, state, idx2d, unroll=unroll)

    return multi_step


def make_eval_step(model, config: Config) -> Callable:
    """Forward + loss + full output dict (for validation and reports)."""
    scales = tuple(config.train.scales)
    overlap = config.train.overlap

    def eval_step(state: TrainState, batch, noise_rng):
        model_batch = _normalize_loudness(
            batch, state.mean_loudness, state.std_loudness
        )
        out = model.apply(
            {"params": state.params}, model_batch, rngs={"noise": noise_rng}
        )
        loss, ori, rec = spectral_loss_from_signals(
            batch["sig"], out["signal"], scales, overlap
        )
        out.update({"loss": loss, "sig_stft": ori, "rec_stft": rec,
                    "sig": batch["sig"], "rec": out["signal"]})
        return out

    return eval_step


class Trainer:
    """Training driver with logging, validation, checkpoint and resume.

    Differences vs. the reference loop (train.py:122-164), on purpose:
      * full-train-state periodic checkpoints + `resume()` (reference has
        none — SURVEY.md §5);
      * best-loss selection still tracks mean *train* loss per epoch for
        parity, but val loss is also logged every val_interval.
    """

    def __init__(
        self,
        config: Config,
        run_dir: str,
        *,
        model=None,
        mesh=None,
        use_tensorboard: bool = True,
    ):
        from ddsp_pytorch_tpu.models import load_model
        from ddsp_pytorch_tpu.training.metrics import MetricsWriter

        self.config = config
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self.model = model if model is not None else load_model(config)
        self.tx = make_optimizer(config)
        self.mesh = mesh
        # Multi-host: all processes train (Orbax full-state saves are
        # collective), but host-side artifacts that are not — metrics,
        # best-params bundle, frozen config — are written by process 0 only
        # (every process holds the same replicated state).
        self._is_primary = jax.process_index() == 0
        self.metrics = MetricsWriter(
            run_dir, use_tensorboard=use_tensorboard, enabled=self._is_primary
        )
        self.checkpointer = Checkpointer(
            run_dir, max_to_keep=config.train.keep_checkpoints
        )

        eval_step = make_eval_step(self.model, config)
        self._spc = max(1, config.train.steps_per_call)
        self._unroll = max(1, config.train.scan_unroll)
        if self._spc % self._unroll:
            raise ValueError(
                f"train.scan_unroll={self._unroll} must divide "
                f"train.steps_per_call={self._spc}"
            )
        self._time_sharded = (
            mesh is not None and mesh.shape.get("time", 1) > 1
        )
        # in-scan-gather multi step: single-host unsharded runs only (the
        # mesh variants shard materialized super-batches)
        self._multi_step_indexed = None
        if self._time_sharded:
            # ('data','time') mesh: frame-rate NN data-parallel, sample-rate
            # DSP + loss sharded over 'time' with gradients through the
            # distributed collectives (training/time_sharded.py).
            from ddsp_pytorch_tpu.parallel.sharding import (
                shard_time_train_multi_step,
                shard_time_train_step,
            )
            from ddsp_pytorch_tpu.training.time_sharded import (
                make_time_sharded_train_step,
            )

            train_step = make_time_sharded_train_step(
                self.model, self.tx, config, mesh
            )
            self._train_step = shard_time_train_step(train_step, mesh)
            self._multi_step = (
                shard_time_train_multi_step(
                    make_train_multi_step(train_step, self._spc, self._unroll), mesh
                )
                if self._spc > 1
                else None
            )
            self._eval_step = jax.jit(eval_step)
        elif mesh is not None:
            from ddsp_pytorch_tpu.parallel.sharding import (
                shard_train_multi_step,
                shard_train_step,
            )

            train_step = make_train_step(self.model, self.tx, config)
            self._train_step = shard_train_step(train_step, mesh)
            self._multi_step = (
                shard_train_multi_step(
                    make_train_multi_step(train_step, self._spc, self._unroll), mesh
                )
                if self._spc > 1
                else None
            )
            self._eval_step = jax.jit(eval_step)
        else:
            train_step = make_train_step(self.model, self.tx, config)
            self._train_step = jax.jit(train_step, donate_argnums=(0,))
            # Built for spc == 1 as well: with a device-resident cache the
            # indexed scan-of-1 fuses the batch gather INTO the step — one
            # executed program per optimizer step instead of two (take +
            # step), which through the axon tunnel's ~0.2 s/program
            # overhead halves the honest per-step cost (round-5 ceiling
            # probe).  Bit-identical to the single-step path.
            self._multi_step = jax.jit(
                make_train_multi_step(train_step, self._spc, self._unroll),
                donate_argnums=(0,),
            )
            self._multi_step_indexed = jax.jit(
                make_train_multi_step_indexed(
                    train_step, self._spc, self._unroll
                ),
                donate_argnums=(0,),
            )
            self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------ state
    def init_state(self, sample_batch, mean_loudness=0.0, std_loudness=1.0):
        state = create_train_state(
            self.model,
            sample_batch,
            self.tx,
            seed=self.config.train.seed,
            mean_loudness=mean_loudness,
            std_loudness=std_loudness,
        )
        if self.mesh is not None:
            from ddsp_pytorch_tpu.parallel.sharding import replicate_state

            state = replicate_state(state, self.mesh)
        return state

    def resume_or_init(self, sample_batch, mean_loudness=0.0, std_loudness=1.0):
        """Restore the latest full checkpoint if present, else fresh init."""
        state = self.init_state(sample_batch, mean_loudness, std_loudness)
        restored = self.checkpointer.restore(state)
        if restored is not None:
            return restored, True
        return state, False

    def shard_batch(self, batch):
        if jax.process_count() == 1:
            batch = {k: _as_jnp(v) for k, v in batch.items()}
        # Multi-process: stay host-side — make_array_from_process_local_data
        # (parallel/sharding.py) consumes numpy directly; device-putting
        # here would force a device->host pull per key per step (ruinous
        # through this container's ~MB/s tunnel, CLAUDE.md).
        if self._time_sharded:
            from ddsp_pytorch_tpu.parallel.sharding import shard_time_batch

            return shard_time_batch(batch, self.mesh)
        if self.mesh is not None:
            from ddsp_pytorch_tpu.parallel.sharding import shard_batch

            batch = shard_batch(batch, self.mesh)
        return batch

    def _shard_eval_batch(self, batch):
        """Shard a batch for evaluation, tolerating a partial final batch
        (the val loader keeps drop_last=False).  A leading axis that does
        not divide the mesh 'data' axis is evaluated replicated instead —
        exact, just not data-parallel.  Multi-process meshes skip such
        batches (returns None): a consistent global assembly of unequal
        per-process remainders is not guaranteed."""
        if self.mesh is None:
            return {k: _as_jnp(v) for k, v in batch.items()}
        n = len(next(iter(batch.values())))
        nproc = jax.process_count()
        # Multi-process: `n` is this process's local shard of the global
        # batch (data/dataset.py val_dataloader) — check the GLOBAL size.
        if (n * nproc) % self.mesh.shape["data"] == 0:
            return self.shard_batch(batch)
        if nproc > 1:
            return None
        from ddsp_pytorch_tpu.parallel.sharding import replicated

        return jax.device_put(
            {k: _as_jnp(v) for k, v in batch.items()},
            replicated(self.mesh),
        )

    def place_superbatch(self, stacked):
        """Apply the mesh placement to an assembled (n_steps, batch, ...)
        super-batch."""
        if self._time_sharded:
            from ddsp_pytorch_tpu.parallel.sharding import shard_time_batch

            return shard_time_batch(stacked, self.mesh, lead=1)
        if self.mesh is not None:
            from ddsp_pytorch_tpu.parallel.sharding import shard_superbatch

            stacked = shard_superbatch(stacked, self.mesh)
        return stacked

    def stack_superbatch(self, batches):
        """Stack per-step batches into the (n_steps, batch, ...) super-batch."""
        multihost = self.mesh is not None and jax.process_count() > 1
        stack = np.stack if multihost else jnp.stack
        stacked = jax.tree.map(lambda *xs: stack(xs), *batches)
        return self.place_superbatch(stacked)

    # -------------------------------------------------------------- loops
    def fit(self, datamodule, total_steps: Optional[int] = None) -> TrainState:
        """Run training to total_steps (resumes from the latest checkpoint).

        Preemption-safe: SIGTERM/SIGINT set a flag; the loop checkpoints the
        full state and returns at the next step boundary, and `fit` again
        resumes exactly (the elastic-recovery story the reference lacks —
        SURVEY.md §5 failure detection).
        """
        import signal

        preempted = {"flag": False}

        def _on_signal(signum, frame):
            preempted["flag"] = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:  # not the main thread
                pass

        try:
            return self._fit(datamodule, total_steps, preempted)
        finally:
            for sig, handler in old_handlers.items():
                signal.signal(sig, handler)

    def _fit(self, datamodule, total_steps, preempted) -> TrainState:
        cfg = self.config
        # explicit None test: total_steps=0 is a valid "prime only" run —
        # compute/freeze loudness stats and save the step-0 checkpoint
        # without training (the stats-priming child of a --segment-steps
        # run; its pulls poison a throwaway process, not a training one)
        if total_steps is None:
            total_steps = cfg.train.steps
        train_loader = datamodule.train_dataloader()
        val_loader = datamodule.val_dataloader()

        mean_l, std_l = cfg.data.mean_loudness, cfg.data.std_loudness
        if mean_l is None or std_l is None:
            # A resumed run must REUSE the stats frozen at its start: the
            # stats are baked into the model's normalization (and exports),
            # so recomputing them mid-run — e.g. after the dataset grew —
            # would silently change the trained function.  (Also keeps
            # resumed/segmented runs free of the device pull on
            # tunnel-attached chips — BASELINE.md 'degraded windows'.)
            # …but ONLY when there is actually a checkpoint to resume from:
            # a fresh run reusing a stale run_dir (leftover config.yaml from
            # an earlier run against a since-regenerated dataset) must
            # recompute its stats, not inherit dead ones.
            frozen = os.path.join(self.run_dir, "config.yaml")
            if os.path.exists(frozen) and (
                self.checkpointer.latest_step() is not None
            ):
                try:
                    fcfg = Config.from_yaml(frozen)
                    mean_l = fcfg.data.mean_loudness
                    std_l = fcfg.data.std_loudness
                except Exception as e:
                    print(
                        f"[train] WARNING: could not reuse loudness stats "
                        f"from frozen {frozen} ({e!r}); recomputing."
                    )
                    mean_l = std_l = None
        if mean_l is None or std_l is None:
            from ddsp_pytorch_tpu.ops import mean_std_loudness

            stats_loader = train_loader
            if jax.process_count() > 1:
                # Multi-host: the train loader only yields this process's
                # interleaved shard; per-process stats would diverge and
                # each replica would normalize loudness differently (an
                # inconsistent global model).  Compute over the FULL
                # dataset, identically on every process.
                from ddsp_pytorch_tpu.data.dataset import DataLoader

                stats_loader = DataLoader(
                    train_loader.dataset, cfg.train.batch, shuffle=False
                )
            if hasattr(stats_loader, "loudness_stats"):
                # device-resident loader: ≤2 dispatches, bit-identical to
                # the streaming estimator (data/dataset.py loudness_stats)
                mean_l, std_l = stats_loader.loudness_stats()
            else:
                mean_l, std_l = mean_std_loudness(stats_loader)
        cfg.data.mean_loudness, cfg.data.std_loudness = mean_l, std_l

        # Freeze the (stat-enriched) config next to the run, like the
        # reference (train.py:59-60), so export can rebuild the model.
        if self._is_primary:
            cfg.to_yaml(os.path.join(self.run_dir, "config.yaml"))

        sample = next(iter(train_loader))
        state, resumed = self.resume_or_init(
            self.shard_batch(sample), mean_l, std_l
        )
        # The resume step comes from the checkpoint's on-disk step number,
        # NOT int(state.step): the restored step is a device scalar, and
        # pulling it would be this process's first device→host transfer —
        # which on tunnel-attached chips permanently degrades the session
        # ~130× before training even starts (BASELINE.md 'degraded
        # windows'; measured: segment train-window 4.9 steps/s with the
        # pull vs ~10³ without).
        start_step = (self.checkpointer.latest_step() or 0) if resumed else 0

        steps_per_epoch = len(train_loader)
        n_epochs = int(np.ceil(total_steps / max(1, steps_per_epoch)))
        best_loss = float("inf")
        meta = self.checkpointer.best_meta()
        if meta is not None:
            best_loss = meta.get("loss", best_loss)

        mean_loss, n_elem = 0.0, 0
        step = start_step
        t_last, s_last = time.time(), step
        t_fit_start = t_last  # train-window clock: dispatch start → drained
        start_epoch = start_step // max(1, steps_per_epoch)

        # Device-side metric buffer: scalars are fetched in one device_get
        # every metrics_flush_steps instead of per step — a per-step pull
        # stalls the dispatch pipeline (config.py TrainConfig note).
        # Entries are (first_step, metrics); multi-step calls buffer their
        # stacked (steps_per_call,) metric vectors as one entry.  Every
        # _FOLD entries the buffer is compacted ON DEVICE into one
        # concatenated vector per key: a 100k-step pull-free segment would
        # otherwise hold thousands of small leaves, and the tail's bulk
        # pack (state.py bulk_device_get) would hand the axon compiler a
        # ~2000-parameter HLO that takes minutes to compile server-side
        # (measured; no socket traffic the whole time).  Folding keeps the
        # tail pack at ~100 leaves, one cached fold executable per shape.
        pending = []
        folded = []  # (first_step, {key: (n,) device vector}) chunks
        _FOLD = 32
        flush_every = max(1, cfg.train.metrics_flush_steps)
        last_flush = step

        def fold_pending():
            if len(pending) < 2:
                return
            s0 = pending[0][0]
            keys = list(pending[0][1].keys())
            merged = {
                k: jnp.concatenate(
                    [jnp.ravel(jnp.asarray(m[k])) for _, m in pending]
                )
                for k in keys
            }
            folded.append((s0, merged))
            pending.clear()

        def flush_metrics():
            nonlocal mean_loss, n_elem, last_flush
            last_flush = step
            entries = folded + pending
            if not entries:
                return
            # one bulk transfer for the whole buffer (state.py
            # bulk_device_get): leaf-wise device_get pays one tunnel
            # round-trip EACH (measured: minutes per segment tail).
            # Multi-process runs use plain device_get — bulk_device_get's
            # jitted pack is single-process-only (state.py:39), and
            # per-step metrics are small and fully replicated there.
            if jax.process_count() == 1:
                from ddsp_pytorch_tpu.training.state import bulk_device_get

                fetched = bulk_device_get([m for _, m in entries])
            else:
                fetched = jax.device_get([m for _, m in entries])
            _consume_metrics(entries, fetched)

        def _consume_metrics(entries, fetched):
            nonlocal mean_loss, n_elem
            for (s0, _), m in zip(entries, fetched):
                losses = np.atleast_1d(np.asarray(m["loss"], np.float64))
                skipped = np.atleast_1d(np.asarray(m.get("update_skipped", 0)))
                for i, loss in enumerate(losses):
                    self.metrics.add_scalar("loss", float(loss), s0 + i)
                    if int(skipped[i]):
                        self.metrics.add_scalar("update_skipped", 1, s0 + i)
                    n_elem += 1
                    mean_loss += (float(loss) - mean_loss) / n_elem
            folded.clear()
            pending.clear()

        # Device-resident single-host loaders iterate as INDEX arrays and
        # materialize per dispatch: a super-batch is ONE device gather
        # (DeviceDataLoader.take_stacked) instead of steps_per_call _take
        # dispatches + a stack — through a high-latency tunnel the
        # per-batch dispatches otherwise dominate the whole call (measured:
        # ~3 s per 25-step call in a degraded window vs ~30 ms of compute).
        device_indexed = (
            hasattr(train_loader, "take_stacked") and jax.process_count() == 1
        )

        def materialize(b):
            return train_loader.take(b) if device_indexed else b

        def run_single(b):
            nonlocal state, step
            state, metrics = self._train_step(
                state, self.shard_batch(materialize(b))
            )
            step += 1
            pending.append((step, metrics))
            if len(pending) >= _FOLD:
                fold_pending()

        def run_multi(bs):
            nonlocal state, step
            if device_indexed and self._multi_step_indexed is not None:
                # in-scan gather: only the (n_steps, B) indices cross the
                # dispatch boundary (make_train_multi_step_indexed)
                state, metrics = self._multi_step_indexed(
                    state, train_loader.device_data,
                    jnp.asarray(np.stack(bs), jnp.int32),
                )
                step += self._spc
                pending.append((step - self._spc + 1, metrics))
                if len(pending) >= _FOLD:
                    fold_pending()
                return
            if device_indexed:
                superbatch = self.place_superbatch(
                    train_loader.take_stacked(np.stack(bs))
                )
            else:
                superbatch = self.stack_superbatch(bs)
            state, metrics = self._multi_step(state, superbatch)
            step += self._spc
            pending.append((step - self._spc + 1, metrics))
            if len(pending) >= _FOLD:
                fold_pending()

        def housekeeping(prev_step) -> bool:
            """Flush/checkpoint/throughput bookkeeping; True = stop now."""
            nonlocal t_last, s_last
            if step - last_flush >= flush_every:
                flush_metrics()
            if preempted["flag"]:
                flush_metrics()
                self.checkpointer.save(state, wait=True)
                return True
            every = cfg.train.checkpoint_every_steps
            if every > 0 and step // every > prev_step // every:
                # NB: a mid-run save pulls the full state device→host; on
                # tunnel-attached chips prefer 0 (= final save only, the
                # segment boundary IS the checkpoint cadence)
                self.checkpointer.save(state)
            if step - s_last >= 100:
                now = time.time()
                sps = (step - s_last) / max(now - t_last, 1e-9)
                self.metrics.add_scalar("steps_per_s", sps, step)
                t_last, s_last = now, step
            return step >= total_steps

        buf = []  # batches awaiting a full steps_per_call super-batch
        for epoch in range(start_epoch, n_epochs):
            train_loader.set_epoch(epoch)
            # A mid-epoch resume (preemption checkpoints at arbitrary
            # steps) must not replay batches already trained: skip the
            # first start_step % steps_per_epoch batches of the resumed
            # epoch so the step→batch mapping matches an uninterrupted
            # run (dataset order is deterministic per epoch).
            skip = (
                start_step % max(1, steps_per_epoch)
                if epoch == start_epoch
                else 0
            )
            stop = False
            source = (
                train_loader.index_batches() if device_indexed
                else train_loader
            )
            for batch_index, batch in enumerate(source):
                if batch_index < skip:
                    continue
                prev_step = step
                # spc == 1 pays off ONLY through the fused in-scan gather
                # (one program per step, device-cache loaders); for host
                # loaders the stack+scan-of-1 would dispatch MORE programs
                # (3 stacks + 1 scan) than the plain jitted step — fall
                # back to run_single there.
                spc1_fused = (
                    device_indexed and self._multi_step_indexed is not None
                )
                use_multi = (
                    self._multi_step is not None
                    and (self._spc > 1 or spc1_fused)
                    and step + self._spc <= total_steps
                    and not preempted["flag"]
                )
                if use_multi:
                    # buffer HOST batches: stack_superbatch shards the
                    # stacked result in one placement (stacking already-
                    # sharded global arrays would need a host pull, which
                    # fails outright for multi-host arrays)
                    buf.append(batch)
                    if len(buf) < self._spc:
                        continue
                    run_multi(buf)
                    buf.clear()
                else:
                    for b in buf:  # mode switch: drain in order first
                        run_single(b)
                    buf.clear()
                    run_single(batch)
                stop = housekeeping(prev_step)
                if stop:
                    break
            # NOTE: buf deliberately carries across epoch boundaries — with
            # steps_per_call > steps_per_epoch the super-batch fills over
            # several epochs instead of degenerating to single steps (the
            # dispatch amortization would otherwise never engage).  Epoch
            # validation/media may therefore lag the data stream by up to
            # steps_per_call-1 not-yet-dispatched batches.
            if stop and preempted["flag"]:
                return state
            # epoch-end flush respects the flush interval: each device_get
            # stalls the dispatch pipeline (and on tunnel-attached chips
            # permanently degrades the process — BASELINE.md); nothing is
            # lost, the buffer drains at the next interval or at fit end
            if step - last_flush >= flush_every:
                flush_metrics()

            # interval 0 disables validation/media entirely: both pull
            # device data, and on tunnel-attached chips the FIRST pull
            # permanently degrades the process ~130× (BASELINE.md
            # 'degraded windows') — a sustained-throughput segment must
            # stay pull-free until its tail.
            if (
                cfg.train.val_interval_epochs > 0
                and epoch % cfg.train.val_interval_epochs == 0
            ):
                self._run_validation(state, val_loader, step)

            if (
                cfg.train.log_interval_epochs > 0
                and epoch % cfg.train.log_interval_epochs == 0
            ):
                # a log epoch pulls device data anyway (_log_media), so
                # drain pending metrics first — the per-epoch best-loss
                # mean must include this epoch's steps even when
                # metrics_flush_steps is large
                flush_metrics()
                if n_elem > 0 and mean_loss < best_loss:
                    best_loss = mean_loss
                    # save_best is COLLECTIVE (Orbax barrier inside): every
                    # process calls it.  The mean_loss < best_loss decision
                    # is identical everywhere — it is host float math over
                    # the replicated per-step losses.
                    from ddsp_pytorch_tpu.training.state import (
                        _all_leaves_single_device,
                        bulk_device_get,
                    )

                    self.checkpointer.save_best(
                        bulk_device_get(state.params)
                        if jax.process_count() == 1
                        and _all_leaves_single_device(state.params)
                        else jax.device_get(state.params),
                        step, mean_loss,
                    )
                mean_loss, n_elem = 0.0, 0
                self._log_media(state, sample, step, stage="train")

            if step >= total_steps:
                break

        if buf and not preempted["flag"] and step < total_steps:
            # final partial super-batch: the epoch budget is exhausted, so
            # drain the leftovers as single steps
            prev_step = step
            for b in buf:
                run_single(b)
                if step >= total_steps:
                    break
            buf.clear()
            housekeeping(prev_step)

        if step > start_step:
            # Honest sustained-throughput measurement for this process:
            # block until the dispatch queue drains (a host-side WAIT on
            # device arrays — no transfer, so it does not trigger the
            # tunnel degradation), THEN stamp the window.  Everything
            # after this line (metric flush, checkpoint save) is the
            # process tail and is excluded by construction.
            jax.block_until_ready(state.step)
            window = time.time() - t_fit_start
            self.metrics.add_scalar("train_window_s", window, step)
            self.metrics.add_scalar(
                "train_window_steps_per_s",
                (step - start_step) / max(window, 1e-9),
                step,
            )
        # ONE device→host transfer for the whole tail: through the axon
        # tunnel the FIRST pull of a process runs at the tunnel's full
        # rate, and every later transfer in the now-degraded session
        # crawls (~75-300 KB/s measured — a 70 MB state = 4-16 minutes).
        # Packing the pending metric vectors AND the train state into one
        # bulk pull makes the degraded regime start only after everything
        # is already on the host.
        if jax.process_count() == 1:
            from ddsp_pytorch_tpu.training.state import (
                _all_leaves_single_device,
                bulk_device_get,
            )

            t_tail = time.time()
            entries = folded + pending
            if _all_leaves_single_device(state):
                pulled = bulk_device_get(
                    {"metrics": [m for _, m in entries], "state": state}
                )
                fetched, save_state = pulled["metrics"], pulled["state"]
            else:
                # single-process pjit mesh: the jitted pack would
                # implicitly gather sharded leaves onto one device and
                # persist host numpy instead of sharded arrays — same
                # guard as Checkpointer.save (state.py).  Metrics are
                # small replicated scalars; the state takes the plain
                # sharding-aware Orbax path.
                fetched = bulk_device_get([m for _, m in entries])
                save_state = state
            self.metrics.add_scalar("tail_pull_s", time.time() - t_tail,
                                    step)
            _consume_metrics(entries, fetched)
            t_save = time.time()
            self.checkpointer.save(save_state, wait=True)
            self.metrics.add_scalar("tail_save_s", time.time() - t_save,
                                    step)
        else:
            flush_metrics()
            self.checkpointer.save(state, wait=True)
        return state

    def _run_validation(self, state, val_loader, step: int) -> None:
        losses = []
        last_out = None
        rng = jax.random.PRNGKey(0)
        for batch in val_loader:
            b = self._shard_eval_batch(batch)
            if b is None:  # multi-process partial remainder (see helper)
                continue
            out = self._eval_step(state, b, rng)
            losses.append(float(out["loss"]))
            last_out = out
        if losses:
            self.metrics.add_scalar("loss/val", float(np.mean(losses)), step)
        if last_out is not None and jax.process_count() == 1:
            # media fetches pull batch-sharded arrays to the host; on a
            # multi-host mesh those are only partially addressable — the
            # scalar val loss above is the multi-host observable
            self._report(last_out, step, stage="val")

    def _log_media(self, state, sample_batch, step: int, stage: str) -> None:
        out = self._eval_step(state, self.shard_batch(sample_batch),
                              jax.random.PRNGKey(1))
        self.metrics.add_scalar(f"loss/{stage}", float(out["loss"]), step)
        params = state.params
        if "reverb" in params:
            self.metrics.add_scalar("reverb_decay", float(params["reverb"]["decay"]), step)
            self.metrics.add_scalar("reverb_wet", float(params["reverb"]["wet"]), step)
        if jax.process_count() == 1:  # see _run_validation
            self._report(out, step, stage)

    def _report(self, out, step: int, stage: str) -> None:
        sr = self.config.preprocess.sample_rate
        self.metrics.add_audio(f"sig/{stage}", jax.device_get(out["sig"][0]), step, sr)
        self.metrics.add_audio(f"rec/{stage}", jax.device_get(out["rec"][0]), step, sr)
        try:
            from ddsp_pytorch_tpu.training.reports import reconstruction_report

            fig = reconstruction_report(out, self.config)
            self.metrics.add_figure(f"reconstruction/{stage}", fig, step)
            import matplotlib.pyplot as plt

            plt.close(fig)
        except Exception:
            pass  # diagnostics must never kill training

    def close(self):
        self.metrics.close()
        self.checkpointer.close()
