"""Extra training coverage: autoencoder train step, LR schedule,
preemption-safe checkpointing."""

import os
import signal
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_pytorch_tpu.config import Config
from ddsp_pytorch_tpu.models import load_model
from ddsp_pytorch_tpu.training import create_train_state, make_train_step
from ddsp_pytorch_tpu.training.train import make_optimizer


def test_autoencoder_train_step_runs_and_learns(rng):
    """One jitted train step of the mfcc-autoencoder: finite loss, nonzero
    grads through the encoder."""
    cfg = Config.from_dict(
        {
            "preprocess": {"sample_rate": 16000, "signal_length": 2048,
                           "block_size": 64},
            "model": {
                "name": "mfcc-autoencoder",
                "kwargs": {
                    "hidden_size": 16,
                    "n_harmonic": 4,
                    "n_bands": 5,
                    "sample_rate": 16000,
                    "block_size": 64,
                    "has_reverb": False,
                    "use_pallas": "never",
                },
            },
            "train": {"scales": [256, 128], "overlap": 0.75, "batch": 2},
        }
    )
    model = load_model(cfg)
    f = cfg.n_frames
    batch = {
        "sig": jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32)),
        "pitch": jnp.asarray(rng.uniform(100, 300, (2, f, 1)).astype(np.float32)),
        "loudness": jnp.asarray(rng.standard_normal((2, f, 1)).astype(np.float32)),
        "mfcc": jnp.asarray(rng.standard_normal((2, f, 30)).astype(np.float32)),
    }
    tx = make_optimizer(cfg)
    state = create_train_state(model, batch, tx)
    step = jax.jit(make_train_step(model, tx, cfg))
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # encoder params must move (gradient flows through z)
    before = jax.tree.leaves(state.params["encoder"])
    after = jax.tree.leaves(new_state.params["encoder"])
    assert any(
        not np.allclose(a, b) for a, b in zip(before, after)
    ), "encoder got no gradient"


def test_nan_guard_skips_update(rng):
    """A batch that produces a non-finite loss must leave params unchanged
    (and flag update_skipped) instead of poisoning the run."""
    cfg = Config.from_dict(
        {
            "preprocess": {"sample_rate": 16000, "signal_length": 1024,
                           "block_size": 64},
            "model": {
                "name": "single-inst-decoder",
                "kwargs": {
                    "hidden_size": 8,
                    "n_harmonic": 2,
                    "n_bands": 3,
                    "sample_rate": 16000,
                    "block_size": 64,
                    "has_reverb": False,
                    "use_pallas": "never",
                },
            },
            "train": {"scales": [256], "overlap": 0.75},
        }
    )
    model = load_model(cfg)
    f = cfg.n_frames
    batch = {
        "sig": jnp.full((1, 1024), jnp.nan),  # poisoned target
        "pitch": jnp.full((1, f, 1), 200.0),
        "loudness": jnp.zeros((1, f, 1)),
    }
    tx = make_optimizer(cfg)
    state = create_train_state(model, batch, tx)
    step = jax.jit(make_train_step(model, tx, cfg))
    new_state, metrics = step(state, batch)
    assert int(metrics["update_skipped"]) == 1
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(a, b)
    assert int(new_state.step) == 1  # step still advances


def test_lr_schedule_wiring():
    """lr_stop enables the reference's (shipped-but-unused) linear decay."""
    import optax

    cfg = Config()
    cfg.train.lr = 1e-3
    cfg.train.lr_stop = 1e-5
    cfg.train.lr_decay_steps = 100
    tx = make_optimizer(cfg)
    params = {"w": jnp.zeros((3,))}
    opt_state = tx.init(params)
    g = {"w": jnp.ones((3,))}
    # step sizes shrink over the schedule
    u0, opt_state = tx.update(g, opt_state, params)
    for _ in range(99):
        u_last, opt_state = tx.update(g, opt_state, params)
    assert abs(float(u_last["w"][0])) < abs(float(u0["w"][0]))


@pytest.mark.slow
def test_preemption_checkpoint_and_resume(tmp_path):
    """SIGTERM mid-training → checkpoint written; second fit resumes and
    finishes the remaining steps."""
    from ddsp_pytorch_tpu.data import Datamodule, make_synthetic_dataset
    from ddsp_pytorch_tpu.training import Trainer

    cache = os.path.join(tmp_path, "cache")
    make_synthetic_dataset(
        cache, n_items=4, sample_rate=16000, signal_length=4096, block_size=128,
        n_harmonic=4,
    )
    cfg = Config.from_dict(
        {
            "preprocess": {
                "sample_rate": 16000,
                "signal_length": 4096,
                "block_size": 128,
                "out_dir": cache,
            },
            "model": {
                "name": "single-inst-decoder",
                "kwargs": {
                    "hidden_size": 16,
                    "n_harmonic": 4,
                    "n_bands": 5,
                    "sample_rate": 16000,
                    "block_size": 128,
                    "has_reverb": False,
                    "use_pallas": "never",
                },
            },
            "train": {"scales": [256], "batch": 2, "steps": 40,
                      "checkpoint_every_steps": 1000},
        }
    )
    run_dir = os.path.join(tmp_path, "run")
    dm = Datamodule(cfg)
    dm.setup()

    # fire SIGTERM shortly after training starts
    trainer = Trainer(cfg, run_dir, use_tensorboard=False)
    pid = os.getpid()
    timer = threading.Timer(8.0, lambda: os.kill(pid, signal.SIGTERM))
    timer.start()
    try:
        state = trainer.fit(dm)
    finally:
        timer.cancel()
        trainer.close()
    interrupted_step = int(state.step)
    assert interrupted_step < 40, "SIGTERM did not interrupt the run"

    trainer2 = Trainer(cfg, run_dir, use_tensorboard=False)
    try:
        state2 = trainer2.fit(dm)
    finally:
        trainer2.close()
    assert int(state2.step) >= 40


def test_multi_step_scan_matches_sequential_steps(rng):
    """make_train_multi_step(n) ≡ n sequential single steps (same rng
    stream, same data order) — params and per-step losses must agree."""
    from ddsp_pytorch_tpu.training import make_train_multi_step, make_train_step

    cfg = Config.from_dict(
        {
            "preprocess": {"sample_rate": 16000, "signal_length": 1024,
                           "block_size": 64},
            "model": {
                "name": "single-inst-decoder",
                "kwargs": {
                    "hidden_size": 8,
                    "n_harmonic": 2,
                    "n_bands": 3,
                    "sample_rate": 16000,
                    "block_size": 64,
                    "has_reverb": False,
                    "use_pallas": "never",
                },
            },
            "train": {"scales": [256], "overlap": 0.75},
        }
    )
    model = load_model(cfg)
    f = cfg.n_frames
    n, b = 4, 2
    batches = [
        {
            "sig": jnp.asarray(rng.standard_normal((b, 1024)).astype(np.float32)),
            "pitch": jnp.asarray(
                rng.uniform(100, 300, (b, f, 1)).astype(np.float32)
            ),
            "loudness": jnp.asarray(
                rng.standard_normal((b, f, 1)).astype(np.float32)
            ),
        }
        for _ in range(n)
    ]
    tx = make_optimizer(cfg)
    state0 = create_train_state(model, batches[0], tx)
    train_step = make_train_step(model, tx, cfg)

    # sequential reference
    single = jax.jit(train_step)
    state_seq = state0
    losses_seq = []
    for batch in batches:
        state_seq, m = single(state_seq, batch)
        losses_seq.append(float(m["loss"]))

    # one scanned dispatch
    multi = jax.jit(make_train_multi_step(train_step, n))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    state_multi, metrics = multi(state0, stacked)

    assert int(state_multi.step) == n
    np.testing.assert_allclose(
        np.asarray(metrics["loss"]), np.asarray(losses_seq), rtol=1e-5
    )
    for a, b_ in zip(
        jax.tree.leaves(jax.device_get(state_seq.params)),
        jax.tree.leaves(jax.device_get(state_multi.params)),
    ):
        np.testing.assert_allclose(a, b_, rtol=1e-5, atol=1e-6)


def test_steps_per_call_buffer_carries_across_epochs(tmp_path):
    """steps_per_call > steps_per_epoch: the super-batch buffer must fill
    across epoch boundaries so the scanned multi-step path actually runs
    (it previously drained to single steps at every epoch end), and the
    final partial buffer must still be trained."""
    from ddsp_pytorch_tpu.data import Datamodule, make_synthetic_dataset
    from ddsp_pytorch_tpu.training import Trainer

    cache = str(tmp_path / "cache")
    # 4 items @ batch 2 → 2 batches/epoch; steps_per_call 4 spans 2 epochs
    make_synthetic_dataset(
        cache, n_items=4, sample_rate=16000, signal_length=1024,
        block_size=64, n_harmonic=2,
    )
    cfg = Config.from_dict(
        {
            "preprocess": {"sample_rate": 16000, "signal_length": 1024,
                           "block_size": 64, "out_dir": cache},
            "model": {
                "name": "single-inst-decoder",
                "kwargs": {
                    "hidden_size": 8,
                    "n_harmonic": 2,
                    "n_bands": 3,
                    "sample_rate": 16000,
                    "block_size": 64,
                    "has_reverb": False,
                    "use_pallas": "never",
                },
            },
            # 10 steps: two full multi-calls (8) + a 2-batch leftover drain
            "train": {"scales": [256], "batch": 2, "steps": 10,
                      "steps_per_call": 4},
        }
    )
    dm = Datamodule(cfg)
    dm.setup()
    trainer = Trainer(cfg, str(tmp_path / "run"), use_tensorboard=False)
    multi_calls = []
    orig_multi = trainer._multi_step

    def spy(state, batches):
        multi_calls.append(1)
        return orig_multi(state, batches)

    trainer._multi_step = spy
    try:
        state = trainer.fit(dm)
    finally:
        trainer.close()
    assert int(state.step) >= 10
    assert len(multi_calls) >= 2, "scanned multi-step path never engaged"


@pytest.mark.slow
def test_hard_kill_checkpoint_resume(tmp_path):
    """Fault injection: SIGKILL a training subprocess mid-run (no signal
    handler can fire) and verify a fresh process resumes from the last
    atomic Orbax checkpoint and completes — the elastic-recovery property
    the reference lacks entirely (SURVEY.md §5 failure detection)."""
    import subprocess
    import sys
    import textwrap
    import time as _time

    cache = os.path.join(tmp_path, "cache")
    run_dir = os.path.join(tmp_path, "run")
    script = textwrap.dedent(
        f"""
        import jax; jax.config.update('jax_platforms', 'cpu')
        import os
        from ddsp_pytorch_tpu.config import Config
        from ddsp_pytorch_tpu.data import Datamodule, make_synthetic_dataset
        from ddsp_pytorch_tpu.training import Trainer
        cache, run_dir = {cache!r}, {run_dir!r}
        if not os.path.exists(cache):
            make_synthetic_dataset(cache, n_items=4, sample_rate=16000,
                                   signal_length=4096, block_size=128,
                                   n_harmonic=4)
        cfg = Config.from_dict({{
            'preprocess': {{'sample_rate': 16000, 'signal_length': 4096,
                            'block_size': 128, 'out_dir': cache}},
            'model': {{'name': 'single-inst-decoder', 'kwargs': {{
                'hidden_size': 16, 'n_harmonic': 4, 'n_bands': 5,
                'sample_rate': 16000, 'block_size': 128,
                'has_reverb': False, 'use_pallas': 'never'}}}},
            'train': {{'scales': [256], 'batch': 2, 'steps': 60,
                       'checkpoint_every_steps': 5}}}})
        dm = Datamodule(cfg); dm.setup()
        t = Trainer(cfg, run_dir, use_tensorboard=False)
        print('TRAINER_READY', flush=True)
        state = t.fit(dm); t.close()
        print('DONE', int(state.step), flush=True)
        """
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    # first run: kill -9 once training is underway (first checkpoint ~step 5)
    p = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "TRAINER_READY" in p.stdout.readline()
    deadline = _time.time() + 120
    while _time.time() < deadline:
        ckpts = (
            os.listdir(os.path.join(run_dir, "checkpoints"))
            if os.path.exists(os.path.join(run_dir, "checkpoints"))
            else []
        )
        if any(c.isdigit() and int(c) >= 5 for c in ckpts):
            break
        _time.sleep(0.2)
    p.kill()  # SIGKILL: no cleanup, no final checkpoint
    p.wait(timeout=30)
    assert p.returncode != 0, "process was supposed to die mid-run"

    # second run: must restore and reach the full step budget
    out = subprocess.run(
        [sys.executable, "-c", script],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=600,
    )
    assert out.returncode == 0, "resume run crashed"
    done = [l for l in out.stdout.splitlines() if l.startswith("DONE")]
    assert done and int(done[0].split()[1]) >= 60


def test_bulk_device_get_matches_device_get():
    """bulk_device_get (the one-transfer-per-dtype checkpoint pull for
    tunnel-attached chips) is bit-identical to leaf-wise jax.device_get
    over a mixed-dtype pytree including 0-d leaves."""
    from ddsp_pytorch_tpu.training.state import bulk_device_get

    tree = {
        "a": jnp.arange(7, dtype=jnp.int32),
        "b": jnp.linspace(0, 1, 12).reshape(3, 4),
        "c": {"d": jnp.asarray(2.5), "e": jnp.zeros((2,), jnp.uint32)},
        "s": jnp.asarray(5, jnp.int32),
    }
    host = bulk_device_get(tree)
    ref = jax.device_get(tree)
    flat_h = jax.tree_util.tree_flatten_with_path(host)[0]
    flat_r = jax.tree_util.tree_flatten_with_path(ref)[0]
    assert len(flat_h) == len(flat_r)
    for (ph, lh), (pr, lr) in zip(flat_h, flat_r):
        assert ph == pr
        assert lh.shape == lr.shape and lh.dtype == lr.dtype
        np.testing.assert_array_equal(lh, lr)


def test_checkpoint_save_uses_bulk_path_roundtrip(tmp_path):
    """Checkpointer.save (bulk host pull) -> restore roundtrips the full
    TrainState exactly."""
    import optax

    from ddsp_pytorch_tpu.training.state import Checkpointer, TrainState

    tx = optax.adam(1e-3)
    params = {"w": jnp.full((8, 8), 0.5), "b": jnp.zeros((8,))}
    st = TrainState(
        step=jnp.asarray(3, jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=jax.random.PRNGKey(7),
        mean_loudness=jnp.asarray(-2.0, jnp.float32),
        std_loudness=jnp.asarray(1.5, jnp.float32),
    )
    ck = Checkpointer(str(tmp_path))
    ck.save(st, wait=True)
    restored = ck.restore(st)
    assert int(restored.step) == 3
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.full((8, 8), 0.5))
    np.testing.assert_array_equal(np.asarray(restored.rng),
                                  np.asarray(st.rng))
    assert float(restored.std_loudness) == 1.5


def test_indexed_multi_step_matches_superbatch(tmp_path):
    """The in-scan-gather multi step (make_train_multi_step_indexed — only
    (n_steps, B) indices cross the dispatch boundary) produces the same
    per-step losses as n sequential single steps from the same init.
    Exercised directly (no loaders/epochs) so it is order-independent."""
    from ddsp_pytorch_tpu.data import make_synthetic_dataset
    from ddsp_pytorch_tpu.data.dataset import Dataset
    from ddsp_pytorch_tpu.training import Trainer

    cache = os.path.join(tmp_path, "cache")
    make_synthetic_dataset(cache, n_items=4)
    cfg = Config.from_dict({
        "preprocess": {"sample_rate": 16000, "signal_length": 16384,
                       "block_size": 256, "out_dir": cache},
        "model": {"name": "single-inst-decoder",
                  "kwargs": {"hidden_size": 32, "n_harmonic": 4,
                             "n_bands": 9, "sample_rate": 16000,
                             "block_size": 256, "has_reverb": False,
                             "use_pallas": "never"}},
        "train": {"scales": [512, 256], "batch": 2, "steps": 12,
                  "steps_per_call": 4},
    })
    trainer = Trainer(cfg, os.path.join(tmp_path, "run"),
                      use_tensorboard=False)
    assert trainer._multi_step_indexed is not None

    ds = Dataset(os.path.join(cache, "train"))
    cache_dev = {
        "sig": jnp.asarray(np.asarray(ds.signals, np.float32)),
        "pitch": jnp.asarray(np.asarray(ds.pitchs, np.float32))[..., None],
        "loudness": jnp.asarray(
            np.asarray(ds.loudness, np.float32))[..., None],
    }
    idx = np.asarray([[0, 1], [2, 3], [1, 2], [3, 0],
                      [2, 0], [1, 3], [0, 3], [2, 1],
                      [3, 1], [0, 2], [3, 2], [1, 0]], np.int32)
    batch0 = {k: v[jnp.asarray(idx[0])] for k, v in cache_dev.items()}

    # indexed scan path: 3 calls x 4 steps
    state = trainer.init_state(batch0)
    losses_scan = []
    for c in range(3):
        state, m = trainer._multi_step_indexed(
            state, cache_dev, jnp.asarray(idx[c * 4:(c + 1) * 4]))
        losses_scan.extend(np.asarray(m["loss"]).tolist())

    # sequential single steps from the same init
    state = trainer.init_state(batch0)
    losses_single = []
    for r in idx:
        state, m = trainer._train_step(
            state, {k: v[jnp.asarray(r)] for k, v in cache_dev.items()})
        losses_single.append(float(m["loss"]))

    assert len(losses_scan) == len(losses_single) == 12
    np.testing.assert_allclose(losses_scan, losses_single, rtol=2e-5)
