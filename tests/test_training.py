"""Training-layer tests: loss parity, overfit convergence, checkpoint/resume.

The overfit test is the reference's only implicit quality bar made explicit
(SURVEY.md §4 integration recommendation #3).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ddsp_pytorch_tpu.config import Config
from ddsp_pytorch_tpu.training.loss import (
    multiscale_spec_loss,
    spectral_loss_from_signals,
)


def test_multiscale_loss_matches_torch_pipeline(rng):
    """Full loss (stft → lin+log L1) against a torch re-statement of the
    reference formulas (train.py:70-76 + core.py:27-41)."""
    t = 4096
    scales, overlap = [512, 256], 0.75
    x = rng.standard_normal((2, t)).astype(np.float32)
    y = rng.standard_normal((2, t)).astype(np.float32)

    got, _, _ = spectral_loss_from_signals(
        jnp.asarray(x), jnp.asarray(y), scales, overlap
    )

    def torch_stfts(sig):
        out = []
        for s in scales:
            S = torch.stft(
                torch.tensor(sig), s, int(s * (1 - overlap)), s,
                torch.hann_window(s), True, normalized=True, return_complex=True,
            ).abs()
            out.append(S)
        return out

    want = 0.0
    for sx, sy in zip(torch_stfts(x), torch_stfts(y)):
        want += (sx - sy).abs().mean() + (
            (sx + 1e-7).log() - (sy + 1e-7).log()
        ).abs().mean()
    np.testing.assert_allclose(float(got), float(want), rtol=1e-3)


def test_loss_zero_for_identical_signals(rng):
    x = jnp.asarray(rng.standard_normal((1, 2048)).astype(np.float32))
    loss, _, _ = spectral_loss_from_signals(x, x, [256], 0.75)
    assert float(loss) == 0.0


def _tiny_setup(tmp_path, steps=30, has_reverb=False):
    from ddsp_pytorch_tpu.data import Datamodule, make_synthetic_dataset

    cache = os.path.join(tmp_path, "cache")
    make_synthetic_dataset(
        cache, n_items=4, sample_rate=16000, signal_length=8192, block_size=256,
        n_harmonic=8,
    )
    cfg = Config.from_dict(
        {
            "preprocess": {
                "sample_rate": 16000,
                "signal_length": 8192,
                "block_size": 256,
                "out_dir": cache,
            },
            "model": {
                "name": "single-inst-decoder",
                "kwargs": {
                    "hidden_size": 64,
                    "n_harmonic": 8,
                    "n_bands": 17,
                    "sample_rate": 16000,
                    "block_size": 256,
                    "has_reverb": has_reverb,
                    "use_pallas": "never",
                },
            },
            "train": {
                "scales": [512, 256],
                "overlap": 0.75,
                "batch": 2,
                "lr": 1e-3,
                "steps": steps,
                "checkpoint_every_steps": 10,
                "val_interval_epochs": 5,
            },
        }
    )
    dm = Datamodule(cfg)
    dm.setup()
    return cfg, dm


@pytest.mark.slow
def test_training_reduces_loss(tmp_path):
    """End-to-end slice: synthetic tones → jitted train loop → loss drops."""
    from ddsp_pytorch_tpu.training import Trainer

    cfg, dm = _tiny_setup(tmp_path, steps=120)
    cfg.train.lr = 2e-3
    trainer = Trainer(cfg, os.path.join(tmp_path, "run"), use_tensorboard=False)
    try:
        trainer.fit(dm)
    finally:
        trainer.close()

    import json

    losses = []
    with open(os.path.join(tmp_path, "run", "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"] == "loss":
                losses.append(rec["value"])
    assert len(losses) >= 120
    early = np.mean(losses[:5])
    late = np.mean(losses[-5:])
    assert late < early * 0.82, f"loss did not drop: {early:.3f} → {late:.3f}"


@pytest.mark.slow
def test_checkpoint_resume_exact(tmp_path):
    """Full-state resume: run A (20 steps straight) == run B (10 + resume 10)
    — parameters must match exactly (deterministic data order + saved rng)."""
    from ddsp_pytorch_tpu.training import Trainer

    cfg, dm = _tiny_setup(tmp_path, steps=20)
    cfg.train.checkpoint_every_steps = 10

    run_a = os.path.join(tmp_path, "run_a")
    trainer_a = Trainer(cfg, run_a, use_tensorboard=False)
    try:
        state_a = trainer_a.fit(dm)
        params_a = jax.device_get(state_a.params)
    finally:
        trainer_a.close()

    run_b = os.path.join(tmp_path, "run_b")
    trainer_b1 = Trainer(cfg, run_b, use_tensorboard=False)
    try:
        trainer_b1.fit(dm, total_steps=10)
    finally:
        trainer_b1.close()
    trainer_b2 = Trainer(cfg, run_b, use_tensorboard=False)
    try:
        state_b = trainer_b2.fit(dm, total_steps=20)
        params_b = jax.device_get(state_b.params)
    finally:
        trainer_b2.close()

    assert int(state_b.step) == 20
    flat_a = jax.tree.leaves(params_a)
    flat_b = jax.tree.leaves(params_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_mean_std_loudness_streaming_estimator(rng):
    from ddsp_pytorch_tpu.ops import mean_std_loudness

    batches = [
        {"loudness": rng.standard_normal((4, 10)).astype(np.float32) + 3.0}
        for _ in range(5)
    ]
    mean, std = mean_std_loudness(batches)
    allv = np.concatenate([b["loudness"].reshape(-1) for b in batches])
    # running-mean-of-batch-stats estimator ≈ global stats for iid batches
    assert abs(mean - allv.mean()) < 0.2
    assert abs(std - allv.std()) < 0.2


@pytest.mark.slow
def test_trainer_steps_per_call_equivalence(tmp_path):
    """Trainer with steps_per_call=4 trains the same function as the
    single-step loop: identical final params and a loss record for every
    step in metrics.jsonl (the scan body IS the single-step function)."""
    from ddsp_pytorch_tpu.training import Trainer

    cfg, dm = _tiny_setup(tmp_path, steps=14)  # 14 = 3×4 + 2 single tail

    def run(name, spc):
        c = Config.from_dict(cfg.to_dict())
        c.train.steps_per_call = spc
        run_dir = os.path.join(tmp_path, name)
        trainer = Trainer(c, run_dir, use_tensorboard=False)
        try:
            state = trainer.fit(dm)
        finally:
            trainer.close()
        import json

        steps_logged = []
        with open(os.path.join(run_dir, "metrics.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if rec["tag"] == "loss":
                    steps_logged.append(rec["step"])
        return jax.device_get(state.params), steps_logged

    params_1, steps_1 = run("spc1", 1)
    params_4, steps_4 = run("spc4", 4)

    assert steps_1 == steps_4 == list(range(1, 15))
    for a, b in zip(jax.tree.leaves(params_1), jax.tree.leaves(params_4)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_trainer_device_indexed_loader_equivalence(tmp_path):
    """The device-resident loader's one-gather super-batch path
    (DeviceDataLoader.index_batches/take_stacked — a single device dispatch
    per steps_per_call instead of one per batch) must train the EXACT same
    function as the host-loader path: same dataset order, identical final
    params, every step's loss logged."""
    import json

    from ddsp_pytorch_tpu.data import Datamodule
    from ddsp_pytorch_tpu.training import Trainer

    cfg, dm_host = _tiny_setup(tmp_path, steps=14)
    dm_dev = Datamodule(cfg, device_cache=True)
    dm_dev.setup()

    def run(name, dm, spc):
        c = Config.from_dict(cfg.to_dict())
        c.train.steps_per_call = spc
        run_dir = os.path.join(tmp_path, name)
        trainer = Trainer(c, run_dir, use_tensorboard=False)
        try:
            state = trainer.fit(dm)
        finally:
            trainer.close()
        steps_logged = []
        with open(os.path.join(run_dir, "metrics.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if rec["tag"] == "loss":
                    steps_logged.append(rec["step"])
        return jax.device_get(state.params), steps_logged

    params_host, steps_host = run("host4", dm_host, 4)
    params_dev, steps_dev = run("dev4", dm_dev, 4)
    params_dev1, _ = run("dev1", dm_dev, 1)

    assert steps_host == steps_dev == list(range(1, 15))
    # Not bit-exact: the two loader paths feed the SAME step function but
    # XLA CPU's multi-threaded contractions are not run-to-run reduction-
    # order stable, so 14 chaotic training steps accumulate ~1e-6 drift
    # (observed 1.1e-6 on one element in full-suite runs — right at the
    # old atol).  1e-5/1e-4 still pins path equivalence orders of
    # magnitude below any real divergence (a batch-order bug shifts
    # params by ~1e-2).
    for a, b in zip(jax.tree.leaves(params_host), jax.tree.leaves(params_dev)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(params_host), jax.tree.leaves(params_dev1)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_device_loader_vectorized_loudness_stats(tmp_path):
    """DeviceDataLoader.loudness_stats (≤2 dispatches) must be
    BIT-identical to the streaming ops.mean_std_loudness estimator over
    the same batch sequence — including a partial final batch (the train
    loader drops it, so build the loader directly with drop_last=False to
    exercise the two-size grouping path)."""
    from ddsp_pytorch_tpu.data import Datamodule, make_synthetic_dataset
    from ddsp_pytorch_tpu.data.dataset import Dataset, DeviceDataLoader
    from ddsp_pytorch_tpu.ops import mean_std_loudness

    cfg, _ = _tiny_setup(tmp_path, steps=4)
    # Own directory for the 7-item cache: _tiny_setup writes a 4-item
    # dataset at tmp_path/"cache" and must not clobber this one (7 % 2 and
    # 7 % 4 → partial last batches, the grouping path under test).
    cache = str(tmp_path / "cache7")
    make_synthetic_dataset(
        cache, n_items=7, sample_rate=16000, signal_length=8192,
        block_size=256, n_harmonic=8,
    )
    cfg.preprocess.out_dir = cache
    dm = Datamodule(cfg, device_cache=True)
    dm.setup()
    loader = dm.train_dataloader()
    assert mean_std_loudness(loader) == loader.loudness_stats()

    partial = DeviceDataLoader(
        Dataset(os.path.join(cache, "train")), batch_size=4,
        shuffle=True, drop_last=False,
    )
    sizes = [len(b) for b in partial.index_batches()]
    assert sizes[-1] < 4  # the partial final batch is really exercised
    assert mean_std_loudness(partial) == partial.loudness_stats()


def test_device_indexed_superbatch_dispatch_count(tmp_path):
    """The device-resident training path must cost ONE gather dispatch per
    super-batch (plus the init sample), not one per batch — the dispatch
    amortization that keeps high-latency transports (remote TPU tunnels)
    from dominating the step (training/train.py run_multi)."""
    from ddsp_pytorch_tpu.data import Datamodule
    from ddsp_pytorch_tpu.training import Trainer

    cfg, _ = _tiny_setup(tmp_path, steps=8)
    cfg.train.steps_per_call = 4
    dm = Datamodule(cfg, device_cache=True)
    dm.setup()
    loader = dm.train_dataloader()
    calls = {"n": 0}
    orig = loader._take

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    loader._take = counting
    dm.train_dataloader = lambda: loader
    trainer = Trainer(cfg, str(tmp_path / "run_disp"), use_tensorboard=False)
    try:
        trainer.fit(dm)
    finally:
        trainer.close()
    # 1 init-sample materialization + 2 one-gather super-batches
    assert calls["n"] <= 4, calls["n"]


def test_resume_reuses_frozen_loudness_stats(tmp_path):
    """A resumed run must keep the loudness stats frozen at its start even
    if the dataset changed on disk — the stats are part of the trained
    function (export bakes them), not a per-process artifact."""
    import yaml

    from ddsp_pytorch_tpu.data import Datamodule, make_synthetic_dataset
    from ddsp_pytorch_tpu.training import Trainer

    cfg, dm = _tiny_setup(tmp_path, steps=4)
    run_dir = os.path.join(tmp_path, "run_frozen")
    trainer = Trainer(cfg, run_dir, use_tensorboard=False)
    try:
        trainer.fit(dm)
    finally:
        trainer.close()
    with open(os.path.join(run_dir, "config.yaml")) as f:
        stats0 = yaml.safe_load(f)["data"]

    # regenerate the dataset with different audio, clear in-memory stats,
    # and continue the run — the frozen stats must win
    make_synthetic_dataset(cfg.preprocess.out_dir, n_items=6, seed=99)
    cfg2 = Config.from_dict(cfg.to_dict())
    cfg2.data.mean_loudness = None
    cfg2.data.std_loudness = None
    cfg2.train.steps = 8
    dm2 = Datamodule(cfg2)
    dm2.setup()
    trainer2 = Trainer(cfg2, run_dir, use_tensorboard=False)
    try:
        state = trainer2.fit(dm2)
    finally:
        trainer2.close()
    assert int(state.step) >= 8
    assert cfg2.data.mean_loudness == stats0["mean_loudness"]
    assert cfg2.data.std_loudness == stats0["std_loudness"]


def test_segmented_training_cli(tmp_path):
    """train.py --segment-steps stitches fresh child processes into one
    contiguous run (the tunnel-poisoning mitigation — BASELINE.md)."""
    import json
    import subprocess
    import sys

    from ddsp_pytorch_tpu.data import make_synthetic_dataset

    cache = os.path.join(tmp_path, "cache")
    make_synthetic_dataset(cache, n_items=4)
    cfg_path = os.path.join(tmp_path, "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(f"""
preprocess:
  sample_rate: 16000
  signal_length: 16384
  block_size: 256
  out_dir: {cache}
model:
  name: single-inst-decoder
  kwargs: {{hidden_size: 32, n_harmonic: 4, n_bands: 5, sample_rate: 16000,
            block_size: 256, has_reverb: false}}
train:
  scales: [512]
  batch: 2
  steps: 12
  checkpoint_every_steps: 100
""")
    repo = os.path.join(os.path.dirname(__file__), "..")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "train.py"), "--config", cfg_path,
         "--name", "seg", "--root", str(tmp_path / "runs"),
         "--platform", "cpu", "--no-mesh", "--segment-steps", "5"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert r.stdout.count("[segment]") == 4  # prime(0), 5, 10, 12
    steps = []
    with open(tmp_path / "runs" / "seg" / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"] == "loss":
                steps.append(rec["step"])
    assert steps == list(range(1, 13)), steps
    # per-segment wall-clock log (TRAINRUN artifacts build on this)
    segs = [json.loads(l)
            for l in open(tmp_path / "runs" / "seg" / "segments.jsonl")]
    assert [s["label"] for s in segs] == ["prime-stats"] + ["train"] * 3
    assert [s["to_step"] for s in segs] == [0, 5, 10, 12]
    assert all(s["returncode"] == 0 for s in segs)


def test_host_loader_spc1_stays_on_single_step_path(tmp_path):
    """steps_per_call=1 with a HOST loader must run the plain jitted step:
    the stack+scan-of-1 super-batch path dispatches MORE programs (3
    stacks + 1 scan) than the single step, which through a high-latency
    tunnel would be a ~4x honest-throughput regression on the default CLI
    path.  The spc==1 amortization is only a win via the fused in-scan
    gather of the device-cache loader (run_multi's indexed branch), which
    the second half asserts IS taken there."""
    from ddsp_pytorch_tpu.data import Datamodule
    from ddsp_pytorch_tpu.training import Trainer

    cfg, dm_host = _tiny_setup(tmp_path, steps=6)
    cfg.train.steps_per_call = 1

    trainer = Trainer(cfg, str(tmp_path / "run_spc1_host"),
                      use_tensorboard=False)

    def bomb(*a, **k):
        raise AssertionError(
            "multi-step path must not engage for host-loader spc==1"
        )

    trainer._multi_step = bomb if trainer._multi_step else trainer._multi_step
    trainer._multi_step_indexed = bomb
    try:
        trainer.fit(dm_host)
    finally:
        trainer.close()

    # device-cache loader: the fused indexed path MUST be taken at spc==1
    dm_dev = Datamodule(cfg, device_cache=True)
    dm_dev.setup()
    trainer2 = Trainer(cfg, str(tmp_path / "run_spc1_dev"),
                       use_tensorboard=False)
    calls = {"n": 0}
    orig = trainer2._multi_step_indexed

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    trainer2._multi_step_indexed = counting
    try:
        trainer2.fit(dm_dev)
    finally:
        trainer2.close()
    assert calls["n"] > 0
