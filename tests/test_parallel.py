"""Parallelism tests on the 8-device virtual CPU mesh (SURVEY.md §4 item 4):
sharded results must equal single-device results.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_pytorch_tpu.ops import fft_convolve, harmonic_synth_frames
from ddsp_pytorch_tpu.parallel import make_mesh
from ddsp_pytorch_tpu.parallel.ops import (
    make_time_sharded_loss,
    make_time_sharded_reverb,
    make_time_sharded_synth,
)
from ddsp_pytorch_tpu.training.loss import spectral_loss_from_signals

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_mesh_shapes():
    mesh = make_mesh(data=4, time=2)
    assert mesh.shape == {"data": 4, "time": 2}
    mesh = make_mesh(data=-1, time=2)
    assert mesh.shape["data"] * 2 == len(jax.devices())


def test_time_sharded_harmonic_synth_matches_unsharded(rng):
    """Distributed phase scan: 4-way time-sharded == single device."""
    b, f, k, block, sr = 2, 64, 8, 64, 16000
    f0 = jnp.asarray(rng.uniform(100, 400, (b, f)).astype(np.float32))
    amp = jnp.asarray((rng.random((b, f, k)) / k).astype(np.float32))

    want = harmonic_synth_frames(f0, amp, block, sr, use_pallas="never")

    mesh = make_mesh(data=2, time=4)
    synth = jax.jit(make_time_sharded_synth(mesh, block, sr, use_pallas="never"))
    got = synth(f0, amp)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_time_sharded_synth_pallas_kernel_in_shard_map(rng):
    """The PALLAS oscillator inside shard_map, interpret mode on the CPU
    mesh — the wiring (grid, BlockSpecs, padding, row flattening) that the
    TPU long-form path (use_pallas='auto' under a ('data','time') mesh)
    compiles.  Interpret mode requires check_vma=False (JAX's own
    hlo_interpreter is not vma-clean), so the out_shape vma declarations
    are pinned separately by test_pallas_out_shape_vma_declaration."""
    b, f, k, block, sr = 2, 64, 8, 64, 16000
    f0 = jnp.asarray(rng.uniform(100, 400, (b, f)).astype(np.float32))
    amp = jnp.asarray((rng.random((b, f, k)) / k).astype(np.float32))

    want = harmonic_synth_frames(f0, amp, block, sr, use_pallas="never")

    mesh = make_mesh(data=2, time=4)
    synth = jax.jit(
        make_time_sharded_synth(mesh, block, sr, use_pallas="interpret")
    )
    got = synth(f0, amp)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_pallas_out_shape_vma_declaration(rng):
    """_vma must derive the union of the inputs' varying mesh axes inside
    shard_map with the check ON — the declaration the compiled TPU kernel
    (check_vma=True) relies on.  Captured at trace time: the pallas_call
    itself cannot run compiled on CPU."""
    from ddsp_pytorch_tpu.ops.pallas_kernels.oscillator import _vma

    seen = {}

    def body(x, y):
        seen["vma"] = _vma(x, y)
        return x * jnp.sum(y)

    mesh = make_mesh(data=2, time=4)
    from jax.sharding import PartitionSpec as P
    from ddsp_pytorch_tpu.parallel.ops import checked_shard_map

    f = jax.jit(
        checked_shard_map(
            body,
            mesh=mesh,
            in_specs=(P("data", "time"), P(None, "time")),
            out_specs=P("data", "time"),
            check=True,
        )
    )
    x = jnp.ones((2, 8), jnp.float32)
    y = jnp.ones((1, 8), jnp.float32)
    jax.block_until_ready(f(x, y))
    assert seen["vma"] == frozenset({"data", "time"})

    # outside shard_map: empty set (and never None on this JAX)
    assert _vma(x) == frozenset()


def test_time_sharded_loss_matches_unsharded(rng):
    b, t = 2, 8192
    scales, overlap = [512, 256, 128], 0.75
    x = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))

    want, _, _ = spectral_loss_from_signals(x, y, scales, overlap)

    mesh = make_mesh(data=2, time=4)
    loss_fn = jax.jit(make_time_sharded_loss(mesh, scales, overlap))
    got = loss_fn(x, y)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)


def test_padded_masked_loss_and_grads_match_unsharded(rng):
    """Pad-and-mask exactness in isolation: the time-sharded multiscale
    loss of a zero-padded signal pair — pad region rewritten with the
    reflection about the true end (reflect_tail_into_pad), frames beyond it
    masked — equals the UNSHARDED loss of the unpadded signals, value AND
    gradient, to f32 round-off.  This pins the pad-and-mask machinery the
    end-to-end equivalence tests (test_time_sharded_training.py) rely on;
    their looser elementwise slack absorbs only distributed-phase-scan
    noise, not loss error."""
    from jax.sharding import PartitionSpec as P

    from ddsp_pytorch_tpu.parallel.ops import (
        checked_shard_map,
        reflect_tail_into_pad,
        sharded_multiscale_spec_loss,
    )

    b, t_valid, t_pad = 2, 4544, 5120  # chunk 1280, pad 576 >= n_fft/2
    scales, overlap = [512, 256], 0.75
    x = jnp.asarray(rng.standard_normal((b, t_valid)).astype(np.float32)) * 0.1
    y = jnp.asarray(rng.standard_normal((b, t_valid)).astype(np.float32)) * 0.1

    def unsharded(r):
        loss, _, _ = spectral_loss_from_signals(x, r, scales, overlap)
        return loss

    want = unsharded(y)
    g_want = jax.grad(unsharded)(y)

    mesh = make_mesh(data=2, time=4)

    def core(tgt, rec):
        tgt = reflect_tail_into_pad(tgt, t_valid)
        rec = reflect_tail_into_pad(rec, t_valid)
        return sharded_multiscale_spec_loss(
            tgt, rec, scales, overlap, t_valid=t_valid
        )

    sharded_core = checked_shard_map(
        core, mesh=mesh,
        in_specs=(P("data", "time"), P("data", "time")), out_specs=P(),
    )

    def sharded(r):
        pad = ((0, 0), (0, t_pad - t_valid))
        return sharded_core(jnp.pad(x, pad), jnp.pad(r, pad))

    got = jax.jit(sharded)(y)
    g_got = jax.jit(jax.grad(sharded))(y)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_got), np.asarray(g_want),
        atol=1e-6 * float(np.max(np.abs(g_want))),
    )


def test_time_sharded_reverb_matches_fft_convolve(rng):
    """Overlap-scatter block convolution == reference-semantics reverb conv
    (causal, IR padded to signal length)."""
    b, t, l = 2, 2048, 700  # IR spans ~3 time shards' chunks (t/8 = 256)
    x = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))
    ir = jnp.asarray(rng.standard_normal((l,)).astype(np.float32))

    ir_padded = jnp.pad(ir, (0, t - l))
    want = fft_convolve(x, ir_padded[None, :])

    mesh = make_mesh(data=2, time=4)
    conv = jax.jit(make_time_sharded_reverb(mesh))
    got = conv(x, ir)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_data_parallel_train_step_matches_single_device(rng):
    """DP over 8 devices == single-device training step (same batch)."""
    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.models import load_model
    from ddsp_pytorch_tpu.parallel import replicate_state, shard_batch
    from ddsp_pytorch_tpu.parallel.sharding import shard_train_step
    from ddsp_pytorch_tpu.training import create_train_state, make_train_step
    from ddsp_pytorch_tpu.training.train import make_optimizer

    cfg = Config.from_dict(
        {
            "preprocess": {
                "sample_rate": 16000,
                "signal_length": 2048,
                "block_size": 64,
            },
            "model": {
                "name": "single-inst-decoder",
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
            "train": {"scales": [256, 128], "overlap": 0.75, "batch": 8},
        }
    )
    model = load_model(cfg)
    f = cfg.n_frames
    b = 8
    batch = {
        "sig": jnp.asarray(rng.standard_normal((b, 2048)).astype(np.float32)),
        "pitch": jnp.asarray(rng.uniform(100, 300, (b, f, 1)).astype(np.float32)),
        "loudness": jnp.asarray(rng.standard_normal((b, f, 1)).astype(np.float32)),
    }
    tx = make_optimizer(cfg)
    step = make_train_step(model, tx, cfg)

    state0 = create_train_state(model, batch, tx, seed=0)
    _, m_single = jax.jit(step)(state0, batch)

    mesh = make_mesh(data=8, time=1)
    state_r = replicate_state(create_train_state(model, batch, tx, seed=0), mesh)
    sharded = shard_train_step(step, mesh)
    _, m_dp = sharded(state_r, shard_batch(batch, mesh))

    np.testing.assert_allclose(
        float(m_dp["loss"]), float(m_single["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m_dp["grad_norm"]), float(m_single["grad_norm"]), rtol=1e-3
    )


@pytest.mark.slow
def test_trainer_fit_with_mesh(tmp_path, rng):
    """Full Trainer.fit on an 8-device DP mesh: loss logged, replicated
    state checkpointed and restorable."""
    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.data import Datamodule, make_synthetic_dataset
    from ddsp_pytorch_tpu.training import Trainer

    cache = str(tmp_path / "cache")
    make_synthetic_dataset(
        cache, n_items=8, sample_rate=16000, signal_length=4096,
        block_size=128, n_harmonic=4,
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
            "train": {"scales": [256], "batch": 8, "steps": 6,
                      "checkpoint_every_steps": 3, "val_interval_epochs": 1},
        }
    )
    mesh = make_mesh(data=8, time=1)
    run_dir = str(tmp_path / "run")
    dm = Datamodule(cfg)
    dm.setup()
    trainer = Trainer(cfg, run_dir, mesh=mesh, use_tensorboard=False)
    try:
        state = trainer.fit(dm)
    finally:
        trainer.close()
    assert int(state.step) >= 6

    # checkpoint restorable into a fresh mesh-replicated trainer
    trainer2 = Trainer(cfg, run_dir, mesh=mesh, use_tensorboard=False)
    try:
        sample = trainer2.shard_batch(next(iter(dm.train_dataloader())))
        restored, was_restored = trainer2.resume_or_init(sample)
        assert was_restored
        assert int(restored.step) >= 6
    finally:
        trainer2.close()


def test_trainer_fit_mesh_multi_step_and_partial_val(tmp_path, rng):
    """Mesh + steps_per_call>1 (host batches buffered, super-batch sharded
    once) and a validation set whose final batch does not divide the data
    axis (evaluated replicated) — regression for both paths."""
    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.data import Datamodule, make_synthetic_dataset
    from ddsp_pytorch_tpu.training import Trainer

    cache = str(tmp_path / "cache")
    # 20 items: train = 2 full batches/epoch (drop_last), so the multi-step
    # buffer fills; validation batches run 8, 8, 4 — the 4 is the partial.
    make_synthetic_dataset(
        cache, n_items=20, sample_rate=16000, signal_length=4096,
        block_size=128, n_harmonic=4,
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
            "train": {"scales": [256], "batch": 8, "steps": 4,
                      "steps_per_call": 2, "val_interval_epochs": 1},
        }
    )
    mesh = make_mesh(data=8, time=1)
    dm = Datamodule(cfg)
    dm.setup()
    trainer = Trainer(cfg, str(tmp_path / "run"), mesh=mesh,
                      use_tensorboard=False)
    try:
        state = trainer.fit(dm)
    finally:
        trainer.close()
    assert int(state.step) >= 4

    # the partial val batch really doesn't divide the mesh: helper must
    # fall back to the replicated placement, not raise
    partial = {k: v[:4] for k, v in next(iter(dm.val_dataloader())).items()}
    sharded = trainer._shard_eval_batch(partial)
    assert sharded is not None


def test_graft_dryrun_multichip():
    """The driver's multi-chip dry run must pass on the virtual mesh."""
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
