"""Edge-shape hardening (round-5 VERDICT #7): the public APIs at shapes
the reference crashes on or ordinary tests skirt — short signals, lengths
that are not block multiples, odd sample rates, batch 1, frame counts not
divisible by the time axis.  Each either works or raises a clear error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_pytorch_tpu.config import Config
from ddsp_pytorch_tpu.models import load_model


def _model_cfg(sr=16000, block=64, *, name="single-inst-decoder",
               reverb=False, frames=8):
    return Config.from_dict(
        {
            "preprocess": {
                "sample_rate": sr,
                "signal_length": frames * block,
                "block_size": block,
            },
            "model": {
                "name": name,
                "kwargs": {
                    "hidden_size": 16,
                    "n_harmonic": 4,
                    "n_bands": 5,
                    "sample_rate": sr,
                    "block_size": block,
                    "has_reverb": reverb,
                    "use_pallas": "never",
                },
            },
        }
    )


def _forward(cfg, batch_size=1, frames=None):
    model = load_model(cfg)
    f = frames if frames is not None else cfg.n_frames
    rng = np.random.default_rng(0)
    batch = {
        "sig": jnp.zeros((batch_size, f * cfg.preprocess.block_size)),
        "pitch": jnp.asarray(
            rng.uniform(150, 350, (batch_size, f, 1)).astype(np.float32)),
        "loudness": jnp.asarray(
            rng.standard_normal((batch_size, f, 1)).astype(np.float32)),
    }
    if cfg.model.name == "mfcc-autoencoder":
        from ddsp_pytorch_tpu.models.encoder import N_MFCCS

        batch["mfcc"] = jnp.asarray(
            rng.standard_normal((batch_size, f, N_MFCCS)).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    params = model.init(rngs, batch)["params"]
    out = model.apply({"params": params}, batch,
                      rngs={"noise": jax.random.PRNGKey(1)})
    return out, batch


def test_signal_shorter_than_reverb_ir():
    """T=4 frames of audio through a full-second reverb (IR length =
    sample_rate ≫ T): the reference's Reverb crashes here (its nn.functional
    pad gets a negative pad); ours renders T samples, finite."""
    cfg = _model_cfg(reverb=True)
    out, _ = _forward(cfg, frames=4)
    assert out["signal"].shape == (1, 4 * 64)
    assert np.all(np.isfinite(np.asarray(out["signal"])))


@pytest.mark.parametrize("name", ["single-inst-decoder", "mfcc-autoencoder"])
def test_batch_one_offline(name):
    cfg = _model_cfg(name=name, reverb=True)
    out, _ = _forward(cfg, batch_size=1)
    assert out["signal"].shape == (1, cfg.preprocess.signal_length)
    assert np.all(np.isfinite(np.asarray(out["signal"])))


def test_loss_rejects_sig_not_block_multiple():
    """A sig whose length is not frames*block_size reaches the loss with a
    length mismatch — must be a clear ValueError, not an XLA broadcast
    error from inside the STFT."""
    from ddsp_pytorch_tpu.training.loss import spectral_loss_from_signals

    with pytest.raises(ValueError, match="block_size"):
        spectral_loss_from_signals(
            jnp.zeros((1, 2148)), jnp.zeros((1, 2048)), (256,), 0.75
        )


def test_odd_sample_rate_44100_ops():
    """Feature extractors at 44.1 kHz / block 441 (non-power-of-two block,
    non-integer 16 kHz resampling ratio for the neural tracker)."""
    from ddsp_pytorch_tpu.data.preprocess import make_pitch_fn
    from ddsp_pytorch_tpu.ops import extract_loudness, extract_pitch, mfcc

    sr, block = 44100, 441
    x = np.sin(2 * np.pi * 220.0 * np.arange(sr) / sr).astype(np.float32)
    f0 = np.asarray(extract_pitch(x, sr, block))
    assert f0.shape == (sr // block,)
    assert abs(np.median(f0[5:-5]) - 220.0) < 2.0
    lo = np.asarray(extract_loudness(x[None, :], sr, block))
    assert lo.shape == (1, sr // block)
    m = np.asarray(mfcc(x[None, :], sr, hop_length=block))
    assert m.shape[0] == 1 and np.all(np.isfinite(m))

    # the default (hybrid CREPE×YIN) tracker through its 44.1k→16k
    # polyphase resampler
    cfg = Config()
    cfg.preprocess.sample_rate = sr
    cfg.preprocess.block_size = block
    fn = make_pitch_fn(cfg)
    fh = np.asarray(fn(jnp.asarray(x), sr, block))
    assert fh.shape == (sr // block,)
    assert abs(np.median(fh[5:-5]) - 220.0) < 3.0


def test_odd_sample_rate_44100_model_and_streaming():
    """Offline forward and the streamed path agree at 44.1 kHz with a
    block size that is not a power of two."""
    from ddsp_pytorch_tpu.streaming import StreamingSynth, init_stream_state

    cfg = _model_cfg(sr=44100, block=441)
    model = load_model(cfg)
    f = cfg.n_frames
    rng = np.random.default_rng(1)
    pitch = jnp.asarray(rng.uniform(150, 350, (1, f, 1)).astype(np.float32))
    loud = jnp.asarray(rng.standard_normal((1, f, 1)).astype(np.float32))
    batch = {"sig": jnp.zeros((1, f * 441)), "pitch": pitch,
             "loudness": loud}
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    params = model.init(rngs, batch)["params"]

    noise = jnp.asarray(rng.uniform(-1, 1, (1, f, 441)).astype(np.float32))
    state0 = init_stream_state(model.hidden_size, 1)
    offline, _, _ = model.apply(
        {"params": params}, pitch, loud, state0.gru, state0.phase, noise,
        method=model.streaming_step,
    )
    gru, phase = state0.gru, state0.phase
    outs = []
    for c in range(f):  # one frame at a time — the harshest chunking
        audio, gru, phase = model.apply(
            {"params": params}, pitch[:, c : c + 1], loud[:, c : c + 1],
            gru, phase, noise[:, c : c + 1], method=model.streaming_step,
        )
        outs.append(audio)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(o) for o in outs], axis=-1),
        np.asarray(offline), atol=1e-4,
    )

    # and the user-facing wrapper accepts the odd block size
    synth = StreamingSynth(model, params, batch=1, noise_deterministic=True)
    a = np.asarray(synth.step(pitch[:, :4], loud[:, :4]))
    assert a.shape == (1, 4 * 441) and np.all(np.isfinite(a))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("frames", [66, 74])  # 66%4=2, 74%4=2 — both pad
def test_time_shard_pad_sweep(frames):
    """Frame counts not divisible by the time axis, beyond the canonical
    375→384 case: the pad-and-mask step must match the unsharded step."""
    from test_time_sharded_training import (
        _assert_close,
        _config,
        _run_pair,
    )
    from ddsp_pytorch_tpu.parallel import make_mesh
    from ddsp_pytorch_tpu.training.time_sharded import plan_time_padding

    rng = np.random.default_rng(frames)
    cfg = _config(has_reverb=False)
    cfg.preprocess.signal_length = frames * cfg.preprocess.block_size
    plan = plan_time_padding(cfg, make_mesh(data=2, time=4))
    assert plan.pad_frames > 0
    _assert_close(_run_pair(rng, has_reverb=False, cfg=cfg),
                  delta_tol=1.5e-1, grad_norm_rtol=5e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_time_shard_unsatisfiable_shape_raises_clearly():
    """A frame count whose padding cannot satisfy the hop-alignment
    constraints must fail at PLAN time with an actionable message, not
    deep inside the sharded step."""
    from test_time_sharded_training import _config
    from ddsp_pytorch_tpu.parallel import make_mesh
    from ddsp_pytorch_tpu.training.time_sharded import plan_time_padding

    cfg = _config(has_reverb=False)
    cfg.preprocess.signal_length = 69 * cfg.preprocess.block_size
    with pytest.raises(ValueError, match="fewer time shards|smaller scales"):
        plan_time_padding(cfg, make_mesh(data=2, time=4))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_time_shard_batch_one():
    """Batch 1 on a pure-time mesh (data=1, time=8): the smallest serving
    slab a time-sharded deployment sees."""
    import optax

    from test_time_sharded_training import _batch, _config
    from ddsp_pytorch_tpu.parallel import make_mesh
    from ddsp_pytorch_tpu.parallel.sharding import (
        replicate_state,
        shard_time_batch,
        shard_time_train_step,
    )
    from ddsp_pytorch_tpu.training import create_train_state, make_train_step
    from ddsp_pytorch_tpu.training.time_sharded import (
        make_time_sharded_train_step,
    )

    rng = np.random.default_rng(7)
    cfg = _config(has_reverb=False)
    model = load_model(cfg)
    batch = _batch(rng, cfg, batch_size=1)
    tx = optax.sgd(0.1)
    state0 = create_train_state(model, batch, tx, seed=0)
    _, m_single = jax.jit(make_train_step(model, tx, cfg))(state0, batch)

    mesh = make_mesh(data=1, time=8)
    state_r = replicate_state(create_train_state(model, batch, tx, seed=0),
                              mesh)
    step = shard_time_train_step(
        make_time_sharded_train_step(model, tx, cfg, mesh), mesh
    )
    _, m_sharded = step(state_r, shard_time_batch(batch, mesh))
    np.testing.assert_allclose(
        float(m_sharded["loss"]), float(m_single["loss"]), rtol=1e-4
    )
