"""Streaming-vs-offline equivalence — the invariant the reference's realtime
path silently relies on and never checks (SURVEY.md §4 item 5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_pytorch_tpu.config import Config
from ddsp_pytorch_tpu.models import load_model
from ddsp_pytorch_tpu.streaming import StreamingSynth, init_stream_state


@pytest.fixture(scope="module")
def setup():
    cfg = Config.from_dict(
        {
            "preprocess": {
                "sample_rate": 16000,
                "signal_length": 4096,
                "block_size": 64,
            },
            "model": {
                "name": "single-inst-decoder",
                "kwargs": {
                    "hidden_size": 32,
                    "n_harmonic": 8,
                    "n_bands": 9,
                    "sample_rate": 16000,
                    "block_size": 64,
                    "has_reverb": False,  # realtime contract: no reverb
                    "use_pallas": "never",
                },
            },
        }
    )
    model = load_model(cfg)
    rng = np.random.default_rng(0)
    f = cfg.n_frames
    batch = {
        "sig": jnp.zeros((1, cfg.preprocess.signal_length), jnp.float32),
        "pitch": jnp.asarray(rng.uniform(150, 350, (1, f, 1)).astype(np.float32)),
        "loudness": jnp.asarray(rng.standard_normal((1, f, 1)).astype(np.float32)),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, batch
    )["params"]
    return cfg, model, params, batch, rng


def test_streaming_equals_offline(setup):
    """Block-by-block streaming (4 blocks) == one offline forward, given the
    same noise draw.  Exercises GRU carry + phase carry."""
    cfg, model, params, batch, rng = setup
    f = cfg.n_frames
    block = cfg.preprocess.block_size

    noise = jnp.asarray(
        rng.uniform(-1, 1, (1, f, block)).astype(np.float32)
    )

    # offline: run the model's pieces with the SAME noise via streaming_step
    # over the full sequence in one call (state threading is identity).
    state0 = init_stream_state(model.hidden_size, 1)
    offline, _, _ = model.apply(
        {"params": params},
        batch["pitch"],
        batch["loudness"],
        state0.gru,
        state0.phase,
        noise,
        method=model.streaming_step,
    )

    # streamed: 4 chunks with carried state
    n_chunks = 4
    fc = f // n_chunks
    gru, phase = state0.gru, state0.phase
    outs = []
    for c in range(n_chunks):
        sl = slice(c * fc, (c + 1) * fc)
        audio, gru, phase = model.apply(
            {"params": params},
            batch["pitch"][:, sl],
            batch["loudness"][:, sl],
            gru,
            phase,
            noise[:, sl],
            method=model.streaming_step,
        )
        outs.append(audio)
    streamed = jnp.concatenate(outs, axis=-1)

    np.testing.assert_allclose(streamed, offline, atol=1e-4)


def test_streaming_matches_full_forward_harmonics(setup):
    """streaming_step's harmonic branch == the offline forward's harmonic
    audio (decoder GRU from zero state, same controls)."""
    cfg, model, params, batch, rng = setup
    out = model.apply(
        {"params": params}, batch, rngs={"noise": jax.random.PRNGKey(9)}
    )
    state0 = init_stream_state(model.hidden_size, 1)
    f = cfg.n_frames
    zero_noise = jnp.zeros((1, f, cfg.preprocess.block_size), jnp.float32)
    stream_audio, _, _ = model.apply(
        {"params": params},
        batch["pitch"],
        batch["loudness"],
        state0.gru,
        state0.phase,
        zero_noise,
        method=model.streaming_step,
    )
    np.testing.assert_allclose(
        stream_audio, out["harmonic_audio"], atol=1e-4
    )


def test_streaming_synth_wrapper(setup):
    """StreamingSynth: sample-rate wire format, stateful across calls."""
    cfg, model, params, batch, rng = setup
    synth = StreamingSynth(model, params, batch=1)
    n = 4 * cfg.preprocess.block_size
    pitch = np.full((1, n), 220.0, np.float32)
    loud = np.zeros((1, n), np.float32)
    a1 = np.asarray(synth.step_samples(pitch, loud))
    a2 = np.asarray(synth.step_samples(pitch, loud))
    assert a1.shape == (1, n)
    assert np.all(np.isfinite(a1))
    # phase carried: the second call continues, not restarts → different
    # waveform start unless phase happens to wrap exactly
    assert not np.allclose(a1, a2)

    synth.reset()
    a3 = np.asarray(synth.step_samples(pitch, loud))
    # PRNG differs after reset only if seed differs; same seed → same audio
    np.testing.assert_allclose(a1, a3, atol=1e-5)


def test_deterministic_noise_mode(setup):
    cfg, model, params, batch, rng = setup
    synth = StreamingSynth(model, params, batch=1, noise_deterministic=True)
    n = 2 * cfg.preprocess.block_size
    pitch = np.full((1, n), 220.0, np.float32)
    loud = np.zeros((1, n), np.float32)
    a1 = np.asarray(synth.step_samples(pitch, loud))
    synth.reset()
    b1 = np.asarray(synth.step_samples(pitch, loud))
    np.testing.assert_allclose(a1, b1)


def test_device_array_inputs_match_numpy_inputs(setup):
    """The hot-path fast path (streaming._as_f32 returns device f32 arrays
    untouched — no per-input dispatch) must be behavior-identical to numpy
    inputs; also guards dtype coercion for f64/i32 hosts arrays."""
    import jax.numpy as jnp

    cfg, model, params, batch, rng = setup
    f = 4
    f0_np = np.full((1, f, 1), 220.0, np.float32)
    lo_np = np.zeros((1, f, 1), np.float32)

    synth = StreamingSynth(model, params, batch=1)
    a_np = np.asarray(synth.step(f0_np, lo_np))
    synth.reset()
    a_dev = np.asarray(synth.step(jnp.asarray(f0_np), jnp.asarray(lo_np)))
    np.testing.assert_array_equal(a_np, a_dev)

    synth.reset()
    a_f64 = np.asarray(
        synth.step(f0_np.astype(np.float64), lo_np.astype(np.float64))
    )
    np.testing.assert_array_equal(a_np, a_f64)


@pytest.mark.slow
def test_long_horizon_drift_soak():
    """Hours-class streaming stability (round-2 VERDICT next-round #7): the
    wrapped f32 phase carry — the only unbounded stream state — tracks an
    exact f64 oracle over 2e7 samples (~7 min @48 kHz) within 5e-2 rad, and
    a long-lived VoicePool slot stays bit-tight vs an independent batch-1
    stream while neighbor slots churn.  The committed full-horizon artifact
    (1e8 samples ≈ 35 min: max drift 7.8e-2 rad ≈ 1.2 % of a cycle, a
    ~6e-6 Hz equivalent frequency error; pool isolation 1e-7) is
    pretrained/stream_drift_soak.json (scripts/stream_drift_soak.py).  The
    reference's realtime path assumes this invariant and never checks it
    (reference realtime/ddsp_tilde/ddsp_tilde.cpp:81-95)."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    from stream_drift_soak import phase_drift_soak, pool_churn_soak

    drift = phase_drift_soak(int(2e7))
    assert drift["max_abs_err_rad"] < 5e-2, drift["checkpoints"][-3:]
    assert drift["audio_peak"] < 100.0 and drift["gru_carry_max_abs"] <= 1.0

    churn = pool_churn_soak(int(2e6))
    assert churn["hero_vs_solo_max_abs_diff"] < 1e-5, churn
    assert churn["churn_events"] >= 4
