"""Streaming MFCC-autoencoder — a capability the reference does NOT have.

The reference's DDSPAutoencoder (encoder.py:29-141) defines no
realtime_forward at all: only the plain decoder can stream.  Here the
autoencoder streams exactly — per-block MFCC frames from a causal extractor
(streaming/mfcc.py StreamingMFCC) drive the encoder GRU, whose carry joins the
StreamState — and block-streamed output equals the offline forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_pytorch_tpu.config import Config
from ddsp_pytorch_tpu.models import load_model
from ddsp_pytorch_tpu.ops.spectral import mfcc
from ddsp_pytorch_tpu.streaming.mfcc import StreamingMFCC
from ddsp_pytorch_tpu.streaming import StreamingSynth, init_stream_state

SR, BLOCK, SIGLEN = 16000, 64, 4096
N_FFT, N_MELS, N_MFCC = 128, 40, 30  # n_fft = 2*hop (reference geometry)


def _signal(batch=2, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(SIGLEN) / SR
    f0 = rng.uniform(150, 300, (batch, 1))
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    x *= rng.uniform(0.2, 1.0, (batch, 1)).astype(np.float32)
    x += 0.01 * rng.standard_normal((batch, SIGLEN)).astype(np.float32)
    return x


def _offline_mfcc(x, ref_db):
    return np.asarray(
        mfcc(
            jnp.asarray(x),
            SR,
            n_mfcc=N_MFCC,
            n_fft=N_FFT,
            hop_length=BLOCK,
            fmin=20.0,
            fmax=8000.0,
            n_mels=N_MELS,
            ref_db=ref_db,
        )
    )


def _stream_mfcc(batch=2, ref_db=0.0):
    return StreamingMFCC(
        SR,
        batch=batch,
        n_mfcc=N_MFCC,
        n_fft=N_FFT,
        hop_length=BLOCK,
        fmin=20.0,
        fmax=8000.0,
        n_mels=N_MELS,
        ref_db=ref_db,
    )


class TestStreamingMFCC:
    def test_equals_offline_block_by_block(self):
        """hop-sized pushes: frame j arrives with block j (block 1 releases
        frames 0+1), values equal the offline frames exactly."""
        x = _signal()
        offline = _offline_mfcc(x, ref_db=0.0)
        sm = _stream_mfcc()
        got, counts = [], []
        for k in range(SIGLEN // BLOCK):
            frames = sm.push(x[:, k * BLOCK : (k + 1) * BLOCK])
            counts.append(frames.shape[1])
            got.append(frames)
        got = np.concatenate(got, axis=1)
        f = SIGLEN // BLOCK
        assert counts[0] == 0 and counts[1] == 2 and set(counts[2:]) == {1}
        assert got.shape == (2, f, N_MFCC)
        # atol: StreamingMFCC runs numpy's f64 FFT; offline runs XLA's
        # complex64 — ~2e-4 on dB-scale coefficients (relative ~1e-6)
        np.testing.assert_allclose(got, offline[:, :f], atol=1e-3)

    def test_equals_offline_irregular_pushes(self):
        """Push sizes that don't align with the hop still emit the same
        frames in the same order."""
        x = _signal(seed=3)
        offline = _offline_mfcc(x, ref_db=0.0)
        sm = _stream_mfcc()
        got, pos, rng = [], 0, np.random.default_rng(7)
        while pos < SIGLEN:
            n = min(int(rng.integers(1, 4)) * BLOCK + int(rng.integers(0, BLOCK)),
                    SIGLEN - pos)
            got.append(sm.push(x[:, pos : pos + n]))
            pos += n
        got = np.concatenate(got, axis=1)
        f = got.shape[1]
        assert f >= SIGLEN // BLOCK - 1  # all but possibly the tail frame
        # atol: StreamingMFCC runs numpy's f64 FFT; offline runs XLA's
        # complex64 — ~2e-4 on dB-scale coefficients (relative ~1e-6)
        np.testing.assert_allclose(got, offline[:, :f], atol=1e-3)

    def test_librosa_floor_parity_with_known_ref(self):
        """With ref_db set to the true global max, streamed frames equal the
        default (librosa-semantics) offline MFCCs — the fixed reference is
        the only causal concession."""
        x = _signal(seed=5)
        default = _offline_mfcc(x, ref_db=None)  # global-max floor
        # recover each signal's global max log-power the same way mfcc does
        from ddsp_pytorch_tpu.ops.spectral import (
            mel_filterbank,
            stft,
        )

        spec = stft(jnp.asarray(x), N_FFT, BLOCK, center=True,
                    normalized=False, magnitude=True)
        fb = jnp.asarray(mel_filterbank(SR, N_FFT, N_MELS, 20.0, 8000.0))
        mel = jnp.einsum("mf,...ft->...mt", fb, jnp.square(spec))
        ref = 10.0 * jnp.log10(jnp.maximum(1e-10, mel)).max(axis=(-2, -1))
        f = SIGLEN // BLOCK
        for b in range(x.shape[0]):
            sm = _stream_mfcc(batch=1, ref_db=float(ref[b]))
            got = np.concatenate(
                [sm.push(x[b : b + 1, k * BLOCK : (k + 1) * BLOCK])
                 for k in range(f)],
                axis=1,
            )
            np.testing.assert_allclose(got, default[b : b + 1, :f], atol=1e-3)

    def test_rejects_bad_geometry_and_shape(self):
        with pytest.raises(ValueError, match="n_fft <= 2"):
            StreamingMFCC(SR, n_fft=4 * BLOCK, hop_length=BLOCK)
        sm = _stream_mfcc(batch=2)
        with pytest.raises(ValueError, match="batch"):
            sm.push(np.zeros((3, BLOCK), np.float32))


def test_preprocess_ref_db_agrees_with_streaming(tmp_path):
    """preprocess.mfcc_ref_db threads the fixed dB floor into the feature
    cache, and export.make_streaming_mfcc builds the live extractor from
    the same (frozen) config — train-time MFCCs == streamed MFCCs."""
    from ddsp_pytorch_tpu.data.preprocess import preprocess
    from ddsp_pytorch_tpu.export import make_streaming_mfcc
    from ddsp_pytorch_tpu.utils import load_wav, save_wav

    sr, block, siglen, n_fft = 16000, 256, 2048, 512
    x = _signal(batch=1, seed=21)[0, :siglen]
    wav = tmp_path / "tone.wav"
    save_wav(str(wav), x, sr)
    x, _ = load_wav(str(wav), sr)  # the samples preprocess actually saw

    cfg = Config.from_dict(
        {
            "preprocess": {
                "sample_rate": sr,
                "signal_length": siglen,
                "block_size": block,
                "mfcc_n_fft": n_fft,
                "n_mels": 40,
                "mfcc_ref_db": 0.0,
            }
        }
    )
    pc = cfg.preprocess
    _, _, _, m = preprocess(
        wav,
        sample_rate=sr,
        block_size=block,
        signal_length=siglen,
        n_mfcc=pc.n_mfcc,
        mfcc_n_fft=pc.mfcc_n_fft,
        mfcc_fmin=pc.mfcc_fmin,
        mfcc_fmax=pc.mfcc_fmax,
        n_mels=pc.n_mels,
        mfcc_ref_db=pc.mfcc_ref_db,
    )
    cached = m[0, :-1]  # the F frames the Dataset serves (data.py:25 parity)

    sm = make_streaming_mfcc(cfg, batch=1)
    assert sm.hop == block and sm.n_fft == n_fft and sm.ref_db == 0.0
    got = np.concatenate(
        [sm.push(x[None, k * block : (k + 1) * block])
         for k in range(siglen // block)],
        axis=1,
    )
    np.testing.assert_allclose(got[0], cached, atol=2e-4)


@pytest.fixture(scope="module")
def ae_setup():
    cfg = Config.from_dict(
        {
            "preprocess": {
                "sample_rate": SR,
                "signal_length": SIGLEN,
                "block_size": BLOCK,
            },
            "model": {
                "name": "mfcc-autoencoder",
                "kwargs": {
                    "hidden_size": 32,
                    "n_harmonic": 8,
                    "n_bands": 9,
                    "sample_rate": SR,
                    "block_size": BLOCK,
                    "has_reverb": False,
                    "use_pallas": "never",
                },
            },
        }
    )
    model = load_model(cfg)
    rng = np.random.default_rng(0)
    f = cfg.n_frames
    x = _signal(batch=1, seed=11)
    mfcc_frames = jnp.asarray(_offline_mfcc(x, ref_db=0.0)[:, :f])
    batch = {
        "sig": jnp.asarray(x),
        "pitch": jnp.asarray(rng.uniform(150, 350, (1, f, 1)).astype(np.float32)),
        "loudness": jnp.asarray(rng.standard_normal((1, f, 1)).astype(np.float32)),
        "mfcc": mfcc_frames,
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, batch
    )["params"]
    return cfg, model, params, batch, x, rng


class TestAutoencoderStreaming:
    def test_streaming_equals_offline(self, ae_setup):
        """Chunked streaming_step (carrying encoder GRU + decoder GRU +
        phase) == one full-sequence call, same noise."""
        cfg, model, params, batch, x, rng = ae_setup
        f = cfg.n_frames
        noise = jnp.asarray(
            rng.uniform(-1, 1, (1, f, BLOCK)).astype(np.float32)
        )
        s0 = init_stream_state(model.hidden_size, 1,
                               enc_hidden_size=model.hidden_size)
        offline, _, _, _ = model.apply(
            {"params": params},
            batch["pitch"],
            batch["loudness"],
            batch["mfcc"],
            s0.enc_gru,
            s0.gru,
            s0.phase,
            noise,
            method=model.streaming_step,
        )

        n_chunks, fc = 4, f // 4
        enc, gru, phase = s0.enc_gru, s0.gru, s0.phase
        sm = _stream_mfcc(batch=1)
        outs, mfcc_seen = [], 0
        for c in range(n_chunks):
            sl = slice(c * fc, (c + 1) * fc)
            # causal MFCC: push this chunk's audio; block 1 releases the
            # startup frame, so after chunk c we hold >= (c+1)*fc frames
            frames = sm.push(x[:, c * fc * BLOCK : (c + 1) * fc * BLOCK])
            mfcc_seen += frames.shape[1]
            assert mfcc_seen >= (c + 1) * fc - 1
            audio, enc, gru, phase = model.apply(
                {"params": params},
                batch["pitch"][:, sl],
                batch["loudness"][:, sl],
                batch["mfcc"][:, sl],
                enc,
                gru,
                phase,
                noise[:, sl],
                method=model.streaming_step,
            )
            outs.append(audio)
        streamed = jnp.concatenate(outs, axis=-1)
        np.testing.assert_allclose(streamed, offline, atol=1e-4)

    def test_streaming_matches_offline_forward(self, ae_setup):
        """streaming_step from zero state with zero noise == the offline
        __call__'s harmonic branch (ties the streaming path to the trained
        forward, not just to itself)."""
        cfg, model, params, batch, x, rng = ae_setup
        out = model.apply(
            {"params": params}, batch, rngs={"noise": jax.random.PRNGKey(9)}
        )
        s0 = init_stream_state(model.hidden_size, 1,
                               enc_hidden_size=model.hidden_size)
        zero_noise = jnp.zeros((1, cfg.n_frames, BLOCK), jnp.float32)
        audio, _, _, _ = model.apply(
            {"params": params},
            batch["pitch"],
            batch["loudness"],
            batch["mfcc"],
            s0.enc_gru,
            s0.gru,
            s0.phase,
            zero_noise,
            method=model.streaming_step,
        )
        np.testing.assert_allclose(audio, out["harmonic_audio"], atol=1e-4)

    def test_streaming_synth_wrapper(self, ae_setup):
        """StreamingSynth drives an autoencoder stream: stateful step with
        mfcc frames; missing mfcc is rejected."""
        cfg, model, params, batch, x, rng = ae_setup
        synth = StreamingSynth(model, params, batch=1)
        fc = 8
        a1 = np.asarray(
            synth.step(batch["pitch"][:, :fc], batch["loudness"][:, :fc],
                       batch["mfcc"][:, :fc])
        )
        a2 = np.asarray(
            synth.step(batch["pitch"][:, :fc], batch["loudness"][:, :fc],
                       batch["mfcc"][:, :fc])
        )
        assert a1.shape == (1, fc * BLOCK)
        assert not np.allclose(a1, a2)  # state advanced
        with pytest.raises(ValueError, match="mfcc"):
            synth.step(batch["pitch"][:, :fc], batch["loudness"][:, :fc])

    def test_masked_step_keeps_inactive_encoder_state(self, ae_setup):
        """VoicePool primitive on an autoencoder stream: inactive rows keep
        the encoder GRU carry bit-exactly."""
        cfg, model, params, batch, x, rng = ae_setup
        synth = StreamingSynth(model, params, batch=2)
        f0 = jnp.tile(batch["pitch"][:, :8], (2, 1, 1))
        loud = jnp.tile(batch["loudness"][:, :8], (2, 1, 1))
        mf = jnp.tile(batch["mfcc"][:, :8], (2, 1, 1))
        state = synth.fresh_state()
        _, s1 = synth.step_stateless_masked(
            state, f0, loud, np.array([True, False]), mfcc_frames=mf
        )
        assert not np.allclose(np.asarray(s1.enc_gru[0]), 0.0)
        np.testing.assert_array_equal(np.asarray(s1.enc_gru[1]), 0.0)
        np.testing.assert_array_equal(np.asarray(s1.gru[1]), 0.0)
