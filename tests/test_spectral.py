"""Golden tests for ops/spectral.py against torch.stft and closed forms."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ddsp_pytorch_tpu.ops import (
    frame_signal,
    hann_window,
    mel_filterbank,
    dct_matrix,
    mfcc,
    multiscale_fft,
    power_to_db,
    stft,
)


def test_hann_window_matches_torch():
    for n in (16, 128, 1024):
        np.testing.assert_allclose(
            hann_window(n), torch.hann_window(n).numpy(), rtol=1e-5, atol=1e-6
        )


def test_frame_signal_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 100)).astype(np.float32))
    frames = frame_signal(x, 16, 4)
    assert frames.shape == (2, 1 + (100 - 16) // 4, 16)
    np.testing.assert_allclose(frames[:, 0], x[:, :16])
    np.testing.assert_allclose(frames[:, 1], x[:, 4:20])


@pytest.mark.parametrize("n_fft,overlap", [(256, 0.75), (128, 0.5), (1024, 0.75)])
def test_stft_matches_torch_stft(rng, n_fft, overlap):
    """The spectral loss's STFT must match torch.stft(center=True,
    normalized=True, hann, reflect pad) — the reference loss backbone
    (ddsp/core.py:27-41)."""
    t = 8192
    hop = int(n_fft * (1 - overlap))
    x = rng.standard_normal((2, t)).astype(np.float32)
    got = stft(jnp.asarray(x), n_fft, hop, magnitude=True)

    want = torch.stft(
        torch.tensor(x),
        n_fft,
        hop,
        n_fft,
        torch.hann_window(n_fft),
        True,  # center
        normalized=True,
        return_complex=True,
    ).abs().numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-5)


def test_multiscale_fft_layout(rng):
    x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    scales = [512, 256, 128]
    mags = multiscale_fft(x, scales, 0.75)
    assert len(mags) == 3
    for s, m in zip(scales, mags):
        hop = int(s * 0.25)
        assert m.shape == (2, s // 2 + 1, 1 + 4096 // hop)


def test_stft_parseval_sine():
    """A pure sine's STFT magnitude peaks at its frequency bin."""
    sr, n_fft = 16000, 512
    t = np.arange(8192) / sr
    freq = 1000.0
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)[None]
    mag = np.asarray(stft(jnp.asarray(x), n_fft, 128, magnitude=True))[0]
    peak_bin = mag.mean(-1).argmax()
    assert abs(peak_bin - round(freq / sr * n_fft)) <= 1


# ------------------------------------------------------------------ mel/mfcc


def _librosa_oracle_available():
    try:
        import librosa  # noqa: F401

        return True
    except ImportError:
        return False


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 1024, 64, 20.0, 8000.0)
    assert fb.shape == (64, 513)
    assert np.all(fb >= 0)
    # every filter has support; triangles overlap neighbors
    assert np.all(fb.sum(-1) > 0)
    # Slaney normalization: each filter integrates to ~2/bandwidth; peak
    # positions are monotonically increasing
    peaks = fb.argmax(-1)
    assert np.all(np.diff(peaks) >= 0)


def test_dct_matrix_orthonormal():
    m = dct_matrix(128, 128)
    np.testing.assert_allclose(m @ m.T, np.eye(128), atol=1e-4)

    # matches scipy orthonormal DCT-II
    from scipy.fftpack import dct as scipy_dct

    x = np.random.default_rng(0).standard_normal(128).astype(np.float32)
    np.testing.assert_allclose(
        m @ x, scipy_dct(x, type=2, norm="ortho"), rtol=1e-4, atol=1e-4
    )


def test_power_to_db_semantics():
    s = jnp.asarray(np.array([[1.0, 0.1, 1e-12]]))
    out = np.asarray(power_to_db(s[None]))[0]
    # ref=1.0 → 0 dB at power 1; clamp at max-80
    np.testing.assert_allclose(out[0, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(out[0, 1], -10.0, atol=1e-4)
    assert out[0, 2] == pytest.approx(-80.0, abs=1e-4)


def test_mfcc_shapes_and_determinism(rng):
    sr, block = 16000, 256
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    m = mfcc(jnp.asarray(x), sr, n_mfcc=30, n_fft=1024, hop_length=block)
    assert m.shape == (2, 1 + 8192 // block, 30)
    m2 = mfcc(jnp.asarray(x), sr, n_mfcc=30, n_fft=1024, hop_length=block)
    np.testing.assert_allclose(m, m2)


def test_mfcc_discriminates_tones():
    """MFCCs of different timbres (harmonic series vs noise) must differ."""
    sr = 16000
    t = np.arange(16384) / sr
    tone = sum(np.sin(2 * np.pi * 220 * k * t) / k for k in range(1, 8))
    noise = np.random.default_rng(1).standard_normal(len(t))
    m1 = np.asarray(mfcc(jnp.asarray(tone[None], jnp.float32), sr, hop_length=256))
    m2 = np.asarray(mfcc(jnp.asarray(noise[None], jnp.float32), sr, hop_length=256))
    assert np.abs(m1.mean(1) - m2.mean(1)).max() > 5.0
