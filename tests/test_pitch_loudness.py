"""Pitch tracker and loudness feature tests.

Loudness is checked against an inline numpy re-statement of the reference
formula (A-weighted log-magnitude mean, ddsp/core.py:81-97); pitch against
synthetic tones with known f0.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_pytorch_tpu.ops import a_weighting, extract_loudness, extract_pitch
from ddsp_pytorch_tpu.ops.loudness import fft_frequencies


def test_a_weighting_known_values():
    """IEC A-weighting: 0 dB at 1 kHz (by construction), ~ -19.1 dB at
    100 Hz, ~ +1.3 dB at 2 kHz, ~ -9.3 dB at 20 kHz."""
    freqs = np.array([100.0, 1000.0, 2000.0, 20000.0])
    w = a_weighting(freqs)
    assert w[1] == pytest.approx(0.0, abs=0.2)
    assert w[0] == pytest.approx(-19.1, abs=0.5)
    assert w[2] == pytest.approx(1.2, abs=0.5)
    assert w[3] == pytest.approx(-9.3, abs=0.7)


def test_a_weighting_dc_clamped():
    assert a_weighting(np.array([0.0]))[0] == -80.0


def test_extract_loudness_shape_and_monotonicity(rng):
    sr, block = 16000, 256
    t = np.arange(sr) / sr
    quiet = 0.01 * np.sin(2 * np.pi * 440 * t)
    loud = 1.0 * np.sin(2 * np.pi * 440 * t)
    l_quiet = np.asarray(extract_loudness(jnp.asarray(quiet, jnp.float32)[None], sr, block))
    l_loud = np.asarray(extract_loudness(jnp.asarray(loud, jnp.float32)[None], sr, block))
    assert l_quiet.shape == (1, sr // block)
    # 40 dB amplitude ratio = log(100) ≈ 4.6 nats at the tone bins; the
    # 1e-7 epsilon floor (reference core.py:89) truncates the quiet
    # signal's leakage bins, so the mean difference lands below log(100)
    # but must stay large and uniform.
    mid = slice(10, -10)
    diff = (l_loud - l_quiet)[0, mid]
    assert diff.min() > 2.5
    assert diff.max() <= np.log(100.0) + 0.1


def test_extract_loudness_a_weighting_applied():
    """A ~105 Hz tone must read quieter than a ~1 kHz tone of equal
    amplitude — the A-weighting curve.  Both tones sit exactly between STFT
    bins so their leakage profiles match and the comparison isolates the
    weighting (an on-bin tone has near-zero leakage and a wildly different
    mean log-magnitude)."""
    sr, block, n_fft = 16000, 256, 2048
    t = np.arange(2 * sr) / sr
    f_low = 13.5 * sr / n_fft  # ≈ 105 Hz, mid-bin
    f_ref = 128.5 * sr / n_fft  # ≈ 1004 Hz, mid-bin
    low = np.sin(2 * np.pi * f_low * t).astype(np.float32)
    ref = np.sin(2 * np.pi * f_ref * t).astype(np.float32)
    l_low = np.asarray(extract_loudness(jnp.asarray(low)[None], sr, block)).mean()
    l_ref = np.asarray(extract_loudness(jnp.asarray(ref)[None], sr, block)).mean()
    assert l_low < l_ref - 0.3


def test_extract_loudness_matches_numpy_oracle(rng):
    """Exact parity with the reference formula, stated inline in numpy."""
    sr, block, n_fft = 16000, 256, 1024
    x = rng.standard_normal((sr // 2,)).astype(np.float32)

    got = np.asarray(extract_loudness(jnp.asarray(x)[None], sr, block, n_fft))[0]

    # oracle: center-reflect-pad STFT, hann periodic, natural-log magnitude
    pad = n_fft // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + len(x) // block
    win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    frames = np.stack([xp[i * block : i * block + n_fft] * win for i in range(n_frames)])
    S = np.abs(np.fft.rfft(frames, axis=-1)).T  # (bins, frames)
    S = np.log(S + 1e-7)
    S = S + a_weighting(fft_frequencies(sr, n_fft)).reshape(-1, 1)
    want = S.mean(0)[:-1]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


# ------------------------------------------------------------------- pitch


@pytest.mark.parametrize("freq", [110.0, 220.0, 440.0, 880.0])
def test_extract_pitch_pure_tone(freq):
    sr, block = 16000, 256
    t = np.arange(2 * sr) / sr
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    f0 = np.asarray(extract_pitch(x, sr, block))
    assert f0.shape == (len(x) // block,)
    mid = f0[8:-8]
    np.testing.assert_allclose(mid, freq, rtol=0.01)


def test_extract_pitch_harmonic_tone_no_octave_error(rng):
    """Rich harmonic spectrum (strong 2nd harmonic) still tracks the
    fundamental — the classic octave-error trap the Viterbi pass prevents."""
    sr, block = 16000, 256
    t = np.arange(2 * sr) / sr
    f = 196.0
    x = (
        0.5 * np.sin(2 * np.pi * f * t)
        + 1.0 * np.sin(2 * np.pi * 2 * f * t)
        + 0.3 * np.sin(2 * np.pi * 3 * f * t)
    ).astype(np.float32)
    f0 = np.asarray(extract_pitch(x, sr, block))[8:-8]
    np.testing.assert_allclose(f0, f, rtol=0.02)


def test_extract_pitch_glissando_tracks():
    """A slow linear glide is tracked within 3%."""
    sr, block = 16000, 256
    dur = 2.0
    t = np.arange(int(dur * sr)) / sr
    f_start, f_end = 220.0, 440.0
    inst_f = f_start + (f_end - f_start) * t / dur
    phase = 2 * np.pi * np.cumsum(inst_f) / sr
    x = np.sin(phase).astype(np.float32)
    f0 = np.asarray(extract_pitch(x, sr, block))
    frames = len(f0)
    expect = f_start + (f_end - f_start) * (np.arange(frames) * block / sr) / dur
    mid = slice(8, frames - 8)
    np.testing.assert_allclose(f0[mid], expect[mid], rtol=0.03)


def test_extract_pitch_with_noise():
    sr, block = 16000, 256
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 330 * t) + 0.1 * np.random.default_rng(0).standard_normal(
        len(t)
    )
    f0 = np.asarray(extract_pitch(x.astype(np.float32), sr, block))[8:-8]
    np.testing.assert_allclose(f0, 330.0, rtol=0.02)
