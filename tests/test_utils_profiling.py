"""Utility + profiling-layer tests."""

import os

import numpy as np

from ddsp_pytorch_tpu.training.profiling import StepTimer
from ddsp_pytorch_tpu.utils import hz_to_midi, load_wav, midi_to_hz, save_wav


def test_hz_midi_roundtrip():
    freqs = np.array([55.0, 220.0, 440.0, 1760.0])
    np.testing.assert_allclose(midi_to_hz(hz_to_midi(freqs)), freqs, rtol=1e-6)
    assert hz_to_midi(440.0) == 69.0
    assert midi_to_hz(69.0) == 440.0


def test_wav_roundtrip(tmp_path, rng):
    sr = 16000
    audio = (0.5 * rng.standard_normal(sr)).astype(np.float32).clip(-1, 1)
    path = os.path.join(tmp_path, "x.wav")
    save_wav(path, audio, sr)
    back, back_sr = load_wav(path)
    assert back_sr == sr
    # 16-bit quantization + the 32767-write/32768-read scale convention
    np.testing.assert_allclose(back, audio, atol=1e-4)


def test_wav_resample_on_load(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    audio = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    path = os.path.join(tmp_path, "x.wav")
    save_wav(path, audio, sr)
    back, back_sr = load_wav(path, sample_rate=8000)
    assert back_sr == 8000
    assert abs(len(back) - sr // 2) <= 2
    # 440 Hz survives a 2x downsample
    spec = np.abs(np.fft.rfft(back))
    peak = np.fft.rfftfreq(len(back), 1 / 8000)[spec.argmax()]
    assert abs(peak - 440.0) < 5.0


def test_step_timer():
    import time

    timer = StepTimer(samples_per_step=100)
    assert timer.steps_per_s is None
    for _ in range(5):
        timer.mark()
        time.sleep(0.01)
    sps = timer.steps_per_s
    assert sps is not None and 20 < sps < 200
    assert timer.samples_per_s == sps * 100


def test_reconstruction_report_builds(rng):
    """The diagnostic figure builds from a plausible output dict."""
    import jax.numpy as jnp

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.training.reports import reconstruction_report

    cfg = Config.from_dict(
        {
            "preprocess": {"sample_rate": 16000, "signal_length": 2048,
                           "block_size": 64},
            "train": {"scales": [256, 128], "overlap": 0.75},
        }
    )
    f, bins_a, frames_a = 32, 129, 33
    out = {
        "sig_stft": [jnp.ones((1, s // 2 + 1, 1 + 2048 // (s // 4)))
                     for s in (256, 128)],
        "rec_stft": [jnp.ones((1, s // 2 + 1, 1 + 2048 // (s // 4)))
                     for s in (256, 128)],
        "f0": jnp.full((1, f, 1), 220.0),
        "loudness": jnp.zeros((1, f, 1)),
        "noise_ctrls": {"magnitudes": jnp.ones((1, f, 9))},
        "harmonic_ctrls": {"harmonic_distribution": jnp.ones((1, f, 8)) / 8},
    }
    fig = reconstruction_report(out, cfg)
    assert fig is not None
    import matplotlib.pyplot as plt

    plt.close(fig)
