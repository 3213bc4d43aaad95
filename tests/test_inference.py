"""Offline timbre transfer: controls extraction + re-rendering."""

import os

import numpy as np
import pytest

from ddsp_pytorch_tpu.inference import extract_controls, timbre_transfer


def test_extract_controls_shapes_and_values():
    sr, block = 16000, 256
    t = np.arange(2 * sr) / sr
    x = (0.4 * np.sin(2 * np.pi * 261.6 * t)).astype(np.float32)
    f0, loud = extract_controls(x, sr, block)
    assert f0.shape == loud.shape == (2 * sr // block,)
    np.testing.assert_allclose(np.median(f0[8:-8]), 261.6, rtol=0.02)
    assert np.all(np.isfinite(loud))


@pytest.mark.slow
def test_timbre_transfer_end_to_end(tmp_path):
    """Train a tiny model, export it, and re-render a tone through it —
    output is finite, correct length, and pitched at the (shifted) input."""
    from tests.test_export_runtime import _train_tiny

    from ddsp_pytorch_tpu.export import export_run
    from ddsp_pytorch_tpu.ops import extract_pitch

    run_dir, cfg = _train_tiny(tmp_path)
    bundle = export_run(run_dir, os.path.join(tmp_path, "export"), name="t")

    sr, block = 16000, 128
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)

    out = timbre_transfer(bundle, x, sr, include_reverb=False)
    f = len(x) // block
    assert out.shape == (f * block,)
    assert np.all(np.isfinite(out))

    # harmonic output follows the input pitch (decoder is untrained noise,
    # but the oscillator bank is driven by the extracted f0)
    f0_out = np.asarray(extract_pitch(out, sr, block))[8:-8]
    np.testing.assert_allclose(np.median(f0_out), 220.0, rtol=0.03)

    # octave shift transposes
    out2 = timbre_transfer(bundle, x, sr, octave_shift=1.0, include_reverb=False)
    f0_out2 = np.asarray(extract_pitch(out2, sr, block))[8:-8]
    np.testing.assert_allclose(np.median(f0_out2), 440.0, rtol=0.03)


@pytest.mark.slow
def test_timbre_transfer_autoencoder(tmp_path):
    """Autoencoder bundles re-render too: z comes from the input audio's
    MFCCs under the bundle's frozen feature geometry."""
    from tests.test_export_runtime import _train_tiny_ae

    from ddsp_pytorch_tpu.export import export_run
    from ddsp_pytorch_tpu.ops import extract_pitch

    run_dir, cfg = _train_tiny_ae(tmp_path)
    bundle = export_run(run_dir, os.path.join(tmp_path, "export"), name="tae")

    sr, block = 16000, 128
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    out = timbre_transfer(bundle, x, sr, include_reverb=False)
    f = len(x) // block
    assert out.shape == (f * block,)
    assert np.all(np.isfinite(out))
    f0_out = np.asarray(extract_pitch(out, sr, block))[8:-8]
    np.testing.assert_allclose(np.median(f0_out), 220.0, rtol=0.03)


def test_extract_controls_custom_pitch_fn():
    """timbre_transfer routes pitch through the bundle's frozen tracker
    via the pitch_fn hook (make_pitch_fn contract) — the hook must win
    over the default YIN path and keep the length contract."""
    sr, block = 16000, 128
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)

    calls = {}

    def fake_pitch(row, sample_rate, block_size):
        calls["args"] = (len(row), sample_rate, block_size)
        return np.full(len(row) // block_size, 123.0, np.float32)

    f0, loud = extract_controls(x, sr, block, pitch_fn=fake_pitch)
    assert calls["args"] == (len(x) // block * block, sr, block)
    assert f0.shape == loud.shape == (len(x) // block,)
    np.testing.assert_allclose(f0, 123.0)
