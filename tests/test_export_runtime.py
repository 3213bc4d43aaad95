"""Export bundle + native runtime binding tests."""

import os

import jax
import numpy as np
import pytest

from ddsp_pytorch_tpu.config import Config


def _train_tiny_ae(tmp_path, steps=2):
    """Tiny mfcc-autoencoder run with a streamable MFCC geometry
    (n_fft = 2*hop) and the fixed causal dB floor frozen into the config."""
    from ddsp_pytorch_tpu.data import Datamodule, make_synthetic_dataset
    from ddsp_pytorch_tpu.training import Trainer

    sr, block, n_fft = 16000, 128, 256
    cache = os.path.join(tmp_path, "cache")
    make_synthetic_dataset(
        cache, n_items=2, sample_rate=sr, signal_length=4096,
        block_size=block, n_harmonic=4, mfcc_n_fft=n_fft, n_mels=40,
        mfcc_ref_db=0.0,
    )
    cfg = Config.from_dict(
        {
            "preprocess": {
                "sample_rate": sr,
                "signal_length": 4096,
                "block_size": block,
                "out_dir": cache,
                "mfcc_n_fft": n_fft,
                "n_mels": 40,
                "mfcc_ref_db": 0.0,
            },
            "model": {
                "name": "mfcc-autoencoder",
                "kwargs": {
                    "hidden_size": 32,
                    "n_harmonic": 4,
                    "n_bands": 9,
                    "sample_rate": sr,
                    "block_size": block,
                    "has_reverb": False,
                    "use_pallas": "never",
                },
            },
            "train": {"scales": [256, 128], "batch": 2, "steps": steps,
                      "checkpoint_every_steps": 2},
        }
    )
    run_dir = os.path.join(tmp_path, "run")
    dm = Datamodule(cfg)
    dm.setup()
    trainer = Trainer(cfg, run_dir, use_tensorboard=False)
    trainer.fit(dm)
    trainer.close()
    return run_dir, cfg


def _train_tiny(tmp_path, steps=4):
    from ddsp_pytorch_tpu.data import Datamodule, make_synthetic_dataset
    from ddsp_pytorch_tpu.training import Trainer

    cache = os.path.join(tmp_path, "cache")
    make_synthetic_dataset(
        cache, n_items=2, sample_rate=16000, signal_length=4096, block_size=128,
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
                    "hidden_size": 32,
                    "n_harmonic": 4,
                    "n_bands": 9,
                    "sample_rate": 16000,
                    "block_size": 128,
                    "has_reverb": True,
                    "use_pallas": "never",
                },
            },
            "train": {
                "scales": [256, 128],
                "batch": 2,
                "steps": steps,
                "checkpoint_every_steps": 2,
            },
        }
    )
    run_dir = os.path.join(tmp_path, "run")
    dm = Datamodule(cfg)
    dm.setup()
    trainer = Trainer(cfg, run_dir, use_tensorboard=False)
    try:
        trainer.fit(dm)
    finally:
        trainer.close()
    return run_dir, cfg


@pytest.mark.slow
def test_export_and_load_roundtrip(tmp_path):
    from ddsp_pytorch_tpu.export import export_run, load_bundle, make_streaming_synth

    run_dir, cfg = _train_tiny(tmp_path)
    out_dir = os.path.join(tmp_path, "export")
    bundle = export_run(run_dir, out_dir, name="tiny")

    assert os.path.exists(os.path.join(bundle, "params.msgpack"))
    assert os.path.exists(os.path.join(bundle, "meta.json"))
    assert os.path.exists(os.path.join(out_dir, "ddsp_tiny_impulse.wav"))
    assert os.path.exists(os.path.join(out_dir, "ddsp_tiny_config.yaml"))

    model, params, config = load_bundle(bundle)
    assert config.model.kwargs["hidden_size"] == 32
    # loudness stats must have been baked in (export.py:29-30 parity)
    assert config.data.mean_loudness is not None

    synth = make_streaming_synth(bundle)
    n = 4 * 128
    audio = np.asarray(
        synth.step_samples(
            np.full((1, n), 220.0, np.float32), np.zeros((1, n), np.float32)
        )
    )
    assert audio.shape == (1, n)
    assert np.all(np.isfinite(audio))


@pytest.mark.slow
def test_export_warns_on_floorless_autoencoder(tmp_path):
    """Exporting an mfcc-autoencoder whose frozen config has
    mfcc_ref_db=None (librosa's anti-causal global-max floor at train
    time, floorless causal StreamingMFCC live) warns; with the fixed
    floor (configs/autoencoder.yaml default) it does not."""
    import warnings

    import yaml

    from ddsp_pytorch_tpu.export import export_run

    run_dir, cfg = _train_tiny_ae(tmp_path)

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # fixed ref_db: no warning expected
        export_run(run_dir, os.path.join(tmp_path, "export_ok"), name="ok")

    frozen = os.path.join(run_dir, "config.yaml")
    with open(frozen) as f:
        raw = yaml.safe_load(f)
    raw["preprocess"]["mfcc_ref_db"] = None
    with open(frozen, "w") as f:
        yaml.safe_dump(raw, f)
    with pytest.warns(UserWarning, match="mfcc_ref_db"):
        export_run(run_dir, os.path.join(tmp_path, "export_warn"), name="warn")


@pytest.mark.slow
def test_exported_impulse_dry_tap(tmp_path):
    from ddsp_pytorch_tpu.export import export_run
    from ddsp_pytorch_tpu.utils.audio_io import load_wav

    run_dir, cfg = _train_tiny(tmp_path)
    out_dir = os.path.join(tmp_path, "export")
    export_run(run_dir, out_dir, name="tiny")
    ir, sr = load_wav(os.path.join(out_dir, "ddsp_tiny_impulse.wav"))
    assert sr == 16000
    assert abs(ir[0] - 1.0) < 2e-2  # dry tap ≈ 1 (16-bit quantized)


def _stream_lib_available():
    from ddsp_pytorch_tpu.runtime import _find_library

    if _find_library() is not None:
        return True
    try:
        from ddsp_pytorch_tpu.runtime import build_runtime

        build_runtime()
        return _find_library() is not None
    except Exception:
        return False


@pytest.mark.skipif(not _stream_lib_available(), reason="native lib unavailable")
def test_stream_engine_pipeline_invariant():
    """The ctypes-bound C++ engine delays by exactly 2 blocks."""
    import time

    from ddsp_pytorch_tpu.runtime import StreamEngine

    block, tick, n_ticks = 64, 32, 32

    def render(pitch, loud):
        return pitch * 2.0

    with StreamEngine(block, render) as eng:
        assert eng.latency == 2 * block
        sig = np.arange(n_ticks * tick, dtype=np.float32)
        out = np.zeros_like(sig)
        for t in range(n_ticks):
            sl = slice(t * tick, (t + 1) * tick)
            out[sl] = eng.process(sig[sl], np.zeros(tick, np.float32))
            time.sleep(0.001)
        assert eng.underruns == 0
    np.testing.assert_allclose(out[2 * block :], 2.0 * sig[: -2 * block])


@pytest.mark.skipif(not _stream_lib_available(), reason="native lib unavailable")
def test_stream_engine_rejects_bad_tick():
    from ddsp_pytorch_tpu.runtime import StreamEngine

    with StreamEngine(64, lambda p, l: p) as eng:
        with pytest.raises(ValueError):
            eng.process(np.zeros(48, np.float32), np.zeros(48, np.float32))


def _model_lib():
    import ddsp_pytorch_tpu.runtime as rt

    p = os.path.join(os.path.dirname(rt.__file__), "build", "libddsp_model.so")
    return p if os.path.exists(p) else None


@pytest.mark.slow
@pytest.mark.skipif(_model_lib() is None, reason="libddsp_model.so not built")
def test_model_host_perform_audio(tmp_path):
    """The embedded C host drives an mfcc-autoencoder bundle through
    ddsp_model_perform_audio: needs_audio is advertised, the audio-less
    perform is refused, and the rendered stream equals the Python session
    (same bundle, same seed, same schedule) exactly."""
    import ctypes

    from ddsp_pytorch_tpu.export import export_run, make_stream_session

    run_dir, cfg = _train_tiny_ae(tmp_path)
    bundle = export_run(run_dir, os.path.join(tmp_path, "export"), name="ch")

    lib = ctypes.CDLL(_model_lib())
    lib.ddsp_runtime_init.argtypes = [ctypes.c_char_p]
    lib.ddsp_model_load.restype = ctypes.c_void_p
    lib.ddsp_model_load.argtypes = [ctypes.c_char_p]
    fp = ctypes.POINTER(ctypes.c_float)
    lib.ddsp_model_perform.argtypes = [ctypes.c_void_p, fp, fp, fp,
                                       ctypes.c_int]
    lib.ddsp_model_perform_audio.argtypes = [ctypes.c_void_p, fp, fp, fp, fp,
                                             ctypes.c_int]
    lib.ddsp_model_needs_audio.argtypes = [ctypes.c_void_p]
    lib.ddsp_model_block_size.argtypes = [ctypes.c_void_p]
    lib.ddsp_model_free.argtypes = [ctypes.c_void_p]

    assert lib.ddsp_runtime_init(None) == 0
    m = lib.ddsp_model_load(bundle.encode())
    assert m, "embedded host failed to load the bundle"
    try:
        block = lib.ddsp_model_block_size(m)
        assert block == cfg.preprocess.block_size
        assert lib.ddsp_model_needs_audio(m) == 1

        sr = cfg.preprocess.sample_rate
        n = block
        t = np.arange(4 * block) / sr
        audio_in = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        pitch = np.full(4 * block, 220.0, np.float32)
        loud = np.zeros(4 * block, np.float32)

        def ptr(a):
            return a.ctypes.data_as(fp)

        out = np.zeros(n, np.float32)
        # audio-less perform is refused for autoencoder bundles
        assert lib.ddsp_model_perform(m, ptr(pitch), ptr(loud), ptr(out),
                                      n) != 0

        session = make_stream_session(bundle)  # python twin, same seed 0
        for k in range(4):
            sl = slice(k * block, (k + 1) * block)
            rc = lib.ddsp_model_perform_audio(
                m, ptr(pitch[sl].copy()), ptr(loud[sl].copy()),
                ptr(audio_in[sl].copy()), ptr(out), n)
            assert rc == 0
            expect = session.step_samples(pitch[sl], loud[sl], audio_in[sl])
            if k == 0:
                np.testing.assert_array_equal(out, 0.0)
            np.testing.assert_allclose(out, expect, atol=1e-5)
    finally:
        lib.ddsp_model_free(m)
