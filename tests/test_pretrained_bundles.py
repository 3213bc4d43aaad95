"""Committed pretrained artifacts stay loadable and sane.

The reference ships pretrained saxophone/violin TorchScript artifacts
(README.md:46-49) with no automated check that they still load; here every
bundle committed under pretrained/ is loaded through the same constructor
the serving/C++ paths use (export.make_stream_session) and rendered for a
few blocks, so a format or code change that silently orphans the shipped
artifacts fails the suite instead of a user.
"""

import glob
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUNDLES = sorted(glob.glob(os.path.join(REPO, "pretrained", "ddsp_*_bundle")))
CREPE = os.path.join(REPO, "pretrained", "crepe_tiny.msgpack")


@pytest.mark.slow
@pytest.mark.parametrize("bundle", BUNDLES, ids=[os.path.basename(b) for b in BUNDLES])
def test_bundle_loads_and_renders(bundle):
    import json

    from ddsp_pytorch_tpu.export import make_stream_session

    with open(os.path.join(bundle, "meta.json")) as f:
        meta = json.load(f)
    assert meta["model"]["name"] in ("single-inst-decoder", "mfcc-autoencoder")

    session = make_stream_session(bundle)
    n = 4 * session.block_size
    pitch = np.full((1, n), 220.0, np.float32)
    # in-distribution loudness: the baked dataset mean (export.py:29-30
    # parity — stats live inside the bundle)
    synth = getattr(session, "synth", session)
    loud = np.full((1, n), synth.mean_loudness, np.float32)
    if session.needs_audio:
        audio_in = (0.1 * np.sin(2 * np.pi * 220.0 / session.sample_rate
                                 * np.arange(n, dtype=np.float32)))
        out = session.step_samples(pitch[0], loud[0], audio_in)
        out = np.asarray(out).reshape(-1)
    else:
        out = np.asarray(session.step_samples(pitch, loud)).reshape(-1)
    assert out.shape == (n,)
    assert np.all(np.isfinite(out))
    # at the training-mean loudness the instrument must actually sound
    assert float(np.sqrt((out[session.block_size:] ** 2).mean())) > 1e-4

    # the rendered reverb impulse ships next to the bundle (README.md:99)
    name = os.path.basename(bundle)[len("ddsp_"):-len("_bundle")]
    impulse = os.path.join(REPO, "pretrained", f"ddsp_{name}_impulse.wav")
    if meta["model"]["kwargs"].get("has_reverb"):
        assert os.path.exists(impulse), f"missing {impulse}"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(CREPE), reason="no trained crepe")
def test_crepe_tiny_tracks_a_tone():
    from flax import serialization

    from ddsp_pytorch_tpu.models.crepe import extract_pitch_crepe

    with open(CREPE, "rb") as fh:
        bundle = serialization.msgpack_restore(bytearray(fh.read()))
    sr, block, f0 = 16000, 256, 220.0
    t = np.arange(4 * sr, dtype=np.float32) / sr
    tone = (0.5 * np.sin(2 * np.pi * f0 * t)
            + 0.2 * np.sin(2 * np.pi * 2 * f0 * t)).astype(np.float32)
    track = np.asarray(extract_pitch_crepe(tone, sr, block, bundle))
    assert track.shape == (len(tone) // block,)
    med = float(np.median(track[5:-5]))
    assert abs(med - f0) / f0 < 0.05, med
