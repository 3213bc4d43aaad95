"""Long-form time-sharded synthesis: sharded pipeline == single-device model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_pytorch_tpu.config import Config
from ddsp_pytorch_tpu.models import load_model
from ddsp_pytorch_tpu.parallel import make_mesh
from ddsp_pytorch_tpu.parallel.longform import LongFormSynthesizer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def setup():
    cfg = Config.from_dict(
        {
            "preprocess": {"sample_rate": 16000, "signal_length": 8192,
                           "block_size": 64},
            "model": {
                "name": "single-inst-decoder",
                "kwargs": {
                    "hidden_size": 32,
                    "n_harmonic": 8,
                    "n_bands": 9,
                    "sample_rate": 16000,
                    "block_size": 64,
                    "has_reverb": True,
                    "use_pallas": "never",
                },
            },
        }
    )
    model = load_model(cfg)
    rng = np.random.default_rng(0)
    b, f = 4, 128
    f0 = jnp.asarray(rng.uniform(150, 350, (b, f, 1)).astype(np.float32))
    loud = jnp.asarray(rng.standard_normal((b, f, 1)).astype(np.float32))
    init_batch = {
        "sig": jnp.zeros((b, f * 64), jnp.float32),
        "pitch": f0,
        "loudness": loud,
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        init_batch,
    )["params"]
    return cfg, model, params, f0, loud


def test_longform_matches_single_device(setup):
    """(data=2, time=4)-sharded long-form synthesis == the unsharded model
    on the same controls and noise.  The reverb (1 s IR over the whole
    signal) exercises the multi-hop overlap-scatter path."""
    cfg, model, params, f0, loud = setup
    mesh = make_mesh(data=2, time=4)
    lf = LongFormSynthesizer(model, params, mesh, use_pallas="never")
    rng = jax.random.PRNGKey(7)
    sharded_audio = lf.synthesize(f0, loud, rng=rng)

    # single-device oracle: run the same control path + same noise
    hc, nc = model.apply(
        {"params": params}, f0, loud, method=model.frame_controls
    )
    amp = hc["harmonic_distribution"] * hc["amplitudes"]
    from ddsp_pytorch_tpu.ops import (
        fft_convolve,
        filtered_noise,
        harmonic_synth_frames,
    )

    b, f = f0.shape[0], f0.shape[1]
    noise = jax.random.uniform(rng, (b, f, 64), jnp.float32) * 2.0 - 1.0
    harm = harmonic_synth_frames(f0[..., 0], amp, 64, 16000, use_pallas="never")
    noi = filtered_noise(nc["magnitudes"], 64, None, noise=noise)
    dry = harm + noi
    from ddsp_pytorch_tpu.models.modules import Reverb

    reverb = Reverb(16000, 16000)
    ir = reverb.apply({"params": params["reverb"]}, method=reverb.build_impulse)
    t = dry.shape[-1]
    ir_use = ir[:t] if t < 16000 else jnp.pad(ir, (0, t - 16000))
    want = fft_convolve(dry, ir_use[None, :])

    np.testing.assert_allclose(
        np.asarray(sharded_audio), np.asarray(want), atol=2e-3
    )


def test_longform_output_is_sharded(setup):
    cfg, model, params, f0, loud = setup
    mesh = make_mesh(data=2, time=4)
    lf = LongFormSynthesizer(model, params, mesh, include_reverb=False)
    audio = lf.synthesize(f0, loud)
    assert audio.shape == (4, 128 * 64)
    # the result must actually live sharded over the mesh
    assert len(audio.sharding.device_set) == 8


def test_longform_autoencoder_matches_single_device():
    """mfcc-autoencoder long-form: the encoder joins the data-parallel
    controls stage and the time-sharded DSP output equals the unsharded
    pipeline (no reference analogue: its autoencoder is offline-only)."""
    from ddsp_pytorch_tpu.ops import (
        filtered_noise,
        harmonic_synth_frames,
        mfcc as mfcc_op,
    )

    cfg = Config.from_dict(
        {
            "preprocess": {"sample_rate": 16000, "signal_length": 8192,
                           "block_size": 64, "mfcc_n_fft": 128,
                           "n_mels": 40, "mfcc_ref_db": 0.0},
            "model": {
                "name": "mfcc-autoencoder",
                "kwargs": {
                    "hidden_size": 32,
                    "n_harmonic": 8,
                    "n_bands": 9,
                    "sample_rate": 16000,
                    "block_size": 64,
                    "has_reverb": False,
                    "use_pallas": "never",
                },
            },
        }
    )
    model = load_model(cfg)
    rng = np.random.default_rng(3)
    b, f, block = 4, 128, 64
    f0 = jnp.asarray(rng.uniform(150, 350, (b, f, 1)).astype(np.float32))
    loud = jnp.asarray(rng.standard_normal((b, f, 1)).astype(np.float32))
    sig = rng.standard_normal((b, f * block)).astype(np.float32) * 0.3
    mf = mfcc_op(jnp.asarray(sig), 16000, n_fft=128, hop_length=block,
                 n_mels=40, ref_db=0.0)[:, :f]
    init_batch = {"sig": jnp.asarray(sig), "pitch": f0, "loudness": loud,
                  "mfcc": mf}
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        init_batch,
    )["params"]

    mesh = make_mesh(data=2, time=4)
    lf = LongFormSynthesizer(model, params, mesh, use_pallas="never")
    key = jax.random.PRNGKey(5)
    with pytest.raises(ValueError, match="mfcc"):
        lf.synthesize(f0, loud)
    sharded_audio = lf.synthesize(f0, loud, mfcc=mf, rng=key)
    assert len(sharded_audio.sharding.device_set) == 8

    hc, nc = model.apply(
        {"params": params}, f0, loud, mf, method=model.frame_controls
    )
    amp = hc["harmonic_distribution"] * hc["amplitudes"]
    noise = jax.random.uniform(key, (b, f, block), jnp.float32) * 2.0 - 1.0
    harm = harmonic_synth_frames(f0[..., 0], amp, block, 16000,
                                 use_pallas="never")
    noi = filtered_noise(nc["magnitudes"], block, None, noise=noise)
    np.testing.assert_allclose(
        np.asarray(sharded_audio), np.asarray(harm + noi), atol=2e-3
    )


def test_longform_pallas_interpret_path(setup):
    """LongFormSynthesizer with use_pallas='interpret': the PALLAS kernel
    wiring through the production shard_map on the CPU mesh (regression:
    the interpret flag once reached sharded_harmonic_synth but the
    surrounding shard_map kept check_vma=True, which JAX's interpreter
    trips over).  Matches the XLA-path synthesizer to kernel tolerance."""
    cfg, model, params, f0, loud = setup
    mesh = make_mesh(data=2, time=4)
    rng = jax.random.PRNGKey(7)
    want = LongFormSynthesizer(model, params, mesh, use_pallas="never").synthesize(
        f0, loud, rng=rng
    )
    got = LongFormSynthesizer(
        model, params, mesh, use_pallas="interpret"
    ).synthesize(f0, loud, rng=rng)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
