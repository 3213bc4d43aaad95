"""CREPE-architecture pitch tracker tests (models/crepe.py).

Role parity with the reference's pitch path (ddsp/core.py:100-119: CREPE at
16 kHz, viterbi decode, length contract T → T//block_size).  The model here
is trained from scratch on synthetic tones (scripts/train_crepe.py); tests
pin the architecture shapes, the cents codec, the decode math, the resampler
and a micro end-to-end learning check.
"""

import math
import sys
from os import path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_pytorch_tpu.models.crepe import (
    CAPACITIES,
    CENTS_PER_BIN,
    FRAME_LENGTH,
    MODEL_SRATE,
    N_BINS,
    CREPE,
    cents_grid,
    cents_to_hz,
    extract_pitch_crepe,
    hz_to_cents,
    resample_to_model_rate,
    salience_to_cents,
    viterbi_cents,
)

sys.path.insert(0, path.join(path.dirname(__file__), "..", "scripts"))


def _init(capacity="micro", batch=2):
    model = CREPE(capacity=capacity)
    rng = jax.random.PRNGKey(0)
    frames = jax.random.normal(rng, (batch, FRAME_LENGTH))
    variables = model.init({"params": rng, "dropout": rng}, frames, train=True)
    return model, variables, frames


def test_architecture_shapes():
    """360 logits out; conv stack spatial dims land at 4 (CREPE's flatten
    size 4·filters — paper table 1)."""
    model, variables, frames = _init()
    logits = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        frames,
    )
    assert logits.shape == (2, N_BINS)
    assert logits.dtype == jnp.float32
    # classifier input = 4 spatial × (16·mult) channels
    kernel = variables["params"]["classifier"]["kernel"]
    assert kernel.shape == (4 * 16 * CAPACITIES["micro"], N_BINS)


def test_cents_codec_roundtrip():
    f0 = np.array([32.70319566, 55.0, 440.0, 1975.5])
    np.testing.assert_allclose(
        np.asarray(cents_to_hz(hz_to_cents(jnp.asarray(f0)))), f0, rtol=1e-6
    )
    # bin 0 is C1; grid spacing is 20 cents
    grid = cents_grid()
    np.testing.assert_allclose(float(cents_to_hz(grid[0])), 32.7032, rtol=1e-4)
    np.testing.assert_allclose(np.diff(grid), CENTS_PER_BIN)


def test_salience_decode_weighted_average():
    """A Gaussian salience bump decodes to its (sub-bin) center."""
    grid = cents_grid()
    true_cents = grid[100] + 7.0  # off-center by 7 cents
    salience = np.exp(-0.5 * ((grid - true_cents) / 25.0) ** 2)
    got = float(salience_to_cents(jnp.asarray(salience[None, :]))[0])
    assert abs(got - true_cents) < 2.0

    # viterbi path decode agrees on a clean static track
    sal_track = jnp.asarray(np.tile(salience, (12, 1)))
    got_v = np.asarray(viterbi_cents(sal_track))
    np.testing.assert_allclose(got_v, true_cents, atol=2.0)


def test_viterbi_suppresses_transient_octave_jump():
    """One frame with a (slightly stronger) octave-up peak inside a steady
    track must be pulled back to the track by the transition penalty."""
    grid = cents_grid()
    base = np.exp(-0.5 * ((grid - grid[120]) / 25.0) ** 2)
    jump = 0.7 * base + 1.0 * np.exp(
        -0.5 * ((grid - grid[120] - 1200.0) / 25.0) ** 2
    )
    track = np.tile(base, (9, 1))
    track[4] = jump
    cents = np.asarray(viterbi_cents(jnp.asarray(track)))
    assert abs(cents[4] - grid[120]) < 40.0, "octave glitch not smoothed"


def test_resampler_preserves_tone_frequency():
    """48 kHz → 16 kHz polyphase resampling keeps a 440 Hz tone at 440 Hz
    and rejects content above the new Nyquist."""
    sr = 48000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 440.0 * t) + 0.5 * np.sin(2 * np.pi * 11000.0 * t)
    y = np.asarray(resample_to_model_rate(jnp.asarray(x, jnp.float32), sr))
    assert abs(len(y) - MODEL_SRATE) <= 2
    spec = np.abs(np.fft.rfft(y[: MODEL_SRATE]))
    freqs = np.fft.rfftfreq(MODEL_SRATE, 1.0 / MODEL_SRATE)
    peak = freqs[np.argmax(spec)]
    assert abs(peak - 440.0) < 2.0
    # 11 kHz component is above the 8 kHz Nyquist: must be attenuated, not
    # aliased to 5 kHz
    alias_band = spec[(freqs > 4900) & (freqs < 5100)]
    assert alias_band.max() < 0.02 * spec.max()


def test_extract_pitch_crepe_length_contract():
    """(T,) → (T // block_size,) like ops.pitch.extract_pitch and the
    reference (core.py:100-119), at a non-16k sample rate."""
    model, variables, _ = _init()
    sr, block = 48000, 512
    t = sr // 2
    x = np.sin(2 * np.pi * 220.0 * np.arange(t) / sr).astype(np.float32)
    f0 = extract_pitch_crepe(
        jnp.asarray(x), sr, block, variables, capacity="micro"
    )
    assert f0.shape == (t // block,)
    assert np.all(np.isfinite(np.asarray(f0)))


def test_extract_pitch_hybrid_yin_evidence_carries_untrained_net():
    """The CREPE×YIN fusion must stay accurate even when the neural side
    is uninformative: an UNTRAINED micro net emits near-flat salience, so
    the YIN CMNDF evidence (plus the confidence gate) decides — a clean
    220 Hz tone must decode to ~220 Hz, and the length contract holds."""
    from ddsp_pytorch_tpu.models.crepe import extract_pitch_hybrid

    model, variables, _ = _init()
    sr, block = 16000, 256
    t = sr  # 1 s
    x = np.sin(2 * np.pi * 220.0 * np.arange(t) / sr).astype(np.float32)
    f0 = np.asarray(extract_pitch_hybrid(
        jnp.asarray(x), sr, block, variables, capacity="micro"
    ))
    assert f0.shape == (t // block,)
    mid = f0[4:-4]
    assert np.abs(1200 * np.log2(mid / 220.0)).max() < 50.0  # within 50 c


def test_make_pitch_fn_hybrid_wiring(tmp_path):
    """preprocess.pitch_tracker='hybrid' loads crepe_params and routes rows
    through extract_pitch_hybrid with the same length contract."""
    from flax import serialization

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.data.preprocess import make_pitch_fn

    _, variables, _ = _init()
    bundle = tmp_path / "crepe_micro.msgpack"
    bundle.write_bytes(serialization.msgpack_serialize(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}))

    cfg = Config.from_dict({
        "preprocess": {"sample_rate": 16000, "signal_length": 8192,
                       "block_size": 256, "pitch_tracker": "hybrid",
                       "crepe_params": str(bundle),
                       "crepe_capacity": "micro"},
    })
    fn = make_pitch_fn(cfg)
    assert fn is not None
    x = np.sin(2 * np.pi * 330.0 * np.arange(8192) / 16000).astype(np.float32)
    f0 = np.asarray(fn(jnp.asarray(x), 16000, 256))
    assert f0.shape == (8192 // 256,)
    assert np.all(np.isfinite(f0))

    cfg.preprocess.pitch_tracker = "nope"
    with pytest.raises(ValueError, match="unknown pitch_tracker"):
        make_pitch_fn(cfg)


@pytest.mark.slow
def test_micro_training_learns_pitch():
    """A micro-capacity model briefly trained on easy tones must (a) drop
    the BCE loss and (b) cut the pitch error well below the untrained
    model's.  Real accuracy needs the full run (scripts/train_crepe.py,
    ~3k steps — RPA is recorded in BASELINE.md); this pins the recipe
    wiring: synth labels, blurred targets, batch-stats plumbing, decode."""
    import optax
    from train_crepe import f0_to_target, synth_batch

    def cents_err(params, batch_stats, frames, f0):
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, frames
        )
        cents = salience_to_cents(jax.nn.sigmoid(logits))
        return float(np.mean(np.abs(np.asarray(cents - hz_to_cents(f0)))))

    model = CREPE(capacity="micro", dropout=0.0)
    rng = jax.random.PRNGKey(1)
    frames, _ = synth_batch(rng, 8)
    variables = model.init({"params": rng, "dropout": rng}, frames, train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    eval_frames, eval_f0 = synth_batch(jax.random.PRNGKey(77), 128)
    err_untrained = cents_err(params, batch_stats, eval_frames, eval_f0)
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)
    pos_weight = 20.0  # the script's default weighted-BCE recipe

    @jax.jit
    def step(params, batch_stats, opt_state, rng):
        k_data, rng = jax.random.split(rng)
        frames, f0 = synth_batch(k_data, 64)
        target = f0_to_target(f0)

        def loss_fn(p):
            logits, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                frames,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            bce = pos_weight * target * jax.nn.softplus(-logits) + (
                1.0 - target
            ) * jax.nn.softplus(logits)
            return jnp.mean(bce), updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, rng, loss

    losses = []
    for _ in range(200):
        params, batch_stats, opt_state, rng, loss = step(
            params, batch_stats, opt_state, rng
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, f"{losses[0]:.4f} → {losses[-1]:.4f}"

    err_trained = cents_err(params, batch_stats, eval_frames, eval_f0)
    assert err_trained < 0.5 * err_untrained, (
        f"no pitch signal learned: {err_untrained:.0f} → {err_trained:.0f} cents"
    )


def test_resampler_matches_direct_zero_stuffed_convolution():
    """The polyphase evaluation must equal the literal zero-stuff →
    convolve('valid') → [::down] formulation it replaces, including the
    awkward rational ratio (44.1 kHz → 16 kHz: up=160, down=441)."""
    from ddsp_pytorch_tpu.models.crepe import _resample_kernel

    rng = np.random.default_rng(0)
    for sr in (48000, 44100, 22050):
        g = math.gcd(sr, MODEL_SRATE)
        up, down = MODEL_SRATE // g, sr // g
        t = 2000
        x = rng.standard_normal(t).astype(np.float32)

        kernel = _resample_kernel(up, down)
        stuffed = np.zeros((t, up), np.float32)
        stuffed[:, 0] = x
        xp = np.pad(stuffed.reshape(-1), (kernel.shape[0] // 2,) * 2)
        want = np.convolve(xp, kernel, mode="valid")[::down]

        got = np.asarray(resample_to_model_rate(jnp.asarray(x), sr))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_default_tracker_is_hybrid_and_resolves_shipped_bundle():
    """Round-5 default flip (VERDICT r4 #2): the default config's pitch
    tracker is the CREPE×YIN fusion, and make_pitch_fn resolves the
    SHIPPED pretrained/crepe_tiny.msgpack when crepe_params is unset."""
    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.data.preprocess import (
        default_crepe_params,
        make_pitch_fn,
    )

    cfg = Config()
    assert cfg.preprocess.pitch_tracker == "hybrid"
    assert cfg.preprocess.crepe_params is None
    shipped = default_crepe_params()
    assert shipped is not None and shipped.endswith("crepe_tiny.msgpack")
    fn = make_pitch_fn(cfg)  # must load the shipped bundle, not raise
    assert fn is not None


def test_robustness_artifact_hybrid_dominates():
    """The committed robustness artifact must show the DEFAULT tracker
    (hybrid) >= YIN and >= CREPE on every condition row — the round-5
    9/9 bar (VERDICT r4 #2).  Regenerate with
    scripts/pitch_accuracy.py --degraded if tuning changes."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "pretrained",
                        "pitch_robustness.json")
    if not os.path.exists(path):
        pytest.skip("robustness artifact not present")
    with open(path) as f:
        rep = json.load(f)
    rows = []
    for bucket in ("conditions", "extremes"):
        for tag, summary in rep.get(bucket, {}).items():
            rows.append((f"{bucket}/{tag}", summary))
    assert rows, "artifact has no condition rows"
    eps = 1e-9
    for tag, summary in rows:
        h = summary["hybrid"]["overall"]["rpa"]
        y = summary["yin"]["overall"]["rpa"]
        c = summary["crepe"]["overall"]["rpa"]
        assert h >= y - eps and h >= c - eps, (
            f"{tag}: hybrid {h:.3f} < max(yin {y:.3f}, crepe {c:.3f})"
        )


def test_extract_pitch_crepe_fmin_fmax_masks_decode_range():
    """preprocess.pitch_fmin/pitch_fmax reach the crepe tracker as a
    salience mask (make_pitch_fn): bins outside [fmin, fmax] cannot be
    decoded.  An untrained micro net emits near-arbitrary salience, so
    restricting the range to [300, 1000] Hz must confine the decoded
    track there (weighted-average bleed is < half the ±4-bin window,
    i.e. < 80 cents)."""
    model, variables, _ = _init()
    sr, block = 16000, 256
    x = np.sin(2 * np.pi * 220.0 * np.arange(sr) / sr).astype(np.float32)
    f0 = np.asarray(extract_pitch_crepe(
        jnp.asarray(x), sr, block, variables, capacity="micro",
        fmin=300.0, fmax=1000.0,
    ))
    assert f0.shape == (sr // block,)
    lo, hi = 300.0 * 2 ** (-80 / 1200), 1000.0 * 2 ** (80 / 1200)
    assert np.all(f0 >= lo) and np.all(f0 <= hi), (f0.min(), f0.max())


def test_make_pitch_fn_passes_pitch_range(tmp_path):
    """The config's pitch_fmin/pitch_fmax are honored by the neural
    trackers (round-5 advisor finding: they were silently dead for
    hybrid/crepe).  A crepe-tracker config restricted to [300, 1000] Hz
    must never emit pitch below 250 Hz."""
    from flax import serialization

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.data.preprocess import make_pitch_fn

    _, variables, _ = _init()
    bundle = tmp_path / "crepe_micro.msgpack"
    bundle.write_bytes(serialization.msgpack_serialize(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}))

    cfg = Config.from_dict({
        "preprocess": {"sample_rate": 16000, "signal_length": 8192,
                       "block_size": 256, "pitch_tracker": "crepe",
                       "crepe_params": str(bundle),
                       "crepe_capacity": "micro",
                       "pitch_fmin": 300.0, "pitch_fmax": 1000.0},
    })
    fn = make_pitch_fn(cfg)
    x = np.sin(2 * np.pi * 220.0 * np.arange(8192) / 16000).astype(np.float32)
    f0 = np.asarray(fn(jnp.asarray(x), 16000, 256))
    assert np.all(f0 >= 250.0), f0.min()


def test_make_pitch_fn_falls_back_when_recorded_path_missing(tmp_path):
    """Frozen bundle configs may record a training-host crepe_params path
    that does not exist at inference time; make_pitch_fn must fall back
    to the shipped pretrained/crepe_tiny.msgpack instead of failing
    timbre transfer."""
    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.data.preprocess import (
        default_crepe_params,
        make_pitch_fn,
    )

    if default_crepe_params() is None:
        pytest.skip("shipped crepe_tiny.msgpack not present")
    cfg = Config.from_dict({
        "preprocess": {"sample_rate": 16000, "signal_length": 8192,
                       "block_size": 256, "pitch_tracker": "hybrid",
                       "crepe_params": str(tmp_path / "gone.msgpack")},
    })
    fn = make_pitch_fn(cfg)
    assert fn is not None


def test_extract_pitch_hybrid_fmin_fmax_masks_fused_decode():
    """A narrowed pitch range must restrict the hybrid DECODE, not just
    its YIN-evidence grid: a YIN grid narrower than CREPE's 360 bins
    edge-clamps d' onto the out-of-range bins (a flat low-cost shelf —
    hybrid_evidence docstring), so without a decode mask the Viterbi can
    park below fmin.  With the mask, a [300, 1000] Hz range must confine
    the track there (≤80-cent weighted-average bleed) even for an
    out-of-range 220 Hz input and an untrained net."""
    from ddsp_pytorch_tpu.models.crepe import extract_pitch_hybrid

    model, variables, _ = _init()
    sr, block = 16000, 256
    x = np.sin(2 * np.pi * 220.0 * np.arange(sr) / sr).astype(np.float32)
    f0 = np.asarray(extract_pitch_hybrid(
        jnp.asarray(x), sr, block, variables, capacity="micro",
        fmin=300.0, fmax=1000.0,
    ))
    assert f0.shape == (sr // block,)
    lo, hi = 300.0 * 2 ** (-80 / 1200), 1000.0 * 2 ** (80 / 1200)
    assert np.all(f0 >= lo) and np.all(f0 <= hi), (f0.min(), f0.max())
