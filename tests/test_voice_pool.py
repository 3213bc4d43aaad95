"""VoicePool: batched multi-session streaming must be indistinguishable
from independent per-session streams (voice isolation), with slot reuse
giving fresh state.  Deterministic noise isolates the per-voice math (the
pool's PRNG is a documented batch-level resource)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_pytorch_tpu.config import Config
from ddsp_pytorch_tpu.models import load_model
from ddsp_pytorch_tpu.streaming import StreamingSynth
from ddsp_pytorch_tpu.streaming.pool import VoicePool

SR, BLOCK, F = 16000, 64, 4


def _model_params(has_reverb=False):
    cfg = Config()
    cfg.preprocess.sample_rate = SR
    cfg.preprocess.block_size = BLOCK
    cfg.model.kwargs.update(
        hidden_size=16, n_harmonic=4, n_bands=5, sample_rate=SR,
        block_size=BLOCK, has_reverb=has_reverb, use_pallas="never",
    )
    model = load_model(cfg)
    n = 8 * BLOCK
    batch = {
        "sig": jnp.zeros((1, n), jnp.float32),
        "pitch": jnp.full((1, 8, 1), 220.0, jnp.float32),
        "loudness": jnp.zeros((1, 8, 1), jnp.float32),
    }
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "noise": rng}, batch)["params"]
    return model, params


def _controls(rng, n_steps):
    return [
        (
            rng.uniform(100, 300, (F, 1)).astype(np.float32),
            rng.standard_normal((F, 1)).astype(np.float32),
        )
        for _ in range(n_steps)
    ]


@pytest.mark.parametrize("has_reverb", [False, True])
def test_pool_matches_independent_streams(rng, has_reverb):
    model, params = _model_params(has_reverb)
    pool = VoicePool(
        StreamingSynth(
            model, params, batch=3, noise_deterministic=True,
            include_reverb=has_reverb,
        )
    )
    ref_a = StreamingSynth(
        model, params, batch=1, noise_deterministic=True,
        include_reverb=has_reverb,
    )
    ref_b = StreamingSynth(
        model, params, batch=1, noise_deterministic=True,
        include_reverb=has_reverb,
    )

    ctrl_a = _controls(rng, 4)
    ctrl_b = _controls(rng, 2)

    a = pool.acquire()
    assert a is not None

    # a alone for 2 blocks
    out_a = [np.asarray(pool.step({a: ctrl_a[i]})[a]) for i in range(2)]

    # b joins: both advance in one dispatch for 2 blocks
    b = pool.acquire()
    assert b is not None and b != a
    for i in range(2):
        outs = pool.step({a: ctrl_a[2 + i], b: ctrl_b[i]})
        out_a.append(np.asarray(outs[a]))
        if i == 0:
            out_b_first = np.asarray(outs[b])

    # independent references, same control sequences
    ref_out_a = [
        np.asarray(ref_a.step(f[None], l[None]))[0] for f, l in ctrl_a
    ]
    ref_out_b = np.asarray(ref_b.step(*[c[None] for c in ctrl_b[0]]))[0]

    for got, want in zip(out_a, ref_out_a):
        np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(out_b_first, ref_out_b, atol=1e-5)


def test_slot_release_gives_fresh_state(rng):
    model, params = _model_params()
    pool = VoicePool(
        StreamingSynth(model, params, batch=2, noise_deterministic=True)
    )
    ctrl = _controls(rng, 2)

    a = pool.acquire()
    first = np.asarray(pool.step({a: ctrl[0]})[a])
    pool.step({a: ctrl[1]})  # advance state
    pool.release(a)

    a2 = pool.acquire()
    again = np.asarray(pool.step({a2: ctrl[0]})[a2])
    np.testing.assert_allclose(again, first, atol=1e-6)


def test_pool_capacity_and_mixed_frames(rng):
    model, params = _model_params()
    pool = VoicePool(
        StreamingSynth(model, params, batch=2, noise_deterministic=True)
    )
    s1, s2 = pool.acquire(), pool.acquire()
    assert pool.acquire() is None  # full
    pool.release(s1)
    assert pool.acquire() is not None

    with pytest.raises(ValueError):
        pool.step(
            {
                s2: (np.zeros((2, 1), np.float32), np.zeros((2, 1), np.float32)),
                0: (np.zeros((3, 1), np.float32), np.zeros((3, 1), np.float32)),
            }
        )


def test_pool_autoencoder_matches_independent_streams(rng):
    """mfcc-autoencoder pool: each slot's stream (with per-slot MFCC frames
    driving the encoder GRU) equals a dedicated batch-1 stream exactly
    (deterministic noise)."""
    cfg = Config()
    cfg.preprocess.sample_rate = SR
    cfg.preprocess.block_size = BLOCK
    cfg.model.name = "mfcc-autoencoder"
    cfg.model.kwargs.update(
        hidden_size=16, n_harmonic=4, n_bands=5, sample_rate=SR,
        block_size=BLOCK, has_reverb=False, use_pallas="never",
    )
    model = load_model(cfg)
    n = 8 * BLOCK
    init_batch = {
        "sig": jnp.zeros((1, n), jnp.float32),
        "pitch": jnp.full((1, 8, 1), 220.0, jnp.float32),
        "loudness": jnp.zeros((1, 8, 1), jnp.float32),
        "mfcc": jnp.zeros((1, 8, 30), jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "noise": key}, init_batch)["params"]

    pool = VoicePool(
        StreamingSynth(model, params, batch=3, noise_deterministic=True)
    )
    ref_a = StreamingSynth(model, params, batch=1, noise_deterministic=True)
    ref_b = StreamingSynth(model, params, batch=1, noise_deterministic=True)

    def ctrl3(seed):
        r = np.random.default_rng(seed)
        return [
            (
                r.uniform(100, 300, (F, 1)).astype(np.float32),
                r.standard_normal((F, 1)).astype(np.float32),
                r.standard_normal((F, 30)).astype(np.float32),
            )
            for _ in range(3)
        ]

    ctrl_a, ctrl_b = ctrl3(1), ctrl3(2)
    a = pool.acquire()
    b = pool.acquire()
    out_a, out_b = [], []
    for i in range(3):
        outs = pool.step({a: ctrl_a[i], b: ctrl_b[i]})
        out_a.append(outs[a])
        out_b.append(outs[b])
    # (f0, loud) without mfcc is rejected on an AE pool
    with pytest.raises(ValueError, match="mfcc"):
        pool.step({a: ctrl_a[0][:2]})

    for i in range(3):
        fa, la, ma = ctrl_a[i]
        want = np.asarray(
            ref_a.step(fa[None], la[None], ma[None])
        )[0]
        np.testing.assert_allclose(out_a[i], want, atol=1e-5)
        fb, lb, mb = ctrl_b[i]
        want_b = np.asarray(
            ref_b.step(fb[None], lb[None], mb[None])
        )[0]
        np.testing.assert_allclose(out_b[i], want_b, atol=1e-5)
