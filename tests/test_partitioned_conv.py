"""Partitioned convolution: streaming == offline causal convolution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_pytorch_tpu.ops import fft_convolve
from ddsp_pytorch_tpu.ops.partitioned_conv import (
    init_state,
    partition_ir,
    streaming_convolve,
)


def _offline_causal(x, ir):
    """y[t] = Σ_{τ≤t} ir[τ]·x[t−τ] via the framework's fft_convolve
    (kernel padded to signal length — the Reverb path)."""
    t = x.shape[-1]
    ir_p = jnp.pad(ir, (0, t - ir.shape[-1])) if ir.shape[-1] < t else ir[:t]
    return fft_convolve(x, ir_p[None, :])


@pytest.mark.parametrize("l,block", [(100, 32), (256, 64), (63, 16)])
def test_streaming_matches_offline(rng, l, block):
    t = 512
    x = jnp.asarray(rng.standard_normal((2, t)).astype(np.float32))
    ir = jnp.asarray(rng.standard_normal((l,)).astype(np.float32))

    want = np.asarray(_offline_causal(x, ir))

    pir = partition_ir(ir, block)
    state = init_state(pir, (2,))
    got, _ = streaming_convolve(pir, state, x)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_state_carries_across_calls(rng):
    """Two chunked calls == one call == offline."""
    t, l, block = 256, 90, 32
    x = jnp.asarray(rng.standard_normal((1, t)).astype(np.float32))
    ir = jnp.asarray(rng.standard_normal((l,)).astype(np.float32))
    pir = partition_ir(ir, block)

    one, _ = streaming_convolve(pir, init_state(pir, (1,)), x)

    st = init_state(pir, (1,))
    a, st = streaming_convolve(pir, st, x[:, : t // 2])
    b, st = streaming_convolve(pir, st, x[:, t // 2 :])
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([a, b], -1)), np.asarray(one), atol=1e-4
    )


def test_bad_chunk_size_rejected(rng):
    pir = partition_ir(jnp.ones((64,)), 32)
    with pytest.raises(AssertionError):
        streaming_convolve(pir, init_state(pir), jnp.ones((40,)))


def test_streaming_synth_with_reverb(rng):
    """StreamingSynth(include_reverb=True): streamed audio == offline model
    forward incl. reverb (same noise), across multiple blocks."""
    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.models import load_model
    from ddsp_pytorch_tpu.streaming import StreamingSynth

    cfg = Config.from_dict(
        {
            "preprocess": {"sample_rate": 16000, "signal_length": 4096,
                           "block_size": 64},
            "model": {
                "name": "single-inst-decoder",
                "kwargs": {
                    "hidden_size": 16,
                    "n_harmonic": 4,
                    "n_bands": 5,
                    "sample_rate": 16000,
                    "block_size": 64,
                    "has_reverb": True,
                    "use_pallas": "never",
                },
            },
        }
    )
    model = load_model(cfg)
    f = cfg.n_frames
    batch = {
        "sig": jnp.zeros((1, 4096), jnp.float32),
        "pitch": jnp.asarray(rng.uniform(150, 350, (1, f, 1)).astype(np.float32)),
        "loudness": jnp.asarray(rng.standard_normal((1, f, 1)).astype(np.float32)),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, batch
    )["params"]

    synth = StreamingSynth(
        model, params, include_reverb=True, noise_deterministic=True
    )
    # stream in 4 chunks
    chunks = []
    fc = f // 4
    for c in range(4):
        sl = slice(c * fc, (c + 1) * fc)
        chunks.append(
            np.asarray(synth.step(batch["pitch"][:, sl], batch["loudness"][:, sl]))
        )
    streamed = np.concatenate(chunks, axis=-1)

    # offline oracle: harmonic-only model forward (zero noise) + reverb
    from ddsp_pytorch_tpu.models.modules import Reverb
    from ddsp_pytorch_tpu.streaming import init_stream_state

    st0 = init_stream_state(model.hidden_size, 1)
    zero_noise = jnp.zeros((1, f, 64), jnp.float32)
    dry, _, _ = model.apply(
        {"params": params},
        batch["pitch"],
        batch["loudness"],
        st0.gru,
        st0.phase,
        zero_noise,
        method=model.streaming_step,
    )
    reverb = Reverb(16000, 16000)
    ir = reverb.apply({"params": params["reverb"]}, method=reverb.build_impulse)
    want = np.asarray(_offline_causal(dry, ir))

    # f32: a 16000-tap conv accumulated via 128-point partitions vs one
    # 8192-point FFT reorders thousands of additions
    np.testing.assert_allclose(streamed, want, atol=1e-3)
