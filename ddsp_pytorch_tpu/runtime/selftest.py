"""End-to-end runtime selftest: JAX model rendering through the C++ engine.

Run: python -m ddsp_pytorch_tpu.runtime.selftest
Builds the native library if needed, instantiates a fresh model, streams
pitch/loudness ticks through the double-buffered pipeline, and checks the
pipeline invariant (output delayed by exactly 2 blocks vs direct rendering).
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    import jax

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.models import load_model
    from ddsp_pytorch_tpu.runtime import StreamEngine
    from ddsp_pytorch_tpu.streaming import StreamingSynth

    cfg = Config.from_dict(
        {
            "preprocess": {"sample_rate": 16000, "signal_length": 4096,
                           "block_size": 256},
            "model": {
                "name": "single-inst-decoder",
                "kwargs": {
                    "hidden_size": 64,
                    "n_harmonic": 16,
                    "n_bands": 17,
                    "sample_rate": 16000,
                    "block_size": 256,
                    "has_reverb": False,
                },
            },
        }
    )
    model = load_model(cfg)
    f = 4
    block_samples = 256 * f  # render 4 frames per engine block (1024 samples)
    init = {
        "sig": np.zeros((1, 4096), np.float32),
        "pitch": np.full((1, 16, 1), 220.0, np.float32),
        "loudness": np.zeros((1, 16, 1), np.float32),
    }
    import jax.numpy as jnp

    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    params = model.init(rngs, {k: jnp.asarray(v) for k, v in init.items()})[
        "params"
    ]
    synth = StreamingSynth(model, params, noise_deterministic=True)

    def render(pitch, loud):
        return synth.step_samples(pitch[None, :], loud[None, :])[0]

    # reference rendering (no engine): same synth state from a twin instance
    twin = StreamingSynth(model, params, noise_deterministic=True)

    tick = 256
    n_ticks = 24
    rng = np.random.default_rng(0)
    pitch_sig = rng.uniform(150, 400, (n_ticks * tick,)).astype(np.float32)
    loud_sig = np.zeros(n_ticks * tick, np.float32)

    with StreamEngine(block_samples, render) as engine:
        assert engine.latency == 2 * block_samples
        out = np.zeros(n_ticks * tick, np.float32)
        import time

        for t in range(n_ticks):
            sl = slice(t * tick, (t + 1) * tick)
            out[sl] = engine.process(pitch_sig[sl], loud_sig[sl])
            time.sleep(0.002)  # audio-thread pacing
        blocks = engine.blocks_rendered
        underruns = engine.underruns

    direct = twin.step_samples(
        pitch_sig[None, : (n_ticks * tick - 2 * block_samples)],
        loud_sig[None, : (n_ticks * tick - 2 * block_samples)],
    )[0]

    delayed = out[2 * block_samples :]
    err = np.abs(delayed - np.asarray(direct)[: len(delayed)]).max()
    print(f"blocks rendered: {blocks}, underruns: {underruns}")
    print(f"pipeline-delay equivalence max err: {err:.2e}")
    # f32: blockwise vs one-shot GRU scans reorder accumulations slightly
    ok = err < 1e-4 and blocks >= n_ticks * tick // block_samples - 1
    print("runtime selftest:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
