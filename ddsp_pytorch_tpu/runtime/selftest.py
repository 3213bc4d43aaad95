"""End-to-end runtime selftest: JAX model rendering through the C++ engine.

Run: python -m ddsp_pytorch_tpu.runtime.selftest
Builds the native library if needed, instantiates a fresh model, streams
pitch/loudness ticks through the double-buffered pipeline, and checks the
pipeline invariant (output delayed by exactly 2 blocks vs direct rendering).

Soak mode: python -m ddsp_pytorch_tpu.runtime.selftest --soak 30
drives the engine at REALTIME pacing (deadline-scheduled 64-sample ticks,
like a Pd audio callback) for N seconds of audio through the full
flagship-shaped model (48 kHz, 100 harmonics, hidden 512) and asserts
`ddsp_stream_underruns() == 0` — the measured version of the reference's
structural 2x1024-sample latency budget (reference
realtime/ddsp_tilde/ddsp_tilde.cpp:7,87).  Prints one JSON line with the
latency and render-time stats (recorded in BASELINE.md).
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


def soak(
    seconds: float = 30.0,
    *,
    bundle: str | None = None,
    sample_rate: int = 48000,
    block_size: int = 512,
    hidden_size: int = 512,
    n_harmonic: int = 100,
    tick: int = 64,
) -> int:
    """Paced realtime soak: N seconds of audio at deadline-scheduled ticks.

    Engine block = 2*block_size model samples (the Pd external's choice,
    runtime/pd_ddsp_tilde.cpp) → end-to-end pipeline latency 4*block_size
    samples ≈ 42.7 ms at 48 kHz/512 — the reference's structural budget.
    PASS = zero underruns, i.e. every block rendered faster than realtime
    while the audio thread kept real deadlines.
    """
    import json
    import time

    import jax
    import jax.numpy as jnp

    from ddsp_pytorch_tpu.runtime import StreamEngine

    if bundle is not None:
        from ddsp_pytorch_tpu.export import make_streaming_synth

        synth = make_streaming_synth(bundle)
        sample_rate = synth.sample_rate
        block_size = synth.block_size
    else:
        from ddsp_pytorch_tpu.config import Config
        from ddsp_pytorch_tpu.models import load_model
        from ddsp_pytorch_tpu.streaming import StreamingSynth

        cfg = Config.from_dict(
            {
                "preprocess": {"sample_rate": sample_rate,
                               "signal_length": 8 * block_size,
                               "block_size": block_size},
                "model": {
                    "name": "single-inst-decoder",
                    "kwargs": {
                        "hidden_size": hidden_size,
                        "n_harmonic": n_harmonic,
                        "n_bands": 65,
                        "sample_rate": sample_rate,
                        "block_size": block_size,
                        "has_reverb": False,
                    },
                },
            }
        )
        model = load_model(cfg)
        f = 8
        init = {
            "sig": np.zeros((1, f * block_size), np.float32),
            "pitch": np.full((1, f, 1), 220.0, np.float32),
            "loudness": np.zeros((1, f, 1), np.float32),
        }
        rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
        params = model.init(
            rngs, {k: jnp.asarray(v) for k, v in init.items()}
        )["params"]
        synth = StreamingSynth(model, params, noise_deterministic=True)

    render_times: list = []

    def render(pitch, loud):
        t0 = time.perf_counter()
        out = synth.step_samples(pitch[None, :], loud[None, :])[0]
        out = np.asarray(out)
        render_times.append(time.perf_counter() - t0)
        return out

    engine_block = 2 * block_size
    n_ticks = int(seconds * sample_rate) // tick
    tick_s = tick / sample_rate
    rng = np.random.default_rng(0)

    # warm the compile OUTSIDE the paced loop (first XLA compile is tens of
    # seconds; a DAW user hits it at `load`, not mid-performance)
    render(np.full(engine_block, 220.0, np.float32),
           np.zeros(engine_block, np.float32))
    render_times.clear()

    late_ticks = 0
    with StreamEngine(engine_block, render) as engine:
        latency_ms = engine.latency / sample_rate * 1000.0
        start = time.perf_counter()
        offset = 0.0  # resync accumulator (see below)
        for i in range(n_ticks):
            deadline = start + offset + i * tick_s
            now = time.perf_counter()
            if now < deadline:
                time.sleep(deadline - now)
            elif now - deadline > tick_s:
                # The PACER stalled (container scheduling), not the model.
                # A real audio device never delivers a burst of catch-up
                # callbacks — it xruns at the driver and resumes on its
                # clock — so resynchronize the deadline base instead of
                # bursting ticks at the engine (a burst crosses block
                # boundaries in ~0 wall time and would charge the worker
                # with underruns it did not cause).
                late_ticks += 1
                offset += now - deadline
            pitch = np.full(tick, 220.0 + 50.0 * np.sin(i * 0.01), np.float32)
            loud = np.full(tick, -0.5 + 0.1 * rng.standard_normal(), np.float32)
            engine.process(pitch, loud)
        wall = time.perf_counter() - start
        underruns = engine.underruns
        blocks = engine.blocks_rendered

    rt = np.asarray(render_times)
    result = {
        "metric": "realtime_soak",
        "audio_seconds": n_ticks * tick_s,
        "wall_seconds": wall,
        "underruns": int(underruns),
        "late_ticks": int(late_ticks),
        "blocks_rendered": int(blocks),
        "latency_ms": latency_ms,
        "render_ms_mean": float(rt.mean() * 1000.0) if rt.size else None,
        "render_ms_p99": float(np.quantile(rt, 0.99) * 1000.0) if rt.size else None,
        "render_ms_max": float(rt.max() * 1000.0) if rt.size else None,
        "budget_ms": engine_block / sample_rate * 1000.0,
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))
    ok = underruns == 0
    print("realtime soak:", "PASS (zero underruns)" if ok else "FAIL")
    return 0 if ok else 1


def _cli() -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--soak", type=float, default=None, metavar="SECONDS",
                   help="paced realtime soak instead of the pipeline test")
    p.add_argument("--bundle", default=None,
                   help="soak through an exported bundle instead of a fresh "
                        "flagship-shaped model")
    p.add_argument("--platform", default=None)
    p.add_argument("--sample-rate", type=int, default=48000)
    p.add_argument("--block-size", type=int, default=512)
    p.add_argument("--harmonics", type=int, default=100)
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.soak is not None:
        return soak(args.soak, bundle=args.bundle,
                    sample_rate=args.sample_rate, block_size=args.block_size,
                    n_harmonic=args.harmonics)
    return main()


if __name__ == "__main__":
    sys.exit(_cli())
