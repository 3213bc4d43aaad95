#!/usr/bin/env python
"""Synthesis benchmark CLI (parity: reference performance.py).

Protocol (performance.py:21-41): synthesize N = 2^ceil(log2(sample_rate))
samples (~1 s) from random control inputs, average wall-clock over --n-run
runs, report milliseconds and ×-realtime.

``python performance.py --bundle export/ddsp_NAME_bundle [--n-run 10]``
With no bundle, benchmarks a freshly-initialized default model (the
reference requires a trained artifact; random weights exercise the same
compute graph).
"""

import argparse
import math
import time


def run_benchmark(
    bundle=None, n_run: int = 10, batch: int = 1, use_pallas="auto",
    config=None, protocol_runs: int = 1, discard_first: bool = False,
    value_pull: bool = False,
):
    """Benchmark a bundle, a given Config's model (random weights), or the
    default Config.  bench.py delegates here with its north-star config so
    the driver metric and this CLI always measure the same protocol.

    protocol_runs > 1 repeats the timed protocol (mean of n_run blocked
    calls) on the SAME compiled synth and reports the best mean — one
    model build + compile total.  discard_first additionally throws away
    the first protocol run (tunnel transients right after compile).

    value_pull=True times each call INCLUDING a device→host pull of its
    output (np.asarray, the scripts/tunnel_truth_probe.py protocol): on
    this container's axon tunnel jax.block_until_ready fake-ACKs
    (BASELINE.md 'the tunnel lies'), so only a pull-verified timing is
    real end-to-end throughput; blocked timing is a dispatch rate."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.models import load_model
    from ddsp_pytorch_tpu.streaming import StreamingSynth

    if bundle is not None:
        from ddsp_pytorch_tpu.export import make_streaming_synth

        synth = make_streaming_synth(bundle, batch=batch)
    else:
        if config is None:
            config = Config()
            config.model.kwargs["use_pallas"] = use_pallas
        model = load_model(config)
        rng = jax.random.PRNGKey(0)
        f = config.n_frames
        init_batch = {
            "sig": jnp.zeros((1, config.preprocess.signal_length)),
            "pitch": jnp.full((1, f, 1), 200.0),
            "loudness": jnp.zeros((1, f, 1)),
        }
        params = model.init({"params": rng, "noise": rng}, init_batch)["params"]
        synth = StreamingSynth(
            model,
            params,
            mean_loudness=config.data.mean_loudness or 0.0,
            std_loudness=config.data.std_loudness or 1.0,
            batch=batch,
        )

    sr = synth.sample_rate

    n = 2 ** math.ceil(math.log2(sr))
    n = (n // synth.block_size) * synth.block_size
    rng = np.random.default_rng(0)
    pitch = rng.uniform(100, 400, (batch, n)).astype(np.float32)
    loud = rng.standard_normal((batch, n)).astype(np.float32)

    # Stage the random inputs on device OUTSIDE the timed loop, exactly like
    # the reference (performance.py:22 `.to(device)` before timing).  The
    # stride-decimation to frame rate is a free metadata slice there
    # (export.py:36-37, inside TorchScript on device tensors); doing it on
    # staged arrays here keeps the timed region = pure synthesis dispatch.
    f0 = jnp.asarray(pitch[:, :: synth.block_size, None])
    lo = jnp.asarray(loud[:, :: synth.block_size, None])
    jax.block_until_ready((f0, lo))

    # warmup (compile)
    jax.block_until_ready(synth.step(f0, lo))

    def protocol_mean():
        mean = 0.0
        for i in range(n_run):
            st = time.perf_counter()
            out = synth.step(f0, lo)
            if value_pull:
                np.asarray(out)  # forces REAL completion (+ transfer)
            else:
                jax.block_until_ready(out)
            mean += (time.perf_counter() - st - mean) / (i + 1)
        return mean

    if value_pull:
        np.asarray(synth.step(f0, lo))  # drain any queued fake-ACKed work

    if discard_first:
        protocol_mean()
    mean = min(protocol_mean() for _ in range(max(1, protocol_runs)))

    realtime = batch * n / (mean * sr)
    return {
        "mean_ms": 1000 * mean,
        "audio_ms": 1000 * n / sr,
        "x_realtime": realtime,
        "samples_per_s": batch * n / mean,
        "batch": batch,
        "sample_rate": sr,
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (e.g. cpu)")
    p.add_argument("--bundle", default=None)
    p.add_argument("--n-run", type=int, default=10)
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    r = run_benchmark(args.bundle, args.n_run, args.batch)
    smiley = ":)" if r["x_realtime"] >= 1 else ":("
    print(
        f"average of {r['mean_ms']:.2f}ms to generate {r['audio_ms']:.2f}ms "
        f"over {args.n_run} trials (batch {r['batch']})"
    )
    print(f"generation is {r['x_realtime']:.2f}x realtime {smiley}")
    print(80 * "-")


if __name__ == "__main__":
    main()
