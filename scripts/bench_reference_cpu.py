#!/usr/bin/env python
"""Measured head-to-head vs the reference's computation, same host CPU.

The reference publishes no numbers (SURVEY.md §6), so this script
*produces* the baseline: the reference forward — restated in torch from
its equations (utils/torch_reference.py: nearest upsample, O(T) phase
cumsum, materialized (B, T, K) sine bank, frame FIR noise) — timed with
the reference's own protocol (reference performance.py:21-41: synthesize
2^ceil(log2 sr) samples from random inputs, mean wall-clock over N runs),
next to THIS framework timed by the identical protocol
(performance.run_benchmark) on the SAME host CPU.  The TPU number for the
same config comes from bench.py / BASELINE.md.

Usage:
  python scripts/bench_reference_cpu.py [--out REFBENCH.json] [--n-run 10]

Writes a JSON artifact with per-config rows:
  torch reference ms / ×realtime, ours-CPU ms / ×realtime, speedup.
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


CONFIGS = [
    # the reference training default voice (config.yaml:5-28)
    dict(name="reference-default-48k-64harm", sample_rate=48000,
         block_size=512, hidden_size=512, n_harmonic=64, n_bands=65),
    # the BASELINE.md north-star headline voice
    dict(name="headline-48k-100harm", sample_rate=48000,
         block_size=512, hidden_size=512, n_harmonic=100, n_bands=65),
]


def make_inputs(sample_rate, block_size, batch=1):
    import numpy as np

    n = 2 ** math.ceil(math.log2(sample_rate))
    n = (n // block_size) * block_size
    rng = np.random.default_rng(0)
    pitch = rng.uniform(100, 400, (batch, n)).astype(np.float32)
    loud = rng.standard_normal((batch, n)).astype(np.float32)
    # stage frame-rate controls outside the timed loop, like both harnesses
    return n, pitch[:, ::block_size, None], loud[:, ::block_size, None]


def bench_torch_reference(cfg, params, n_run, protocol_runs):
    import torch

    from ddsp_pytorch_tpu.utils.torch_reference import TorchReferenceDecoder

    ref = TorchReferenceDecoder(
        params,
        sample_rate=cfg["sample_rate"],
        block_size=cfg["block_size"],
        n_harmonic=cfg["n_harmonic"],
        hidden_size=cfg["hidden_size"],
        has_reverb=False,  # the reference's realtime contract excludes reverb
    )
    n, f0, lo = make_inputs(cfg["sample_rate"], cfg["block_size"])
    f0_t, lo_t = torch.tensor(f0), torch.tensor(lo)
    ref(f0_t, lo_t)  # warmup

    def protocol_mean():
        mean = 0.0
        for i in range(n_run):
            st = time.perf_counter()
            ref(f0_t, lo_t)
            mean += (time.perf_counter() - st - mean) / (i + 1)
        return mean

    mean = min(protocol_mean() for _ in range(protocol_runs))
    return {"mean_ms": 1000 * mean, "n_samples": n,
            "x_realtime": n / (mean * cfg["sample_rate"])}


def bench_ours_cpu(cfg, n_run, protocol_runs):
    from ddsp_pytorch_tpu.config import Config

    from performance import run_benchmark

    config = Config()
    config.preprocess.sample_rate = cfg["sample_rate"]
    config.preprocess.block_size = cfg["block_size"]
    config.model.kwargs.update(
        hidden_size=cfg["hidden_size"],
        n_harmonic=cfg["n_harmonic"],
        n_bands=cfg["n_bands"],
        sample_rate=cfg["sample_rate"],
        block_size=cfg["block_size"],
        use_pallas="never",  # CPU run: the XLA oscillator path
    )
    r = run_benchmark(config=config, n_run=n_run,
                      protocol_runs=protocol_runs, discard_first=False)
    return {"mean_ms": r["mean_ms"], "x_realtime": r["x_realtime"]}


def build_params(cfg):
    import jax
    import jax.numpy as jnp

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.models import load_model

    config = Config()
    config.preprocess.sample_rate = cfg["sample_rate"]
    config.preprocess.block_size = cfg["block_size"]
    config.preprocess.signal_length = cfg["block_size"] * 16
    config.model.kwargs.update(
        hidden_size=cfg["hidden_size"],
        n_harmonic=cfg["n_harmonic"],
        n_bands=cfg["n_bands"],
        sample_rate=cfg["sample_rate"],
        block_size=cfg["block_size"],
        use_pallas="never",
    )
    model = load_model(config)
    f = config.n_frames
    batch = {
        "sig": jnp.zeros((1, config.preprocess.signal_length), jnp.float32),
        "pitch": jnp.full((1, f, 1), 200.0, jnp.float32),
        "loudness": jnp.zeros((1, f, 1), jnp.float32),
    }
    rng = jax.random.PRNGKey(0)
    return jax.device_get(
        model.init({"params": rng, "noise": rng}, batch)["params"]
    )


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="REFBENCH.json")
    p.add_argument("--n-run", type=int, default=10)
    p.add_argument("--protocol-runs", type=int, default=3)
    args = p.parse_args()

    # both sides on the host CPU — force JAX there before backend init
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    rows = []
    for cfg in CONFIGS:
        params = build_params(cfg)
        ref = bench_torch_reference(cfg, params, args.n_run,
                                    args.protocol_runs)
        ours = bench_ours_cpu(cfg, args.n_run, args.protocol_runs)
        row = {
            **cfg,
            "torch_reference": ref,
            "ours_cpu": ours,
            "speedup_same_cpu": ref["mean_ms"] / ours["mean_ms"],
        }
        rows.append(row)
        print(
            f"{cfg['name']}: reference(torch,cpu) {ref['mean_ms']:.1f} ms "
            f"({ref['x_realtime']:.1f}x rt)  ours(cpu) {ours['mean_ms']:.1f} ms "
            f"({ours['x_realtime']:.1f}x rt)  speedup {row['speedup_same_cpu']:.2f}x"
        )

    artifact = {
        "protocol": "reference performance.py:21-41 (mean of n_run, best of "
                    "protocol_runs), batch 1, no reverb, frame controls "
                    "staged outside the timed loop",
        "host_cpus": os.cpu_count(),
        "torch_threads": torch.get_num_threads(),
        "n_run": args.n_run,
        "protocol_runs": args.protocol_runs,
        "configs": rows,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
