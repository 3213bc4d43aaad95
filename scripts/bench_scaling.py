#!/usr/bin/env python
"""Weak-scaling sweep of the data-parallel train step.

Sweeps mesh sizes 1, 2, 4, ... over the visible devices with the global
batch scaled proportionally (weak scaling), and reports steps/s, samples/s
and parallel efficiency vs. the 1-device run.  On a real pod slice this is
the ≥80 %-efficiency measurement from BASELINE.md; this container exposes a
single chip, so CI runs it on the virtual CPU mesh for plumbing coverage
(numbers there reflect CPU core contention, not ICI).

Usage: python scripts/bench_scaling.py [--platform cpu] [--per-device-batch 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    p.add_argument("--per-device-batch", type=int, default=2)
    p.add_argument("--signal-length", type=int, default=48000)
    p.add_argument("--sample-rate", type=int, default=48000)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--out", default=None,
                   help="write the JSON result to this file as well "
                        "(e.g. SCALING_r02.json)")
    args = p.parse_args()

    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.models import load_model
    from ddsp_pytorch_tpu.parallel import make_mesh, replicate_state, shard_batch
    from ddsp_pytorch_tpu.parallel.sharding import shard_train_step
    from ddsp_pytorch_tpu.training import create_train_state, make_train_step
    from ddsp_pytorch_tpu.training.train import make_optimizer

    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32, 64) if d <= n_dev]

    block = 512
    sl = args.signal_length // block * block
    cfg = Config.from_dict(
        {
            "preprocess": {
                "sample_rate": args.sample_rate,
                "signal_length": sl,
                "block_size": block,
            },
            "model": {
                "name": "single-inst-decoder",
                "kwargs": {
                    "hidden_size": 512,
                    "n_harmonic": 64,
                    "n_bands": 65,
                    "sample_rate": args.sample_rate,
                    "block_size": block,
                    "has_reverb": True,
                },
            },
            "train": {"scales": [4096, 2048, 1024, 512, 256, 128],
                      "overlap": 0.75},
        }
    )
    model = load_model(cfg)
    tx = make_optimizer(cfg)
    step_fn = make_train_step(model, tx, cfg)
    f = sl // block
    rng = np.random.default_rng(0)

    results = []
    base_sps = None
    for d in sizes:
        b = d * args.per_device_batch
        batch = {
            "sig": jnp.asarray(rng.standard_normal((b, sl)).astype(np.float32)),
            "pitch": jnp.asarray(rng.uniform(100, 400, (b, f, 1)).astype(np.float32)),
            "loudness": jnp.asarray(
                rng.standard_normal((b, f, 1)).astype(np.float32)
            ),
        }
        mesh = make_mesh(data=d, time=1, devices=jax.devices()[:d])
        state = replicate_state(create_train_state(model, batch, tx), mesh)
        sharded = shard_train_step(step_fn, mesh)
        sbatch = shard_batch(batch, mesh)
        state, m = sharded(state, sbatch)
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            state, m = sharded(state, sbatch)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / args.reps
        sps = b * sl / dt
        per_dev = sps / d
        if base_sps is None:
            base_sps = per_dev
        eff = per_dev / base_sps
        results.append(
            {"devices": d, "global_batch": b, "step_ms": 1000 * dt,
             "samples_per_s": sps, "efficiency": eff}
        )
        print(
            f"devices {d:3d}: step {1000*dt:7.2f} ms  "
            f"{sps/1e6:9.1f} Msamples/s  efficiency {eff:5.1%}"
        )
    payload = {
        "platform": jax.default_backend(),
        "workload": {
            "per_device_batch": args.per_device_batch,
            "signal_length": sl,
            "sample_rate": args.sample_rate,
            "hidden": 512, "n_harmonic": 64, "reverb": True,
            "scales": cfg.train.scales,
        },
        "protocol": (
            "weak scaling: global batch = devices * per_device_batch; "
            "steps/s from mean of --reps steps after one warmup; "
            "efficiency = per-device samples/s vs the 1-device run. "
            "On a pod slice: python scripts/bench_scaling.py "
            "--per-device-batch 16 --reps 30 --out SCALING.json "
            "(no --platform; the mesh uses all visible chips). "
            "This container has 1 real chip, so committed artifacts are "
            "virtual-CPU-mesh plumbing runs (numbers = core contention, "
            "not ICI)."
        ),
        "results": results,
    }
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
