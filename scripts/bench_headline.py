#!/usr/bin/env python
"""Headline benchmarks: the five BASELINE.json workload configs, measured.

Each config prints ONE JSON line.  Configs 2-5 run on the default device
(the real TPU chip here); config 1 is the reference's CPU-portability bar
and runs on CPU (in a subprocess when mixed with the others, since the
platform pin is process-wide).  The multi-device sharding that configs 4/5
would spread over a pod is exactness-pinned on the 8-device virtual CPU
mesh by tests/test_parallel.py, tests/test_longform.py and the Trainer
mesh integration test; this container exposes one real chip, so ICI
scaling itself cannot be measured (BASELINE.md).

  1. single-voice 16 kHz decoder forward (CPU)
  2. 48 kHz 100-harmonic voice + noise + in-stream reverb, batch 1
  3. reference-workload training step, batch 16, full backward
  4. multi-instrument family training step, batch 64
  5. long-form polyphonic synthesis slab (32 voices x 8 s, time-sharded DSP
     path incl. full-IR overlap-save reverb)

Usage: python scripts/bench_headline.py [--configs 1,2,3,4,5]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bestmean(fn, reps, outer=3):
    """Best-of-`outer` protocol means of `reps` timed calls (BASELINE.md
    protocol: the tunnel has multi-ms transients; each candidate is an
    honest mean of `reps` blocked calls)."""
    import jax

    jax.block_until_ready(fn())  # warmup/compile
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(fn())
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def config_1():
    """Single-voice 16 kHz decoder forward on CPU (BASELINE.json #1)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.models import load_model

    sr, block, sl = 16000, 256, 64000  # one 4 s clip at 16 kHz
    cfg = Config.from_dict(
        {
            "preprocess": {"sample_rate": sr, "signal_length": sl, "block_size": block},
            "model": {
                "name": "single-inst-decoder",
                "kwargs": {
                    "hidden_size": 512, "n_harmonic": 64, "n_bands": 65,
                    "sample_rate": sr, "block_size": block, "has_reverb": True,
                    "use_pallas": "never",
                },
            },
        }
    )
    model = load_model(cfg)
    f = sl // block
    batch = {
        "sig": jnp.zeros((1, sl), jnp.float32),
        "pitch": jnp.full((1, f, 1), 220.0, jnp.float32),
        "loudness": jnp.zeros((1, f, 1), jnp.float32),
    }
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "noise": rng}, batch)["params"]
    fwd = jax.jit(
        lambda p, b: model.apply({"params": p}, b, rngs={"noise": rng})["signal"]
    )
    mean = _bestmean(lambda: fwd(params, batch), reps=5)
    return {
        "config": 1,
        "desc": "single-voice 16kHz decoder forward, CPU",
        "ms": round(1000 * mean, 2),
        "x_realtime": round(sl / sr / mean, 1),
    }


def config_2():
    """48 kHz 100-harmonic voice + noise + in-stream reverb, batch 1."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.models import load_model
    from ddsp_pytorch_tpu.streaming import StreamingSynth

    sr, block = 48000, 512
    cfg = Config()
    cfg.preprocess.sample_rate = sr
    cfg.preprocess.block_size = block
    cfg.model.kwargs.update(
        hidden_size=512, n_harmonic=100, n_bands=65,
        sample_rate=sr, block_size=block,
    )
    model = load_model(cfg)
    f = cfg.n_frames
    batch = {
        "sig": jnp.zeros((1, cfg.preprocess.signal_length)),
        "pitch": jnp.full((1, f, 1), 200.0),
        "loudness": jnp.zeros((1, f, 1)),
    }
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "noise": rng}, batch)["params"]
    synth = StreamingSynth(model, params, batch=1, include_reverb=True)

    n = 65536 // block * block
    rr = np.random.default_rng(0)
    f0 = jnp.asarray(rr.uniform(100, 400, (1, n // block, 1)).astype(np.float32))
    lo = jnp.asarray(rr.standard_normal((1, n // block, 1)).astype(np.float32))
    jax.block_until_ready((f0, lo))
    mean = _bestmean(lambda: synth.step(f0, lo), reps=20)
    return {
        "config": 2,
        "desc": "48kHz 100-harm voice + noise + in-stream reverb, batch 1",
        "ms_per_call": round(1000 * mean, 3),
        "x_realtime": round(n / sr / mean, 1),
    }


def _train_steprate(batch_size):
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.training import Trainer

    cfg = Config.from_dict(
        {
            "preprocess": {
                "sample_rate": 48000, "signal_length": 192000, "block_size": 512,
            },
            "model": {
                "name": "single-inst-decoder",
                "kwargs": {
                    "hidden_size": 512, "n_harmonic": 64, "n_bands": 65,
                    "sample_rate": 48000, "block_size": 512, "has_reverb": True,
                },
            },
            "train": {
                "batch": batch_size,
                "scales": [4096, 2048, 1024, 512, 256, 128],
                "overlap": 0.75,
            },
        }
    )
    trainer = Trainer(cfg, tempfile.mkdtemp(), use_tensorboard=False)
    F = 192000 // 512
    rr = np.random.default_rng(0)
    batch = {
        "sig": jnp.asarray(
            rr.standard_normal((batch_size, 192000)).astype(np.float32) * 0.1
        ),
        "pitch": jnp.asarray(
            rr.uniform(100, 400, (batch_size, F, 1)).astype(np.float32)
        ),
        "loudness": jnp.asarray(
            rr.standard_normal((batch_size, F, 1)).astype(np.float32)
        ),
    }
    jax.block_until_ready(list(batch.values()))
    state = trainer.init_state(batch)
    holder = {"state": state}

    def step():
        holder["state"], m = trainer._train_step(holder["state"], batch)
        return m["loss"]

    return _bestmean(step, reps=30)


def config_3():
    """Reference-workload training step: batch 16, full backward."""
    mean = _train_steprate(16)
    return {
        "config": 3,
        "desc": "training step, reference workload (batch 16, 4s@48kHz, "
                "6-scale loss, reverb, Adam, full backward)",
        "ms_per_step": round(1000 * mean, 2),
        "steps_per_s": round(1 / mean, 1),
        "gsamples_per_s": round(16 * 192000 / mean / 1e9, 2),
    }


def config_4():
    """Multi-instrument family training at batch 64 on one chip (the
    voice-sharded multi-chip version of this step is exactness-pinned on
    the virtual mesh by tests/test_parallel.py)."""
    mean = _train_steprate(64)
    return {
        "config": 4,
        "desc": "multi-instrument training step, batch 64 "
                "(sax+violin+flute family batch), 1 chip",
        "ms_per_step": round(1000 * mean, 2),
        "steps_per_s": round(1 / mean, 1),
        "gsamples_per_s": round(64 * 192000 / mean / 1e9, 2),
    }


def config_5():
    """Long-form polyphonic synthesis slab through the time-shardable DSP
    path (LongFormSynthesizer on a 1x1 mesh here; the 256-voice x 10-min
    workload is this slab tiled over a pod's ('data','time') mesh —
    sharded ≡ unsharded is pinned by tests/test_longform.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.models import load_model
    from ddsp_pytorch_tpu.parallel import make_mesh
    from ddsp_pytorch_tpu.parallel.longform import LongFormSynthesizer

    sr, block = 48000, 512
    voices, seconds = 32, 8
    sl = seconds * sr // block * block
    f = sl // block
    cfg = Config.from_dict(
        {
            "preprocess": {"sample_rate": sr, "signal_length": sl, "block_size": block},
            "model": {
                "name": "single-inst-decoder",
                "kwargs": {
                    "hidden_size": 512, "n_harmonic": 64, "n_bands": 65,
                    "sample_rate": sr, "block_size": block, "has_reverb": True,
                },
            },
        }
    )
    model = load_model(cfg)
    rng = jax.random.PRNGKey(0)
    init_batch = {
        "sig": jnp.zeros((1, sl), jnp.float32),
        "pitch": jnp.full((1, f, 1), 220.0, jnp.float32),
        "loudness": jnp.zeros((1, f, 1), jnp.float32),
    }
    params = model.init({"params": rng, "noise": rng}, init_batch)["params"]

    mesh = make_mesh(data=1, time=1, devices=jax.devices()[:1])
    synth = LongFormSynthesizer(model, params, mesh)
    rr = np.random.default_rng(0)
    f0 = jnp.asarray(rr.uniform(100, 400, (voices, f, 1)).astype(np.float32))
    lo = jnp.asarray(rr.standard_normal((voices, f, 1)).astype(np.float32))
    jax.block_until_ready((f0, lo))
    mean = _bestmean(lambda: synth.synthesize(f0, lo), reps=5)
    total = voices * sl
    return {
        "config": 5,
        "desc": f"long-form synthesis slab: {voices} voices x {seconds}s "
                "(decoder + oscillator + noise + full-IR reverb), 1 chip",
        "ms": round(1000 * mean, 1),
        "gsamples_per_s": round(total / mean / 1e9, 2),
        "x_realtime_aggregate": round(total / sr / mean, 0),
        "min_of_256voice_10min_on_this_chip_s": round(
            256 * 600 * sr / (total / mean), 1
        ),
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--configs", default="1,2,3,4,5")
    args = p.parse_args()
    try:
        wanted = sorted({int(c) for c in args.configs.split(",")})
    except ValueError:
        p.error(f"--configs must be comma-separated integers, got {args.configs!r}")
    bad = [c for c in wanted if c not in (1, 2, 3, 4, 5)]
    if bad:
        p.error(f"unknown config id(s) {bad}; valid: 1-5")

    if 1 in wanted and len(wanted) > 1:
        # config 1 pins the process to CPU — run it isolated
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--configs", "1"],
            check=True,
        )
        wanted.remove(1)

    runners = {1: config_1, 2: config_2, 3: config_3, 4: config_4, 5: config_5}
    for c in wanted:
        print(json.dumps(runners[c]()), flush=True)


if __name__ == "__main__":
    main()
