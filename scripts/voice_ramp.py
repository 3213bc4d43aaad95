#!/usr/bin/env python
"""VoicePool serving ramp under HONEST accounting (round-5 VERDICT #6).

Ramps concurrent voices V=1→max through one compiled batch-V masked step
(streaming/pool.py) and times each block end-to-end: dispatch + REAL
execution + the device→host pull of the audio (VoicePool.step returns
host audio, so its wall-clock is pull-verified by construction — the
no-fake-ACK protocol of BASELINE.md 'the tunnel lies').  Reports per-block
ms against the 2·block_size streaming budget (the reference's structural
42.7 ms at 48 kHz/512, realtime/ddsp_tilde/ddsp_tilde.cpp:7,87) and the
resulting realtime-capable voice count.

Usage:
  python scripts/voice_ramp.py [--platform cpu] [--pool 32]
         [--out /dev/stdout]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--platform", default=None)
    p.add_argument("--pool", type=int, default=32)
    p.add_argument("--ramp", default="1,2,4,8,16,32")
    p.add_argument("--sample-rate", type=int, default=48000)
    p.add_argument("--block-size", type=int, default=512)
    p.add_argument("--harmonics", type=int, default=100)
    p.add_argument("--hidden", type=int, default=512)
    p.add_argument("--frames", type=int, default=8,
                   help="frames per block step (8 → 4096 samples ≈ 85 ms)")
    p.add_argument("--n-run", type=int, default=6)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import numpy as np

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.models import load_model
    from ddsp_pytorch_tpu.streaming import StreamingSynth
    from ddsp_pytorch_tpu.streaming.pool import VoicePool

    sr, block, F = args.sample_rate, args.block_size, args.frames
    cfg = Config.from_dict({
        "preprocess": {"sample_rate": sr, "signal_length": 8 * block,
                       "block_size": block},
        "model": {"name": "single-inst-decoder", "kwargs": {
            "hidden_size": args.hidden, "n_harmonic": args.harmonics,
            "n_bands": 65, "sample_rate": sr, "block_size": block,
            "has_reverb": False}},
    })
    model = load_model(cfg)
    import jax.numpy as jnp

    init = {
        "sig": jnp.zeros((1, 8 * block), jnp.float32),
        "pitch": jnp.full((1, 8, 1), 220.0),
        "loudness": jnp.zeros((1, 8, 1)),
    }
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    params = model.init(rngs, init)["params"]
    synth = StreamingSynth(model, params, batch=args.pool,
                           noise_deterministic=True)
    pool = VoicePool(synth)

    budget_ms = 2 * block / sr * 1000.0  # the engine block budget
    block_ms = F * block / sr * 1000.0
    rng = np.random.default_rng(0)
    rows = []
    slots = []
    for v in [int(x) for x in args.ramp.split(",") if x]:
        while len(slots) < v:
            s = pool.acquire()
            assert s is not None
            slots.append(s)
        reqs = {
            s: (np.full((F, 1), 220.0 + 5 * i, np.float32),
                (-0.5 + 0.05 * rng.standard_normal((F, 1)))
                .astype(np.float32))
            for i, s in enumerate(slots)
        }
        pool.step(reqs)  # warm (compile once at batch=pool)
        times = []
        for _ in range(args.n_run):
            t0 = time.perf_counter()
            out = pool.step(reqs)
            times.append(time.perf_counter() - t0)
        assert len(out) == v and all(o.shape == (F * block,)
                                     for o in out.values())
        ms = 1000.0 * min(times)
        rows.append({
            "voices": v,
            "block_ms_best": round(ms, 2),
            "block_ms_mean": round(1000.0 * sum(times) / len(times), 2),
            "per_voice_ms": round(ms / v, 3),
            "x_realtime_aggregate": round(v * block_ms / ms, 1),
            "realtime_ok": ms <= block_ms,
        })
        print(json.dumps(rows[-1]), flush=True)

    dev = jax.devices()[0]
    report = {
        "what": "VoicePool ramp, honest per-block accounting (host audio "
                "pulled every step; no block_until_ready anywhere)",
        "platform": {"platform": dev.platform,
                     "device_kind": getattr(dev, "device_kind", "?")},
        "pool": args.pool,
        "block_samples": F * block,
        "block_ms": round(block_ms, 1),
        "engine_budget_ms": round(budget_ms, 1),
        "voice": f"{args.harmonics} harmonics, hidden {args.hidden}, "
                 f"{sr} Hz",
        "rows": rows,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
