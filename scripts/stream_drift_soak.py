#!/usr/bin/env python
"""Long-horizon streaming drift soak (hours-class horizons, fast-forward).

The reference's realtime path silently assumes its carried state stays
coherent forever (reference realtime/ddsp_tilde/ddsp_tilde.cpp:81-95 — the
GRU cache and implicit phase continuity are never checked).  This harness
streams >= 10^8 samples (~35 minutes of 48 kHz audio) through
StreamingSynth.step and bounds the ONLY unbounded piece of stream state —
the wrapped f32 oscillator phase carry — against an exact float64 oracle
fed the same f32 per-frame phase increments.  Everything else in the state
has finite memory (GRU: bounded tanh carry; FIR overlap tail: one block;
partitioned-reverb delay line: IR length) and is covered by the streamed ≡
offline equivalence tests at shorter horizons (tests/test_streaming.py).

Also soaks the VoicePool under periodic session churn: a long-lived slot
must produce exactly the audio of an independent batch-1 stream while
neighbor slots are acquired/released around it (row isolation over
hours-class horizons).

Writes pretrained/stream_drift_soak.json;
tests/test_streaming.py::test_long_horizon_drift_soak runs the same
harness at a reduced horizon and asserts the bounds.

Usage:
  python scripts/stream_drift_soak.py [--samples 1e8] [--platform cpu]
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TWO_PI = 2.0 * math.pi


def _controls(rng, frames):
    """Slow log-space random-walk f0 in [100, 600] Hz + loudness wobble."""
    import numpy as np

    steps = rng.standard_normal(frames) * 0.01
    logf0 = np.clip(np.log(220.0) + np.cumsum(steps),
                    np.log(100.0), np.log(600.0))
    f0 = np.exp(logf0).astype(np.float32)
    loud = (rng.standard_normal(frames) * 0.3).astype(np.float32)
    return f0, loud


def _f32_dphi_mod(f0_f32, block, sr):
    """The EXACT f32 per-frame wrapped phase increment the streaming synth
    computes (ops/oscillator.py phase_accumulate_frames: omega, dphi and
    the mod all in f32), accumulated here in f64 by the oracle."""
    import numpy as np

    omega = (np.float32(TWO_PI) * f0_f32 / np.float32(sr)).astype(np.float32)
    dphi = (np.float32(block) * omega).astype(np.float32)
    return np.mod(dphi, np.float32(TWO_PI)).astype(np.float32)


def _circular_err(a, b):
    d = (float(a) - float(b)) % TWO_PI
    return min(d, TWO_PI - d)


def _make_model_and_params(*, block: int, sr: int, hidden: int,
                           frames: int, seed: int):
    """The one soak model both harnesses stream (tiny decoder — drift is a
    property of the state threading, not the weights)."""
    import jax
    import numpy as np

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.models import load_model

    cfg = Config.from_dict(
        {
            "preprocess": {"sample_rate": sr, "signal_length": 8 * block,
                           "block_size": block},
            "model": {
                "name": "single-inst-decoder",
                "kwargs": {
                    "hidden_size": hidden, "n_harmonic": 8, "n_bands": 9,
                    "sample_rate": sr, "block_size": block,
                    "has_reverb": False, "use_pallas": "never",
                },
            },
            "train": {"scales": [512], "batch": 1},
        }
    )
    model = load_model(cfg)
    sample = {
        "sig": np.zeros((1, frames * block), np.float32),
        "pitch": np.full((1, frames, 1), 220.0, np.float32),
        "loudness": np.zeros((1, frames, 1), np.float32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(seed), "noise": jax.random.PRNGKey(1)},
        sample,
    )["params"]
    return model, params


def phase_drift_soak(total_samples: int, *, frames_per_call: int = 16,
                     block: int = 512, sr: int = 48000, hidden: int = 64,
                     n_checkpoints: int = 16, seed: int = 0) -> dict:
    """Stream `total_samples` through StreamingSynth.step; at checkpoints,
    compare the f32 phase carry against the f64 oracle."""
    import numpy as np

    from ddsp_pytorch_tpu.streaming import StreamingSynth

    frames = frames_per_call
    model, params = _make_model_and_params(
        block=block, sr=sr, hidden=hidden, frames=frames, seed=seed
    )
    synth = StreamingSynth(model, params, batch=1, seed=seed)

    n_calls = total_samples // (frames * block)
    ck_every = max(1, n_calls // n_checkpoints)
    rng = np.random.default_rng(seed)
    phi64 = 0.0
    checkpoints = []
    peak = 0.0
    t0 = time.monotonic()
    for call in range(n_calls):
        f0, loud = _controls(rng, frames)
        audio = synth.step(f0[None, :, None], loud[None, :, None])
        phi64 = (phi64 + float(
            np.sum(_f32_dphi_mod(f0, block, sr).astype(np.float64))
        )) % TWO_PI
        if (call + 1) % ck_every == 0 or call == n_calls - 1:
            a = np.asarray(audio)
            if not np.all(np.isfinite(a)):
                raise AssertionError(f"non-finite audio at call {call}")
            peak = max(peak, float(np.max(np.abs(a))))
            phase32 = float(np.asarray(synth.state.phase)[0])
            err = _circular_err(phase32, phi64)
            checkpoints.append({
                "samples": (call + 1) * frames * block,
                "phase_f32": phase32,
                "phase_oracle_f64": phi64,
                "abs_err_rad": err,
            })
    gru_max = float(np.max(np.abs(np.asarray(synth.state.gru))))
    return {
        "total_samples": n_calls * frames * block,
        "hours_at_sr": n_calls * frames * block / sr / 3600.0,
        "frames_per_call": frames,
        "block_size": block,
        "sample_rate": sr,
        "checkpoints": checkpoints,
        "max_abs_err_rad": max(c["abs_err_rad"] for c in checkpoints),
        "final_abs_err_rad": checkpoints[-1]["abs_err_rad"],
        "audio_peak": peak,
        "gru_carry_max_abs": gru_max,
        "wall_s": time.monotonic() - t0,
    }


def pool_churn_soak(total_samples: int, *, frames_per_call: int = 16,
                    block: int = 512, sr: int = 48000, hidden: int = 64,
                    voices: int = 4, churn_every: int = 50,
                    seed: int = 0) -> dict:
    """A long-lived VoicePool slot vs an independent batch-1 stream while
    neighbor slots churn (acquire → stream garbage → release) around it.
    noise_deterministic so the comparison is numeric, not stochastic."""
    import numpy as np

    from ddsp_pytorch_tpu.streaming import StreamingSynth
    from ddsp_pytorch_tpu.streaming.pool import VoicePool

    frames = frames_per_call
    model, params = _make_model_and_params(
        block=block, sr=sr, hidden=hidden, frames=frames, seed=seed
    )

    pool = VoicePool(StreamingSynth(model, params, batch=voices, seed=seed,
                                    noise_deterministic=True))
    solo = StreamingSynth(model, params, batch=1, seed=seed,
                          noise_deterministic=True)

    hero = pool.acquire()
    assert hero is not None
    rng = np.random.default_rng(seed)
    churn_rng = np.random.default_rng(seed + 1)
    n_calls = total_samples // (frames * block)
    churn_slots = []
    max_diff = 0.0
    churn_events = 0
    for call in range(n_calls):
        f0, loud = _controls(rng, frames)
        requests = {hero: (f0[:, None], loud[:, None])}
        # neighbors stream unrelated controls
        for s in churn_slots:
            nf0 = churn_rng.uniform(100, 600, frames).astype(np.float32)
            nld = churn_rng.standard_normal(frames).astype(np.float32)
            requests[s] = (nf0[:, None], nld[:, None])
        got = pool.step(requests)[hero]
        want = np.asarray(solo.step(f0[None, :, None], loud[None, :, None]))[0]
        max_diff = max(max_diff, float(np.max(np.abs(got - want))))
        if (call + 1) % churn_every == 0:
            # churn: release every neighbor, acquire a fresh set
            for s in churn_slots:
                pool.release(s)
            churn_slots = []
            for _ in range(int(churn_rng.integers(1, voices))):
                s = pool.acquire()
                if s is not None:
                    churn_slots.append(s)
            churn_events += 1
    return {
        "total_samples": n_calls * frames * block,
        "voices": voices,
        "churn_events": churn_events,
        "hero_vs_solo_max_abs_diff": max_diff,
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--samples", type=float, default=1e8)
    p.add_argument("--pool-samples", type=float, default=1e7)
    p.add_argument("--platform", default="cpu")
    p.add_argument("--out", default="pretrained/stream_drift_soak.json")
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    report = {
        "phase_drift": phase_drift_soak(int(args.samples)),
        "pool_churn": pool_churn_soak(int(args.pool_samples)),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    pd = report["phase_drift"]
    pc = report["pool_churn"]
    print(f"phase drift over {pd['total_samples']:.2e} samples "
          f"({pd['hours_at_sr']:.2f} h @ {pd['sample_rate']} Hz): "
          f"max {pd['max_abs_err_rad']:.2e} rad, "
          f"final {pd['final_abs_err_rad']:.2e} rad "
          f"(wall {pd['wall_s']:.0f}s)")
    print(f"pool churn over {pc['total_samples']:.2e} samples, "
          f"{pc['churn_events']} churns: hero-vs-solo max diff "
          f"{pc['hero_vs_solo_max_abs_diff']:.2e}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
