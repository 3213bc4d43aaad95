#!/usr/bin/env python
"""Step-level speed-of-light: per-stage device-time breakdown of the FULL
training step (round-3 VERDICT next-round #7).

Stages of the reference-workload train step (batch 16, 48 kHz, 4 s chunks,
hidden 512, 64 harmonics, 65 bands, reverb, 6-scale loss — reference
config.yaml:5-28), each timed in isolation with the chained-value
lax.scan protocol of scripts/bench_roofline.py (N dependent iterations
under ONE jit; dispatch excluded), at the reference batch and at a
throughput batch:

  gru_controls   GRUDecoder + projections (frame-rate NN)   [MXU-bound]
  oscillator     HarmonicSynth from controls                [VPU-bound]
  noise          FilteredNoise (IR + fft_convolve)          [FFT/VPU]
  reverb         Reverb (full-second IR fft_convolve)       [FFT]
  loss           6-scale STFT L1 on (rec, sig)              [FFT]
  optimizer      Adam update at the param count             [HBM]
  full_fwd       whole forward
  full_step      whole fwd+bwd+update (the real train step)

Each stage gets a speed-of-light denominator measured ON THE SAME CHIP by
a structurally-matching microbench (same dtype/shape class):

  matmul_ceiling   chained 512-class f32 matmuls → TFLOP/s
  fft_ceiling      chained rfft(4096) batches → GFLOP/s (5N log2 N)
  hbm_ceiling      chained saxpy over ~64 MB arrays → GB/s

plus the bf16 verdict: full_step with model dtype bf16 at every batch, to
settle whether the `dtype` knob earns its keep (round-3 BASELINE.md
measured it strictly slower at batch 16).

Usage (real chip, nothing else on the TPU):
  python scripts/bench_step_breakdown.py --out ROOFLINE_r04.json
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_VALUE_PULL = False  # set by --value-pull: sync each rep with a value pull


def _timed_loop(body, iters, reps=5):
    """Chained-scan device time per iteration (seconds).

    With --value-pull each rep is synchronized by pulling the scan's
    carry scalar (float(c)) instead of block_until_ready — the only
    truthful sync on this container's tunnel, where block_until_ready
    fake-ACKs (BASELINE.md 'the tunnel lies').  The pull is 4 bytes, so
    the added transfer time is negligible; what it adds is the WAIT for
    real execution."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop():
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    if _VALUE_PULL:
        float(loop())  # compile + warm + drain any queued work
    else:
        jax.block_until_ready(loop())  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        if _VALUE_PULL:
            float(loop())
        else:
            jax.block_until_ready(loop())
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _batch(cfg, batch_size, rng):
    import jax.numpy as jnp

    F = cfg["signal_length"] // cfg["block_size"]
    return {
        "sig": jnp.asarray(
            (rng.standard_normal((batch_size, cfg["signal_length"])) * 0.1)
            .astype("float32")),
        "pitch": jnp.asarray(
            rng.uniform(100, 400, (batch_size, F, 1)).astype("float32")),
        "loudness": jnp.asarray(
            rng.standard_normal((batch_size, F, 1)).astype("float32")),
    }


def measure_stages(batch_size, iters, dtype="float32"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.training import Trainer
    from ddsp_pytorch_tpu.training.loss import spectral_loss_from_signals

    cfgd = {"sample_rate": 48000, "signal_length": 192000, "block_size": 512}
    cfg = Config.from_dict(
        {
            "preprocess": cfgd,
            "model": {
                "name": "single-inst-decoder",
                "kwargs": {
                    "hidden_size": 512, "n_harmonic": 64, "n_bands": 65,
                    "sample_rate": 48000, "block_size": 512,
                    "has_reverb": True, "dtype": dtype,
                },
            },
            "train": {
                "batch": batch_size,
                "scales": [4096, 2048, 1024, 512, 256, 128],
                "overlap": 0.75,
            },
        }
    )
    import tempfile

    trainer = Trainer(cfg, tempfile.mkdtemp(), use_tensorboard=False)
    rng = np.random.default_rng(0)
    batch = _batch(cfgd, batch_size, rng)
    jax.block_until_ready(list(batch.values()))
    state = trainer.init_state(batch)
    model = trainer.model
    params = state.params

    # ---- stage inputs (computed once, staged on device)
    controls = model.apply(
        {"params": params}, batch["pitch"], batch["loudness"],
        method=model.frame_controls,
    )
    harmonic_ctrls, noise_ctrls = jax.tree.map(lambda x: x, controls)
    rec = model.apply({"params": params}, batch,
                      rngs={"noise": jax.random.PRNGKey(0)})["signal"]
    jax.block_until_ready((controls, rec))

    def dep(x, c):
        return x + c * jnp.float32(1e-38)

    stages = {}

    # gru_controls (fwd)
    def body(c, _):
        h, n = model.apply(
            {"params": params}, dep(batch["pitch"], c), batch["loudness"],
            method=model.frame_controls,
        )
        return jnp.sum(h["amplitudes"][0, 0]) * 0 + jnp.mean(h["f0"]), None

    stages["gru_controls"] = _timed_loop(body, iters)

    # oscillator from fixed controls
    def body(c, _):
        audio = model.apply(
            {"params": params},
            method=lambda m: m.harmonic_synth(
                **{**harmonic_ctrls,
                   "amplitudes": dep(harmonic_ctrls["amplitudes"], c)}
            ),
        )
        return jnp.mean(audio), None

    stages["oscillator"] = _timed_loop(body, iters)

    # noise branch
    def body(c, _):
        audio = model.apply(
            {"params": params},
            rngs={"noise": jax.random.PRNGKey(1)},
            method=lambda m: m.noise_synth(
                **{**noise_ctrls,
                   "magnitudes": dep(noise_ctrls["magnitudes"], c)}
            ),
        )
        return jnp.mean(audio), None

    stages["noise"] = _timed_loop(body, iters)

    # reverb on the rendered signal
    def body(c, _):
        audio = model.apply(
            {"params": params}, method=lambda m: m.reverb(dep(rec, c))
        )
        return jnp.mean(audio), None

    stages["reverb"] = _timed_loop(body, iters)

    # multiscale loss
    def body(c, _):
        loss, _, _ = spectral_loss_from_signals(
            batch["sig"], dep(rec, c), cfg.train.scales, cfg.train.overlap
        )
        return loss, None

    stages["loss"] = _timed_loop(body, iters)

    # optimizer update at the real param count (grads = params as dummies)
    tx = trainer.tx
    opt_state = tx.init(params)

    def body(c, _):
        grads = jax.tree.map(lambda p: p * jnp.float32(1e-30) + c * 1e-38,
                             params)
        updates, _ = tx.update(grads, opt_state, params)
        # keep EVERY leaf alive or XLA dead-code-eliminates the update
        return sum(jnp.sum(u) for u in jax.tree.leaves(updates)), None

    stages["optimizer"] = _timed_loop(body, iters)

    # full forward
    def body(c, _):
        out = model.apply(
            {"params": params},
            {**batch, "pitch": dep(batch["pitch"], c)},
            rngs={"noise": jax.random.PRNGKey(2)},
        )
        return jnp.mean(out["signal"]), None

    stages["full_fwd"] = _timed_loop(body, iters)

    # full train step (fwd+bwd+update)
    holder_state = state

    def body(c, _):
        b = {**batch, "pitch": dep(batch["pitch"], c)}
        new_state, m = trainer._train_step(holder_state, b)
        return m["loss"], None

    stages["full_step"] = _timed_loop(body, iters)

    # parameter count for the optimizer HBM model
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    return stages, n_params, cfg


def measure_ceilings():
    """Same-chip microbench ceilings: matmul TFLOP/s, FFT GFLOP/s, HBM
    GB/s."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(1)
    out = {}

    # matmul ceiling: f32 (B, 512) @ (512, 1536) GRU-class matmuls, chained
    B = 16 * 375  # every frame of the reference batch at once
    x = jnp.asarray(rng.standard_normal((B, 512)).astype("float32"))
    w = jnp.asarray(rng.standard_normal((512, 1536)).astype("float32"))

    def body(c, _):
        y = (x + c * 1e-38) @ w
        return jnp.mean(y), None

    s = _timed_loop(body, 50)
    out["matmul_f32_tflops"] = 2 * B * 512 * 1536 / s / 1e12

    # bf16 matmul ceiling (same shape)
    xb, wb = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)

    def body(c, _):
        y = (xb + c.astype(jnp.bfloat16)) @ wb
        return jnp.mean(y).astype(jnp.float32), None

    s = _timed_loop(body, 50)
    out["matmul_bf16_tflops"] = 2 * B * 512 * 1536 / s / 1e12

    # fft ceiling: the loss's biggest scale — batched rfft(4096)
    n, nb = 4096, 16 * 184  # frames of scale 4096 @ 0.75 overlap, batch 16
    sig = jnp.asarray(rng.standard_normal((nb, n)).astype("float32"))

    def body(c, _):
        spec = jnp.fft.rfft(sig + c * 1e-38)
        return jnp.mean(jnp.abs(spec)), None

    s = _timed_loop(body, 20)
    out["fft4096_gflops"] = 5 * n * math.log2(n) * nb / s / 1e9
    out["fft4096_s_per_batch"] = s

    # HBM ceiling: saxpy over 64 MB
    N = 16 * 1024 * 1024
    a = jnp.asarray(rng.standard_normal((N,)).astype("float32"))
    b = jnp.asarray(rng.standard_normal((N,)).astype("float32"))

    def body(c, _):
        y = a * 1.0001 + b + c * 1e-38
        return jnp.mean(y), None

    s = _timed_loop(body, 20)
    out["hbm_saxpy_gbps"] = 3 * 4 * N / s / 1e9  # 2 reads + 1 write
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="ROOFLINE_r04.json")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batches", default="16,128")
    p.add_argument("--platform", default=None)
    p.add_argument(
        "--value-pull", action="store_true",
        help="sync each timed rep with a 4-byte value pull instead of "
        "block_until_ready — the honest protocol on the axon tunnel "
        "(BASELINE.md 'the tunnel lies')",
    )
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.value_pull:
        global _VALUE_PULL
        _VALUE_PULL = True

    import jax

    dev = jax.devices()[0]
    report = {
        "what": "per-stage device time of the reference-workload train "
                "step + same-chip microbench ceilings",
        "platform": {"platform": dev.platform,
                     "device_kind": getattr(dev, "device_kind", "?")},
        "sync": "value-pull (honest)" if args.value_pull
                else "block_until_ready (dispatch rate on the tunnel)",
        "protocol": "chained-value lax.scan under one jit "
                    "(scripts/bench_roofline.py), best of 5 loops",
        "ceilings": measure_ceilings(),
        "batches": {},
    }
    print(json.dumps(report["ceilings"], indent=1), flush=True)

    for bs in [int(b) for b in args.batches.split(",")]:
        stages, n_params, cfg = measure_stages(bs, args.iters)
        total = stages["full_step"]
        accounted = sum(stages[k] for k in
                       ("gru_controls", "oscillator", "noise", "reverb",
                        "loss", "optimizer"))
        entry = {
            "stages_ms": {k: round(v * 1e3, 4) for k, v in stages.items()},
            "n_params": n_params,
            "fwd_stage_sum_vs_full_fwd": round(
                sum(stages[k] for k in ("gru_controls", "oscillator",
                                        "noise", "reverb")) /
                stages["full_fwd"], 3),
            "fwd_stages_plus_loss_opt_vs_full_step": round(
                accounted / total, 3),
            "steps_per_s_full_step": round(1.0 / total, 1),
        }
        # bf16 verdict at this batch
        bf16_stages, _, _ = measure_stages(bs, args.iters, dtype="bfloat16")
        entry["full_step_ms_bf16"] = round(bf16_stages["full_step"] * 1e3, 4)
        entry["bf16_speedup_full_step"] = round(
            total / bf16_stages["full_step"], 3)
        entry["gru_ms_bf16"] = round(bf16_stages["gru_controls"] * 1e3, 4)
        entry["bf16_speedup_gru"] = round(
            stages["gru_controls"] / bf16_stages["gru_controls"], 3)
        report["batches"][str(bs)] = entry
        print(json.dumps({str(bs): entry}, indent=1), flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
