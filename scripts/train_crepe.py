#!/usr/bin/env python
"""Train the CREPE-architecture pitch tracker on synthesized audio.

The reference depends on CREPE's pretrained TensorFlow weights
(ddsp/core.py:100-119); this framework instead trains the same architecture
from scratch on audio *its own synthesizer family* generates — harmonic tones
with randomized harmonic rolloff, inharmonicity-free partials, noise, gain
and vibrato, labeled with exact f0.  The CREPE paper's training recipe is
kept: 360 20-cent bins, Gaussian-blurred (σ=25 cents) targets, binary
cross-entropy — with the positive bins up-weighted (--pos-weight): only ~1 %
of bins are positive, and plain BCE collapses to the base rate before any
localization is learned (measured: stuck at ~2000 cents mean error; weighted
reaches ~150 cents in 300 steps at micro capacity).

Usage:
  python scripts/train_crepe.py --capacity tiny --steps 3000 \
      --out runs/crepe_tiny.msgpack [--platform cpu]

The saved bundle plugs into preprocessing via:
  preprocess:
    pitch_tracker: crepe
    crepe_params: runs/crepe_tiny.msgpack
    crepe_capacity: tiny
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synth_batch(rng, batch, robust=False):
    """Random harmonic frames with exact f0 labels.

    robust=True adds the degradation families the deployment corpus
    measures (ddsp_pytorch_tpu/data/fixtures.py DEGRADATIONS; scored by
    scripts/pitch_accuracy.py --degraded): SNR down to -2 dB, pink noise,
    sparse-reflection room smear, and tanh soft clipping — the
    noise-augmented training recipe real CREPE owes its robustness to.

    Returns (frames (B, 1024) f32 @16 kHz, f0 (B,) Hz).
    """
    import jax
    import jax.numpy as jnp

    from ddsp_pytorch_tpu.models.crepe import FRAME_LENGTH, MODEL_SRATE

    (k_f0, k_amp, k_phase, k_noise, k_snr, k_gain, k_vib, k_vibp,
     k_form, k_fg, k_fw, k_coh, k_color, k_rev, k_revg, k_revm, k_revon,
     k_clip, k_clipd) = jax.random.split(rng, 19)
    # log-uniform f0 across the tracker's useful range
    log_f0 = jax.random.uniform(
        k_f0, (batch,), minval=math.log(40.0), maxval=math.log(1800.0)
    )
    f0 = jnp.exp(log_f0)

    n_harm = 16
    t = jnp.arange(FRAME_LENGTH) / MODEL_SRATE
    # random spectral rolloff amp_k ∝ k^-α, α ∈ [0.5, 2.5]
    alpha = jax.random.uniform(k_amp, (batch, 1), minval=0.5, maxval=2.5)
    k = jnp.arange(1, n_harm + 1)[None, :]
    amps = k.astype(jnp.float32) ** (-alpha)
    # random FORMANT resonance: boost a band of harmonics around index
    # j ∈ [2, 8] by up to 12x — without this the net never sees spectra
    # whose strongest partial is NOT the fundamental (bowed/brassy timbres)
    # and answers an octave high on them (measured: RPA 0.31 on the
    # bowed-saw fixtures before, 50-cent octave wall; see
    # scripts/pitch_accuracy.py)
    formant_pos = jax.random.uniform(k_form, (batch, 1), minval=2.0, maxval=8.0)
    formant_gain = 10.0 ** jax.random.uniform(k_fg, (batch, 1), maxval=1.1)
    formant_width = jax.random.uniform(k_fw, (batch, 1), minval=0.8, maxval=2.5)
    amps = amps * (
        1.0
        + formant_gain
        * jnp.exp(-0.5 * jnp.square((k - formant_pos) / formant_width))
    )
    # zero out harmonics above Nyquist
    amps = jnp.where(k * f0[:, None] < MODEL_SRATE / 2, amps, 0.0)
    amps = amps / jnp.sum(amps, axis=-1, keepdims=True)
    phases = jax.random.uniform(
        k_phase, (batch, n_harm), maxval=2.0 * math.pi
    )
    # half the batch phase-coherent (sawtooth/pulse-like waveforms), half
    # random-phase (string-like)
    coherent = jax.random.bernoulli(k_coh, 0.5, (batch, 1))
    phases = jnp.where(coherent, 0.0, phases)
    # mild vibrato so the net sees non-stationary pitch inside the window
    vib_depth = jax.random.uniform(k_vib, (batch, 1), maxval=0.01)
    vib = 1.0 + vib_depth * jnp.sin(
        2.0 * math.pi * 5.0 * t[None, :]
        + jax.random.uniform(k_vibp, (batch, 1), maxval=2.0 * math.pi)
    )
    inst_f = f0[:, None] * vib  # (B, T)
    phase = 2.0 * math.pi * jnp.cumsum(inst_f, axis=-1) / MODEL_SRATE
    sig = jnp.sum(
        amps[:, None, :]
        * jnp.sin(phase[:, :, None] * k[None, :, :] + phases[:, None, :]),
        axis=-1,
    )
    if robust:
        # room smear on half the batch: circular conv with a sparse IR
        # (unit direct tap + 4 random reflections within ~31 ms)
        n_taps = 4
        delays = jax.random.randint(k_rev, (batch, n_taps), 16, 500)
        signs = jax.random.rademacher(
            k_revm, (batch, n_taps), dtype=jnp.float32
        )
        gains = signs * jax.random.uniform(
            k_revg, (batch, n_taps), minval=0.15, maxval=0.5
        )
        ir = jnp.zeros((batch, FRAME_LENGTH))
        ir = ir.at[jnp.arange(batch)[:, None], delays].add(gains)
        ir = ir.at[:, 0].set(1.0)
        smeared = jnp.fft.irfft(
            jnp.fft.rfft(sig, axis=-1) * jnp.fft.rfft(ir, axis=-1),
            FRAME_LENGTH, axis=-1,
        )
        use_rev = jax.random.bernoulli(k_revon, 0.5, (batch, 1))
        sig = jnp.where(use_rev, smeared, sig)

        # colored noise down to below 0 dB SNR (pink on half the batch)
        snr_db = jax.random.uniform(
            k_snr, (batch, 1), minval=-2.0, maxval=40.0
        )
        white = jax.random.normal(k_noise, sig.shape)
        spec = jnp.fft.rfft(white, axis=-1)
        fbin = jnp.maximum(jnp.arange(spec.shape[-1], dtype=jnp.float32), 1.0)
        pink = jnp.fft.irfft(
            spec / jnp.sqrt(fbin)[None, :], FRAME_LENGTH, axis=-1
        )
        pink = pink / (jnp.std(pink, axis=-1, keepdims=True) + 1e-9)
        use_pink = jax.random.bernoulli(k_color, 0.5, (batch, 1))
        unit_noise = jnp.where(use_pink, pink, white)
        noise = unit_noise * jnp.sqrt(
            jnp.mean(jnp.square(sig), axis=-1, keepdims=True)
        ) * 10.0 ** (-snr_db / 20.0)
        out = sig + noise

        # tanh soft clip (mic-chain saturation) on ~30 % of the batch
        drive = jax.random.uniform(k_clipd, (batch, 1), minval=1.5, maxval=4.0)
        peak = jnp.max(jnp.abs(out), axis=-1, keepdims=True) + 1e-9
        clipped = jnp.tanh(drive * out / peak) * peak / jnp.tanh(drive)
        use_clip = jax.random.bernoulli(k_clip, 0.3, (batch, 1))
        out = jnp.where(use_clip, clipped, out)
    else:
        snr_db = jax.random.uniform(k_snr, (batch, 1), minval=5.0, maxval=40.0)
        noise = jax.random.normal(k_noise, sig.shape) * jnp.sqrt(
            jnp.mean(jnp.square(sig), axis=-1, keepdims=True)
        ) * 10.0 ** (-snr_db / 20.0)
        out = sig + noise
    gain = 10.0 ** jax.random.uniform(k_gain, (batch, 1), minval=-2.0, maxval=0.0)
    return out * gain, f0


def f0_to_target(f0):
    """(B,) Hz → (B, 360) Gaussian-blurred bin targets (σ = 25 cents)."""
    import jax.numpy as jnp

    from ddsp_pytorch_tpu.models.crepe import cents_grid, hz_to_cents

    grid = jnp.asarray(cents_grid())
    cents = hz_to_cents(f0)[:, None]
    return jnp.exp(-0.5 * jnp.square((grid[None, :] - cents) / 25.0))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--capacity", default="tiny")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--pos-weight", type=float, default=20.0)
    p.add_argument("--robust", action="store_true",
                   help="noise/reverb/clip-augmented training data "
                        "(synth_batch robust=True) for degradation "
                        "robustness — see pretrained/pitch_robustness.json")
    p.add_argument("--out", default="runs/crepe_tiny.msgpack")
    p.add_argument("--platform", default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import serialization

    from ddsp_pytorch_tpu.models.crepe import CREPE

    model = CREPE(capacity=args.capacity)
    rng = jax.random.PRNGKey(args.seed)
    init_frames, _ = synth_batch(rng, 8)
    variables = model.init(
        {"params": rng, "dropout": rng}, init_frames, train=True
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, rng):
        k_data, k_drop, rng = jax.random.split(rng, 3)
        frames, f0 = synth_batch(k_data, args.batch, robust=args.robust)
        target = f0_to_target(f0)

        def loss_fn(p):
            logits, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                frames,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": k_drop},
            )
            bce = args.pos_weight * target * jax.nn.softplus(-logits) + (
                1.0 - target
            ) * jax.nn.softplus(logits)
            return jnp.mean(bce), updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, rng, loss

    @jax.jit
    def eval_rpa(params, batch_stats, rng):
        """Raw pitch accuracy (±50 cents) on a fresh synthetic batch."""
        from ddsp_pytorch_tpu.models.crepe import (
            hz_to_cents,
            salience_to_cents,
        )

        frames, f0 = synth_batch(rng, 512)
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, frames
        )
        cents = salience_to_cents(jax.nn.sigmoid(logits))
        err = jnp.abs(cents - hz_to_cents(f0))
        return jnp.mean((err < 50.0).astype(jnp.float32))

    t0 = time.time()
    for step in range(1, args.steps + 1):
        params, batch_stats, opt_state, rng, loss = train_step(
            params, batch_stats, opt_state, rng
        )
        if step % 200 == 0 or step == 1:
            rpa = float(eval_rpa(params, batch_stats, jax.random.PRNGKey(99)))
            print(
                f"step {step:6d}  loss {float(loss):.5f}  RPA50 {rpa:.3f}  "
                f"({step / (time.time() - t0):.1f} steps/s)",
                flush=True,
            )

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    bundle = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(bundle))
    meta = {"capacity": args.capacity}
    print(f"saved {args.out} ({os.path.getsize(args.out)/1e6:.1f} MB) {meta}")


if __name__ == "__main__":
    main()
