"""Oscillator bank: frame-factored path vs literal cumsum oracle, phase
continuity for streaming, gradients, and the Pallas kernel (interpret mode).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_pytorch_tpu.ops import (
    harmonic_synth,
    harmonic_synth_frames,
    phase_accumulate_frames,
    upsample,
)
from ddsp_pytorch_tpu.ops.pallas_kernels.oscillator import harmonic_synth_pallas


def _oracle_f64(f0_frames, amp_frames, block, sr):
    """Literal reference math (cumsum over samples) in float64."""
    f0 = np.repeat(np.asarray(f0_frames, np.float64), block, axis=1)
    amp = np.repeat(np.asarray(amp_frames, np.float64), block, axis=1)
    omega = np.cumsum(2 * np.pi * f0 / sr, axis=1)  # (B, T)
    k = np.arange(1, amp.shape[-1] + 1)
    return (np.sin(omega[..., None] * k) * amp).sum(-1)


@pytest.fixture
def controls(rng):
    b, f, k, block, sr = 2, 25, 8, 64, 16000
    f0 = rng.uniform(100, 400, (b, f)).astype(np.float32)
    amp = (rng.random((b, f, k)) / k).astype(np.float32)
    return f0, amp, block, sr


def test_frames_path_matches_literal_oracle(controls):
    f0, amp, block, sr = controls
    got = harmonic_synth_frames(
        jnp.asarray(f0), jnp.asarray(amp), block, sr, use_pallas="never"
    )
    want = _oracle_f64(f0, amp, block, sr)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_sample_rate_api_matches_oracle(controls):
    f0, amp, block, sr = controls
    f0_up = upsample(jnp.asarray(f0)[..., None], block)
    amp_up = upsample(jnp.asarray(amp), block)
    got = harmonic_synth(f0_up, amp_up, sr)[..., 0]
    want = _oracle_f64(f0, amp, block, sr)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_long_sequence_phase_accuracy():
    """f32 phase over ~4 s must stay accurate thanks to mod-2π wrapping.

    The literal f32 cumsum (reference behavior) accumulates error over 192k
    samples; the frame-factored wrapped path must beat it against an f64
    oracle.
    """
    sr, block, f = 16000, 160, 500  # 5 s
    b = 1
    f0 = np.full((b, f), 311.3, np.float32)
    amp = np.ones((b, f, 1), np.float32)
    got = np.asarray(
        harmonic_synth_frames(
            jnp.asarray(f0), jnp.asarray(amp), block, sr, use_pallas="never"
        )
    )
    want = _oracle_f64(f0, amp, block, sr)
    err = np.abs(got - want).max()
    assert err < 1e-3, f"phase drift too large: {err}"


def test_phase_carry_streaming_equivalence(controls):
    """Synthesizing in two chunks with a phase carry equals one shot."""
    f0, amp, block, sr = controls
    full = harmonic_synth_frames(
        jnp.asarray(f0), jnp.asarray(amp), block, sr, use_pallas="never"
    )
    half = f0.shape[1] // 2
    a1, ph = harmonic_synth_frames(
        jnp.asarray(f0[:, :half]),
        jnp.asarray(amp[:, :half]),
        block,
        sr,
        return_phase=True,
        use_pallas="never",
    )
    a2 = harmonic_synth_frames(
        jnp.asarray(f0[:, half:]),
        jnp.asarray(amp[:, half:]),
        block,
        sr,
        phase0=ph,
        use_pallas="never",
    )
    streamed = jnp.concatenate([a1, a2], axis=-1)
    np.testing.assert_allclose(streamed, full, atol=1e-4)


def test_gradients_flow_and_are_finite(controls):
    f0, amp, block, sr = controls

    def loss(f0_, amp_):
        y = harmonic_synth_frames(f0_, amp_, block, sr, use_pallas="never")
        return jnp.sum(jnp.square(y))

    g_f0, g_amp = jax.grad(loss, argnums=(0, 1))(jnp.asarray(f0), jnp.asarray(amp))
    assert np.all(np.isfinite(g_f0)) and np.all(np.isfinite(g_amp))
    assert float(jnp.abs(g_amp).max()) > 0


def test_nyquist_masked_harmonics_produce_no_aliasing(rng):
    """Property test: with the anti-alias mask no energy appears above
    Nyquist-folded frequencies (SURVEY.md §4 property test #2)."""
    from ddsp_pytorch_tpu.ops import remove_above_nyquist

    sr, block, f = 8000, 64, 64
    f0v = 950.0  # harmonics 5+ are ≥ 4750 ≥ Nyquist
    f0 = jnp.full((1, f), f0v, jnp.float32)
    amp = jnp.ones((1, f, 8), jnp.float32)
    amp = remove_above_nyquist(amp, f0[..., None], sr)
    y = np.asarray(
        harmonic_synth_frames(f0, amp, block, sr, use_pallas="never")
    )[0]
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    freqs = np.fft.rfftfreq(len(y), 1 / sr)
    kept = spec[np.abs(freqs - f0v) < 50].max()
    # masked harmonics k=5..8 fold to |k*950 mod 8000 reflected|:
    # 4750→3250, 5700→2300, 6650→1350, 7600→400 — none coincide with kept
    # harmonics (950k). Energy there must be ≥ ~40 dB down (mask = 1e-4).
    for folded in (3250.0, 2300.0, 1350.0, 400.0):
        aliased = spec[np.abs(freqs - folded) < 50].max()
        assert aliased < kept * 1e-2, f"alias energy at {folded} Hz"


# ------------------------------------------------------------------ pallas


class TestPallasKernel:
    def _run(self, f0, amp, block, sr):
        phi, _ = phase_accumulate_frames(jnp.asarray(f0), block, sr)
        return harmonic_synth_pallas(
            jnp.asarray(f0), jnp.asarray(amp), phi, block, sr, interpret=True
        )

    def test_forward_matches_xla(self, controls):
        f0, amp, block, sr = controls
        got = self._run(f0, amp, block, sr)
        want = harmonic_synth_frames(
            jnp.asarray(f0), jnp.asarray(amp), block, sr, use_pallas="never"
        )
        np.testing.assert_allclose(got, want, atol=5e-4)

    def test_chebyshev_recurrence_stability_high_k(self, rng):
        """64 harmonics through the recurrence stay close to direct sin."""
        b, f, k, block, sr = 1, 8, 64, 128, 48000
        f0 = rng.uniform(60, 300, (b, f)).astype(np.float32)
        amp = (rng.random((b, f, k)) / k).astype(np.float32)
        got = self._run(f0, amp, block, sr)
        want = _oracle_f64(f0, amp, block, sr)
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_backward_matches_xla_grads(self, controls):
        f0, amp, block, sr = controls

        def loss_pallas(f0_, amp_):
            phi, _ = phase_accumulate_frames(f0_, block, sr)
            y = harmonic_synth_pallas(f0_, amp_, phi, block, sr, interpret=True)
            return jnp.sum(jnp.sin(y))  # nonlinear to exercise chain rule

        def loss_xla(f0_, amp_):
            y = harmonic_synth_frames(f0_, amp_, block, sr, use_pallas="never")
            return jnp.sum(jnp.sin(y))

        gp = jax.grad(loss_pallas, argnums=(0, 1))(jnp.asarray(f0), jnp.asarray(amp))
        gx = jax.grad(loss_xla, argnums=(0, 1))(jnp.asarray(f0), jnp.asarray(amp))
        np.testing.assert_allclose(gp[0], gx[0], rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(gp[1], gx[1], rtol=5e-3, atol=5e-3)


def test_chebyshev_xla_matches_direct_and_f64(rng):
    """The Chebyshev-recurrence XLA bank (the use_pallas='never' path) must
    match the direct-sin oracle in forward AND gradients, and track the f64
    oracle as tightly as direct f32 sin does."""
    import math

    import jax

    from ddsp_pytorch_tpu.ops.oscillator import (
        _harmonic_synth_frames_xla,
        _harmonic_synth_frames_xla_direct,
        phase_accumulate_frames,
    )

    b, f, s, k, sr = 2, 48, 128, 64, 16000.0
    f0 = jnp.asarray(rng.uniform(60, 900, (b, f)).astype(np.float32))
    amp = jnp.asarray((rng.random((b, f, k)) / k).astype(np.float32))
    phi, _ = phase_accumulate_frames(f0, s, sr)

    y_cheb = _harmonic_synth_frames_xla(f0, amp, phi, s, sr)
    y_dir = _harmonic_synth_frames_xla_direct(f0, amp, phi, s, sr)

    # f64 oracle
    f064 = np.asarray(f0, np.float64)
    phi64 = np.asarray(phi, np.float64)
    base = phi64[..., None] + (2 * np.pi / sr) * f064[..., None] * np.arange(
        1, s + 1
    )
    ks = np.arange(1, k + 1)
    y64 = np.einsum(
        "bfsk,bfk->bfs",
        np.sin(base[..., None] * ks),
        np.asarray(amp, np.float64),
    ).reshape(b, -1)
    err_cheb = np.max(np.abs(np.asarray(y_cheb) - y64))
    err_dir = np.max(np.abs(np.asarray(y_dir) - y64))
    assert err_cheb < max(2.0 * err_dir, 5e-5), (err_cheb, err_dir)

    # gradients: custom VJP vs autodiff of the direct path
    def loss(fn):
        return lambda ff, aa, pp: jnp.sum(jnp.sin(fn(ff, aa, pp, s, sr) * 3.0))

    g_cheb = jax.grad(loss(_harmonic_synth_frames_xla), argnums=(0, 1, 2))(
        f0, amp, phi
    )
    g_dir = jax.grad(
        loss(_harmonic_synth_frames_xla_direct), argnums=(0, 1, 2)
    )(f0, amp, phi)
    for gc, gd, name in zip(g_cheb, g_dir, ("df0", "damp", "dphi")):
        scale = max(float(np.max(np.abs(np.asarray(gd)))), 1e-8)
        np.testing.assert_allclose(
            np.asarray(gc), np.asarray(gd), atol=2e-4 * scale, rtol=2e-4,
            err_msg=name,
        )


def test_chebyshev_worst_case_max_production_harmonics(rng):
    """Chebyshev recurrence error grows with harmonic index: cover the
    maximum production K (100, the headline 48 kHz voice) at LOW f0 —
    small per-sample angles, where sin(kθ) is built from ~100 recurrence
    steps on a near-zero seed — against the f64 oracle.  Shipped configs go
    up to n_harmonic=100 (configs/, bench.py); the K=64 test above would
    leave the worst production harmonic untested (ADVICE r3)."""
    from ddsp_pytorch_tpu.ops.oscillator import (
        _harmonic_synth_frames_xla,
        phase_accumulate_frames,
    )

    b, f, s, k, sr = 1, 32, 512, 100, 48000.0
    # low fundamentals: 25–80 Hz → per-sample angle ~3e-3..1e-2 rad
    f0 = jnp.asarray(rng.uniform(25, 80, (b, f)).astype(np.float32))
    # weight energy toward the TOP harmonics so their error dominates
    w = (np.arange(1, k + 1) / k) ** 2
    amp = jnp.asarray(
        (rng.random((b, f, k)) * w / w.sum()).astype(np.float32)
    )
    phi, _ = phase_accumulate_frames(f0, s, sr)
    y = np.asarray(_harmonic_synth_frames_xla(f0, amp, phi, s, sr))

    f064 = np.asarray(f0, np.float64)
    phi64 = np.asarray(phi, np.float64)
    base = phi64[..., None] + (2 * np.pi / sr) * f064[..., None] * np.arange(
        1, s + 1
    )
    ks = np.arange(1, k + 1)
    y64 = np.einsum(
        "bfsk,bfk->bfs",
        np.sin(base[..., None] * ks),
        np.asarray(amp, np.float64),
    ).reshape(b, -1)
    # unit-total-amplitude signal: absolute error budget well below -80 dBFS
    assert np.max(np.abs(y - y64)) < 1e-4, np.max(np.abs(y - y64))
