"""Torch re-statement of the reference DDSP forward.

A from-the-equations torch implementation of the reference's decoder
forward (reference ddsp/models/decoder.py:101-136, modules.py, core.py —
literal upsample-nearest + O(T) phase cumsum + materialized (B, T, K) sine
bank), parameterized over the model shape and driven by THIS framework's
flax parameters (weight transplant).

Two consumers:
  * tests/test_full_model_parity.py — the whole-model parity oracle: the
    framework's forward must match this re-statement on the same inputs
    and noise draw;
  * scripts/bench_reference_cpu.py — the measured baseline: the
    reference's computation timed with the reference's own protocol
    (reference performance.py:21-41) on the same host CPU as ours.

This is our own code restating published equations, not a copy of the
reference implementation.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F
import torch.fft as tfft


def _to_torch_tree(params):
    """Recursively convert a (possibly flax/numpy) param subtree to torch
    tensors — done ONCE at construction so no conversion cost lands inside
    the timed benchmark region (scripts/bench_reference_cpu.py)."""
    if isinstance(params, dict):
        return {k: _to_torch_tree(v) for k, v in params.items()}
    return torch.tensor(np.asarray(params))


def torch_mlp(params, x):
    """3×[Linear → LayerNorm → LeakyReLU] (reference core.py:122-129).
    `params` must already be torch tensors (see _to_torch_tree)."""
    for i in range(3):
        x = x @ params[f"Dense_{i}"]["kernel"] + params[f"Dense_{i}"]["bias"]
        x = F.layer_norm(
            x,
            (x.shape[-1],),
            params[f"LayerNorm_{i}"]["scale"],
            params[f"LayerNorm_{i}"]["bias"],
        )
        x = F.leaky_relu(x)
    return x


def make_torch_gru(params, input_size: int, hidden_size: int) -> torch.nn.GRU:
    """torch.nn.GRU with this framework's GRU weights transplanted
    (models/decoder.py GRU — torch gate semantics by construction)."""
    gru = torch.nn.GRU(input_size, hidden_size, batch_first=True)
    with torch.no_grad():
        gru.weight_ih_l0.copy_(torch.tensor(np.asarray(params["w_ih"]).T))
        gru.weight_hh_l0.copy_(torch.tensor(np.asarray(params["w_hh"]).T))
        gru.bias_ih_l0.copy_(torch.tensor(np.asarray(params["b_ih"])))
        gru.bias_hh_l0.copy_(torch.tensor(np.asarray(params["b_hh"])))
    return gru


def torch_scale(x):
    """Exponentiated sigmoid (reference core.py:77-78)."""
    return 2.0 * torch.sigmoid(x) ** math.log(10.0) + 1e-7


def torch_amp_to_ir(amp, target):
    """Zero-phase magnitudes → windowed linear-phase FIR
    (reference core.py:144-166)."""
    amp = torch.view_as_complex(torch.stack([amp, torch.zeros_like(amp)], -1))
    impulse = tfft.irfft(amp)
    fs = impulse.shape[-1]
    impulse = torch.roll(impulse, fs // 2, -1) * torch.hann_window(fs)
    impulse = F.pad(impulse, (0, target - fs))
    return torch.roll(impulse, -fs // 2, -1)


def torch_fft_convolve(signal, kernel):
    """Centered fast convolution (reference core.py:169-175)."""
    signal = F.pad(signal, (0, signal.shape[-1]))
    kernel = F.pad(kernel, (kernel.shape[-1], 0))
    out = tfft.irfft(tfft.rfft(signal) * tfft.rfft(kernel))
    return out[..., out.shape[-1] // 2 :]


class TorchReferenceDecoder:
    """The reference's single-inst decoder forward, weights transplanted
    once at construction (tensor conversion outside any timed region).

    __call__(f0, loudness, noise=None) -> dry audio (B, T); `noise` is the
    uniform [-1, 1) frame noise (B, F, block) — drawn fresh per call when
    omitted, exactly like the reference forward (modules.py:119-123).
    Reverb (when enabled) matches modules.py:7-35 with the dry tap.
    """

    def __init__(self, params, *, sample_rate: int, block_size: int,
                 n_harmonic: int, hidden_size: int, has_reverb: bool = False,
                 has_z: bool = False):
        self.sample_rate = sample_rate
        self.block_size = block_size
        self.n_harmonic = n_harmonic
        self.has_reverb = has_reverb

        dp = params["decoder"]
        self._f0_mlp = _to_torch_tree(dp["f0_mlp"])
        self._loud_mlp = _to_torch_tree(dp["loudness_mlp"])
        self._z_mlp = _to_torch_tree(dp["z_mlp"]) if has_z else None
        self._out_mlp = _to_torch_tree(dp["out_mlp"])
        n_inputs = 3 if has_z else 2
        self.gru = make_torch_gru(dp["gru"], n_inputs * hidden_size,
                                  hidden_size)
        self.hw = torch.tensor(np.asarray(params["harmonic_proj"]["kernel"]))
        self.hb = torch.tensor(np.asarray(params["harmonic_proj"]["bias"]))
        self.nw = torch.tensor(np.asarray(params["noise_proj"]["kernel"]))
        self.nb = torch.tensor(np.asarray(params["noise_proj"]["bias"]))
        self.harmonics = torch.arange(1, n_harmonic + 1)
        if has_reverb:
            rp = params["reverb"]
            tt = torch.arange(sample_rate) / sample_rate
            decay = torch.tensor(float(np.asarray(rp["decay"])))
            wet = torch.tensor(float(np.asarray(rp["wet"])))
            rnoise = torch.tensor(np.asarray(rp["noise"]))
            impulse = rnoise * torch.exp(-F.softplus(-decay) * tt * 500.0)
            impulse = impulse * torch.sigmoid(wet)
            impulse[0] = 1.0
            self.reverb_ir = impulse

    @torch.no_grad()
    def __call__(self, f0, loudness, z=None, noise=None):
        b, frames, _ = f0.shape
        t = frames * self.block_size
        sr = self.sample_rate

        # control network (reference decoder.py:43-68, 101-117; z branch
        # reference encoder.py:33-35)
        parts = [torch_mlp(self._f0_mlp, f0),
                 torch_mlp(self._loud_mlp, loudness)]
        if self._z_mlp is not None:
            parts.append(torch_mlp(self._z_mlp, z))
        hidden = torch.cat(parts, -1)
        gru_out, _ = self.gru(hidden)
        hidden = torch_mlp(self._out_mlp,
                           torch.cat([gru_out, f0, loudness], -1))

        param_h = hidden @ self.hw + self.hb
        amplitudes = torch_scale(param_h[..., :1])
        dist = torch_scale(param_h[..., 1:])
        pitches = f0 * self.harmonics
        dist = dist * ((pitches < sr / 2).float() + 1e-4)
        dist = dist / dist.sum(-1, keepdim=True)
        harm_amps = dist * amplitudes  # (B, F, K)

        # oscillator: literal reference math (core.py:64-67, 136-141 —
        # nearest upsample, full-length phase cumsum, (B, T, K) sine bank)
        f0_up = F.interpolate(f0.permute(0, 2, 1), size=t).permute(0, 2, 1)
        amp_up = F.interpolate(harm_amps.permute(0, 2, 1), size=t)
        amp_up = amp_up.permute(0, 2, 1)
        omega = torch.cumsum(2 * math.pi * f0_up / sr, 1)
        harmonic = (torch.sin(omega * self.harmonics) * amp_up).sum(-1)

        # filtered noise (modules.py:101-146, initial_bias=-5)
        mags = torch_scale(hidden @ self.nw + self.nb - 5.0)
        impulse = torch_amp_to_ir(mags, self.block_size)
        if noise is None:
            noise = (
                torch.rand(b, frames, self.block_size) * 2.0 - 1.0
            )
        noise_audio = torch_fft_convolve(noise, impulse).reshape(b, -1)

        dry = harmonic + noise_audio
        if self.has_reverb:
            # Match reference modules.py:28-35: the 1 s IR is zero-padded to
            # the signal length when the signal is longer, truncated when it
            # is shorter.
            ir = self.reverb_ir
            if t > ir.shape[-1]:
                ir = F.pad(ir, (0, t - ir.shape[-1]))
            return torch_fft_convolve(dry, ir[None, :t])
        return dry


class TorchReferenceAutoencoder:
    """The reference's mfcc-autoencoder forward (reference encoder.py:29-141):
    MFCCEncoder (LayerNorm → GRU → Linear z, encoder.py:10-27) feeding the
    z-conditioned decoder.  Weights transplanted from this framework's
    DDSPAutoencoder params."""

    def __init__(self, params, *, sample_rate: int, block_size: int,
                 n_harmonic: int, hidden_size: int, has_reverb: bool = False):
        ep = params["encoder"]
        self._ln_scale = torch.tensor(np.asarray(ep["LayerNorm_0"]["scale"]))
        self._ln_bias = torch.tensor(np.asarray(ep["LayerNorm_0"]["bias"]))
        n_mfccs = self._ln_scale.shape[-1]
        self.enc_gru = make_torch_gru(ep["GRU_0"], n_mfccs, hidden_size)
        self._zw = torch.tensor(np.asarray(ep["Dense_0"]["kernel"]))
        self._zb = torch.tensor(np.asarray(ep["Dense_0"]["bias"]))
        self.decoder = TorchReferenceDecoder(
            params, sample_rate=sample_rate, block_size=block_size,
            n_harmonic=n_harmonic, hidden_size=hidden_size,
            has_reverb=has_reverb, has_z=True,
        )

    @torch.no_grad()
    def __call__(self, f0, loudness, mfcc, noise=None):
        x = F.layer_norm(mfcc, (mfcc.shape[-1],), self._ln_scale,
                         self._ln_bias)
        x, _ = self.enc_gru(x)
        z = x @ self._zw + self._zb
        return self.decoder(f0, loudness, z=z, noise=noise)
