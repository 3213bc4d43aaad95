"""Full-model weight-transplant parity.

The strongest same-model-family proof: build the reference architecture in
torch (decoder MLPs + GRU + projections + reference-math synths + reverb,
all stated inline from the reference's equations), transplant this
framework's weights into it, and compare complete forward passes on the
same inputs and the same noise draw.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
import torch.fft as tfft

from ddsp_pytorch_tpu.config import Config
from ddsp_pytorch_tpu.models import load_model
from ddsp_pytorch_tpu.streaming import init_stream_state

SR, BLOCK, HIDDEN, K, BANDS = 16000, 64, 32, 8, 9
FRAMES = 48


def _torch_mlp(params, x):
    for i in range(3):
        w = torch.tensor(np.asarray(params[f"Dense_{i}"]["kernel"]))
        b = torch.tensor(np.asarray(params[f"Dense_{i}"]["bias"]))
        x = x @ w + b
        scale = torch.tensor(np.asarray(params[f"LayerNorm_{i}"]["scale"]))
        bias = torch.tensor(np.asarray(params[f"LayerNorm_{i}"]["bias"]))
        x = F.layer_norm(x, (x.shape[-1],), scale, bias)
        x = F.leaky_relu(x)
    return x


def _torch_gru(params, x):
    gru = torch.nn.GRU(x.shape[-1], HIDDEN, batch_first=True)
    with torch.no_grad():
        gru.weight_ih_l0.copy_(torch.tensor(np.asarray(params["w_ih"]).T))
        gru.weight_hh_l0.copy_(torch.tensor(np.asarray(params["w_hh"]).T))
        gru.bias_ih_l0.copy_(torch.tensor(np.asarray(params["b_ih"])))
        gru.bias_hh_l0.copy_(torch.tensor(np.asarray(params["b_hh"])))
        out, _ = gru(x)
    return out


def _torch_scale(x):
    return 2.0 * torch.sigmoid(x) ** math.log(10.0) + 1e-7


def _torch_amp_to_ir(amp, target):
    amp = torch.view_as_complex(torch.stack([amp, torch.zeros_like(amp)], -1))
    impulse = tfft.irfft(amp)
    fs = impulse.shape[-1]
    impulse = torch.roll(impulse, fs // 2, -1) * torch.hann_window(fs)
    impulse = F.pad(impulse, (0, target - fs))
    return torch.roll(impulse, -fs // 2, -1)


def _torch_fft_convolve(signal, kernel):
    signal = F.pad(signal, (0, signal.shape[-1]))
    kernel = F.pad(kernel, (kernel.shape[-1], 0))
    out = tfft.irfft(tfft.rfft(signal) * tfft.rfft(kernel))
    return out[..., out.shape[-1] // 2 :]


def test_full_decoder_forward_matches_torch_restatement(rng):
    cfg = Config.from_dict(
        {
            "preprocess": {"sample_rate": SR, "signal_length": FRAMES * BLOCK,
                           "block_size": BLOCK},
            "model": {
                "name": "single-inst-decoder",
                "kwargs": {
                    "hidden_size": HIDDEN,
                    "n_harmonic": K,
                    "n_bands": BANDS,
                    "sample_rate": SR,
                    "block_size": BLOCK,
                    "has_reverb": True,
                    "use_pallas": "never",
                },
            },
        }
    )
    model = load_model(cfg)
    t = FRAMES * BLOCK
    batch = {
        "sig": jnp.zeros((1, t), jnp.float32),
        "pitch": jnp.asarray(rng.uniform(150, 350, (1, FRAMES, 1)).astype(np.float32)),
        "loudness": jnp.asarray(
            rng.standard_normal((1, FRAMES, 1)).astype(np.float32)
        ),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, batch
    )["params"]
    noise = jnp.asarray(
        rng.uniform(-1, 1, (1, FRAMES, BLOCK)).astype(np.float32)
    )

    # ---- ours: streaming_step renders harmonic+noise with injected noise;
    # reverb applied like the offline forward
    st = init_stream_state(HIDDEN, 1)
    dry, _, _ = model.apply(
        {"params": params},
        batch["pitch"],
        batch["loudness"],
        st.gru,
        st.phase,
        noise,
        method=model.streaming_step,
    )
    from ddsp_pytorch_tpu.models.modules import Reverb

    reverb_mod = Reverb(SR, SR)
    ir = reverb_mod.apply(
        {"params": params["reverb"]}, method=reverb_mod.build_impulse
    )
    from ddsp_pytorch_tpu.ops import fft_convolve

    ours = np.asarray(fft_convolve(dry, ir[None, :t]))[0]

    # ---- torch re-statement of the reference forward (decoder.py:101-136)
    f0 = torch.tensor(np.asarray(batch["pitch"]))
    loud = torch.tensor(np.asarray(batch["loudness"]))
    dp = params["decoder"]
    hidden = torch.cat(
        [_torch_mlp(dp["f0_mlp"], f0), _torch_mlp(dp["loudness_mlp"], loud)], -1
    )
    gru_out = _torch_gru(dp["gru"], hidden)
    hidden = _torch_mlp(dp["out_mlp"], torch.cat([gru_out, f0, loud], -1))

    hw = torch.tensor(np.asarray(params["harmonic_proj"]["kernel"]))
    hb = torch.tensor(np.asarray(params["harmonic_proj"]["bias"]))
    param_h = hidden @ hw + hb
    amplitudes = _torch_scale(param_h[..., :1])
    dist = _torch_scale(param_h[..., 1:])
    pitches = f0 * torch.arange(1, K + 1)
    aa = (pitches < SR / 2).float() + 1e-4
    dist = dist * aa
    dist = dist / dist.sum(-1, keepdim=True)
    harm_amps = dist * amplitudes  # (1, F, K)

    # oscillator: literal reference math (upsample nearest + cumsum + sin)
    f0_up = f0.permute(0, 2, 1)
    f0_up = F.interpolate(f0_up, size=FRAMES * BLOCK).permute(0, 2, 1)
    amp_up = F.interpolate(harm_amps.permute(0, 2, 1), size=FRAMES * BLOCK)
    amp_up = amp_up.permute(0, 2, 1)
    omega = torch.cumsum(2 * math.pi * f0_up / SR, 1)
    harmonic = (torch.sin(omega * torch.arange(1, K + 1)) * amp_up).sum(-1)

    nw = torch.tensor(np.asarray(params["noise_proj"]["kernel"]))
    nb = torch.tensor(np.asarray(params["noise_proj"]["bias"]))
    mags = _torch_scale(hidden @ nw + nb - 5.0)
    impulse = _torch_amp_to_ir(mags, BLOCK)
    tnoise = torch.tensor(np.asarray(noise))
    noise_audio = _torch_fft_convolve(tnoise, impulse).reshape(1, -1)

    dry_t = harmonic + noise_audio

    rp = params["reverb"]
    tt = torch.arange(SR) / SR
    decay = torch.tensor(float(np.asarray(rp["decay"])))
    wet = torch.tensor(float(np.asarray(rp["wet"])))
    rnoise = torch.tensor(np.asarray(rp["noise"]))
    impulse_r = rnoise * torch.exp(-F.softplus(-decay) * tt * 500.0)
    impulse_r = impulse_r * torch.sigmoid(wet)
    impulse_r[0] = 1.0
    want = _torch_fft_convolve(dry_t, impulse_r[None, :t]).numpy()[0]

    np.testing.assert_allclose(ours, want, atol=2e-3)
    # sanity: the signal is non-trivial
    assert np.abs(ours).max() > 1e-3
