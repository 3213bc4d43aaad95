"""Model-layer tests: GRU parity vs torch, model shapes, control properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ddsp_pytorch_tpu.config import Config
from ddsp_pytorch_tpu.models import DDSPAutoencoder, DDSPDecoder, load_model
from ddsp_pytorch_tpu.models.decoder import GRU, GRUDecoder


def _tiny_cfg(name="single-inst-decoder"):
    return Config.from_dict(
        {
            "preprocess": {
                "sample_rate": 16000,
                "signal_length": 4096,
                "block_size": 64,
            },
            "model": {
                "name": name,
                "kwargs": {
                    "hidden_size": 32,
                    "n_harmonic": 8,
                    "n_bands": 9,
                    "sample_rate": 16000,
                    "block_size": 64,
                    "has_reverb": True,
                    "use_pallas": "never",
                },
            },
        }
    )


def _batch(cfg, rng, with_mfcc=False):
    f = cfg.n_frames
    b = 2
    batch = {
        "sig": jnp.asarray(rng.standard_normal((b, cfg.preprocess.signal_length)),
                           jnp.float32),
        "pitch": jnp.asarray(
            rng.uniform(100, 400, (b, f, 1)).astype(np.float32)
        ),
        "loudness": jnp.asarray(
            rng.standard_normal((b, f, 1)).astype(np.float32)
        ),
    }
    if with_mfcc:
        batch["mfcc"] = jnp.asarray(
            rng.standard_normal((b, f, 30)).astype(np.float32)
        )
    return batch


def test_gru_matches_torch_gru(rng):
    """Our scan GRU must equal torch.nn.GRU given identical weights
    (the reference's recurrent core, core.py:132-133)."""
    in_dim, hidden, b, f = 12, 16, 3, 20
    x = rng.standard_normal((b, f, in_dim)).astype(np.float32)

    gru = GRU(hidden_size=hidden)
    params = gru.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    tg = torch.nn.GRU(in_dim, hidden, batch_first=True)
    with torch.no_grad():
        # torch weight_ih_l0: (3H, in) gate order [r, z, n]; ours: (in, 3H)
        tg.weight_ih_l0.copy_(torch.tensor(np.asarray(params["w_ih"]).T))
        tg.weight_hh_l0.copy_(torch.tensor(np.asarray(params["w_hh"]).T))
        tg.bias_ih_l0.copy_(torch.tensor(np.asarray(params["b_ih"])))
        tg.bias_hh_l0.copy_(torch.tensor(np.asarray(params["b_hh"])))
        want, want_h = tg(torch.tensor(x))

    got, got_h = gru.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_h, want_h[0].numpy(), rtol=1e-4, atol=1e-5)


def test_mlp_matches_torch_stack(rng):
    """MLP block == torch Linear→LayerNorm→LeakyReLU stack with identical
    weights (reference core.py:122-129)."""
    from ddsp_pytorch_tpu.models.decoder import MLP

    in_dim, hidden, n_layers = 7, 12, 3
    x = rng.standard_normal((4, 9, in_dim)).astype(np.float32)
    mlp = MLP(hidden_size=hidden, n_layers=n_layers)
    params = mlp.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    layers = []
    dims = [in_dim] + n_layers * [hidden]
    with torch.no_grad():
        for i in range(n_layers):
            lin = torch.nn.Linear(dims[i], dims[i + 1])
            lin.weight.copy_(
                torch.tensor(np.asarray(params[f"Dense_{i}"]["kernel"]).T)
            )
            lin.bias.copy_(torch.tensor(np.asarray(params[f"Dense_{i}"]["bias"])))
            norm = torch.nn.LayerNorm(dims[i + 1])
            norm.weight.copy_(
                torch.tensor(np.asarray(params[f"LayerNorm_{i}"]["scale"]))
            )
            norm.bias.copy_(
                torch.tensor(np.asarray(params[f"LayerNorm_{i}"]["bias"]))
            )
            layers += [lin, norm, torch.nn.LeakyReLU()]
        want = torch.nn.Sequential(*layers)(torch.tensor(x)).numpy()

    got = mlp.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_gru_initial_state_continuation(rng):
    """Splitting a sequence and carrying the state equals one pass."""
    gru = GRU(hidden_size=8)
    x = jnp.asarray(rng.standard_normal((2, 10, 4)).astype(np.float32))
    params = gru.init(jax.random.PRNGKey(0), x)["params"]
    full, _ = gru.apply({"params": params}, x)
    o1, h1 = gru.apply({"params": params}, x[:, :6])
    o2, _ = gru.apply({"params": params}, x[:, 6:], h1)
    np.testing.assert_allclose(
        jnp.concatenate([o1, o2], 1), full, rtol=1e-5, atol=1e-6
    )


def test_decoder_forward_shapes_and_keys(rng):
    cfg = _tiny_cfg()
    model = load_model(cfg)
    assert isinstance(model, DDSPDecoder)
    batch = _batch(cfg, rng)
    out, _ = _apply(model, batch)
    t = cfg.preprocess.signal_length
    assert out["signal"].shape == (2, t)
    assert out["noise"].shape == (2, t)
    assert out["harmonic_audio"].shape == (2, t)
    for key in ("f0", "loudness", "noise_ctrls", "harmonic_ctrls"):
        assert key in out
    assert np.all(np.isfinite(np.asarray(out["signal"])))


def _apply(model, batch, seed=0):
    rngs = {"params": jax.random.PRNGKey(seed), "noise": jax.random.PRNGKey(seed + 1)}
    variables = model.init(rngs, batch)
    out = model.apply(
        variables, batch, rngs={"noise": jax.random.PRNGKey(seed + 2)}
    )
    return out, variables["params"]


def test_harmonic_distribution_sums_to_one(rng):
    """Property (SURVEY.md §4 #2): post-get_controls distribution is a
    simplex over harmonics."""
    cfg = _tiny_cfg()
    model = load_model(cfg)
    out, _ = _apply(model, _batch(cfg, rng))
    dist = np.asarray(out["harmonic_ctrls"]["harmonic_distribution"])
    np.testing.assert_allclose(dist.sum(-1), 1.0, atol=1e-5)
    assert dist.min() >= 0


def test_autoencoder_forward(rng):
    cfg = _tiny_cfg("mfcc-autoencoder")
    model = load_model(cfg)
    assert isinstance(model, DDSPAutoencoder)
    batch = _batch(cfg, rng, with_mfcc=True)
    out, _ = _apply(model, batch)
    assert out["signal"].shape == (2, cfg.preprocess.signal_length)
    assert out["z"].shape == (2, cfg.n_frames, 16)


def test_registry_rejects_unknown():
    cfg = _tiny_cfg()
    cfg.model.name = "nope"
    with pytest.raises(ValueError, match="invalid model name"):
        load_model(cfg)


def test_reverb_dry_tap(rng):
    """Reverb impulse[0] == 1: the dry path is hard-wired
    (reference modules.py:26)."""
    from ddsp_pytorch_tpu.models.modules import Reverb

    reverb = Reverb(length=100, sample_rate=100)
    params = reverb.init(jax.random.PRNGKey(0), jnp.zeros((1, 200)))["params"]
    impulse = np.asarray(
        reverb.apply({"params": params}, method=reverb.build_impulse)
    )
    assert impulse[0] == pytest.approx(1.0)
    # wet path starts tiny: sigmoid(0)=0.5 scale on uniform noise * decay
    assert np.abs(impulse[1:]).max() <= 1.0


def test_reverb_changes_signal_and_is_differentiable(rng):
    from ddsp_pytorch_tpu.models.modules import Reverb

    reverb = Reverb(length=64, sample_rate=64)
    x = jnp.asarray(rng.standard_normal((2, 128)).astype(np.float32))
    params = reverb.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p):
        return jnp.sum(jnp.square(reverb.apply({"params": p}, x)))

    g = jax.grad(loss)(params)
    assert np.all(np.isfinite(np.asarray(g["decay"])))
    assert np.abs(np.asarray(g["noise"])).max() > 0


def test_bf16_compute_dtype_runs(rng):
    """NN in bf16, DSP in f32: output stays f32 and finite."""
    cfg = _tiny_cfg()
    cfg.model.kwargs["dtype"] = jnp.bfloat16
    model = load_model(cfg)
    out, _ = _apply(model, _batch(cfg, rng))
    assert out["signal"].dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out["signal"])))
