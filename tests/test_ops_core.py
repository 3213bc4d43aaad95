"""Golden tests for ops/core.py against torch-CPU oracles and closed forms.

The oracles re-state the reference's equations (ddsp/core.py) inline using
torch — they are independent checks, not imports of the reference.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from ddsp_pytorch_tpu.ops import (
    remove_above_nyquist,
    resample,
    safe_log,
    scale_function,
    upsample,
)


def test_safe_log():
    x = jnp.array([0.0, 1e-7, 1.0, 100.0])
    np.testing.assert_allclose(
        safe_log(x), np.log(np.asarray(x) + 1e-7), rtol=1e-5, atol=1e-6
    )


def test_scale_function_matches_formula_and_range(rng):
    x = jnp.asarray(rng.normal(size=(1000,)).astype(np.float32) * 5)
    got = scale_function(x)
    want = 2.0 * torch.sigmoid(torch.tensor(np.asarray(x))) ** math.log(10.0) + 1e-7
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-7)
    assert float(got.min()) >= 1e-7
    assert float(got.max()) <= 2.0 + 1e-6


def test_scale_function_extreme_inputs_finite():
    x = jnp.array([-1e4, -100.0, 0.0, 100.0, 1e4])
    y = scale_function(x)
    assert np.all(np.isfinite(y))
    np.testing.assert_allclose(y[-1], 2.0, rtol=1e-6)
    np.testing.assert_allclose(y[0], 1e-7, rtol=1e-3)


def test_remove_above_nyquist(rng):
    sr = 16000
    amps = jnp.asarray(rng.random((2, 5, 8)).astype(np.float32))
    f0 = jnp.full((2, 5, 1), 1500.0, jnp.float32)
    out = remove_above_nyquist(amps, f0, sr)
    # harmonics 1..5 are below 8000 Hz; 6..8 (9000+) masked to 1e-4
    np.testing.assert_allclose(out[..., :5], np.asarray(amps[..., :5]) * (1 + 1e-4),
                               rtol=1e-6)
    np.testing.assert_allclose(out[..., 5:], np.asarray(amps[..., 5:]) * 1e-4,
                               rtol=1e-5)


def test_remove_above_nyquist_boundary():
    # harmonic exactly at Nyquist must be masked (strict <)
    sr = 16000
    amps = jnp.ones((1, 1, 2))
    f0 = jnp.full((1, 1, 1), 4000.0)
    out = remove_above_nyquist(amps, f0, sr)  # k=1: 4000 < 8000 ok; k=2: = → mask
    assert out[0, 0, 0] > 0.5
    assert out[0, 0, 1] < 1e-3


def test_upsample_matches_torch_nearest(rng):
    x = rng.standard_normal((3, 7, 5)).astype(np.float32)
    factor = 4
    got = upsample(jnp.asarray(x), factor)
    xt = torch.tensor(x).permute(0, 2, 1)
    want = F.interpolate(xt, size=xt.shape[-1] * factor).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_resample_matches_torch_reference_semantics(rng):
    x = rng.standard_normal((2, 9, 3)).astype(np.float32)
    factor = 8
    got = resample(jnp.asarray(x), factor)
    assert got.shape == (2, 9 * factor, 3)

    # torch oracle: zero-stuff + hann conv (reference core.py:44-61 semantics)
    xt = torch.tensor(x)
    batch, frame, channel = xt.shape
    xt2 = xt.permute(0, 2, 1).reshape(batch * channel, 1, frame)
    window = torch.hann_window(factor * 2).reshape(1, 1, -1)
    y = torch.zeros(xt2.shape[0], 1, factor * frame)
    y[..., ::factor] = xt2
    y[..., -1:] = xt2[..., -1:]
    y = F.pad(y, [factor, factor])
    y = F.conv1d(y, window)[..., :-1]
    want = y.reshape(batch, channel, factor * frame).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upsample_is_jittable():
    f = jax.jit(lambda x: upsample(x, 4))
    out = f(jnp.ones((1, 3, 2)))
    assert out.shape == (1, 12, 2)
