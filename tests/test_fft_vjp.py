"""ops/fft.py custom-VJP real FFTs: forward bit-identical to jnp.fft,
gradients identical to the built-in transpose rules, and differentiable
inside shard_map with the replication check ON (the jnp.fft builtins are
not — their transpose drops the vma annotation on jax 0.9, which is the
reason ops/fft.py exists)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_pytorch_tpu.ops.fft import irfft, rfft


@pytest.mark.parametrize("n,x_len", [(16, 16), (15, 15), (32, 20), (8, 12)])
def test_rfft_forward_and_grad_match_builtin(rng, n, x_len):
    x = jnp.asarray(rng.standard_normal((3, x_len)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(rfft(x, n)), np.asarray(jnp.fft.rfft(x, n))
    )

    def loss_mine(x):
        return jnp.sum(jnp.abs(rfft(x, n)) ** 1.3)

    def loss_builtin(x):
        return jnp.sum(jnp.abs(jnp.fft.rfft(x, n)) ** 1.3)

    g_mine = jax.grad(loss_mine)(x)
    g_ref = jax.grad(loss_builtin)(x)
    np.testing.assert_allclose(g_mine, g_ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("n", [16, 15, 64])
def test_irfft_forward_and_grad_match_builtin(rng, n):
    m = n // 2 + 1
    z = jnp.asarray(
        (rng.standard_normal((3, m)) + 1j * rng.standard_normal((3, m))).astype(
            np.complex64
        )
    )
    np.testing.assert_array_equal(
        np.asarray(irfft(z, n)), np.asarray(jnp.fft.irfft(z, n))
    )

    def loss_mine(z):
        return jnp.sum(jnp.abs(irfft(z, n)) ** 1.3)

    def loss_builtin(z):
        return jnp.sum(jnp.abs(jnp.fft.irfft(z, n)) ** 1.3)

    g_mine = jax.grad(loss_mine)(z)
    g_ref = jax.grad(loss_builtin)(z)
    np.testing.assert_allclose(g_mine, g_ref, atol=2e-5, rtol=1e-5)


def test_irfft_rejects_bin_mismatch(rng):
    z = jnp.zeros((4,), jnp.complex64)
    with pytest.raises(ValueError, match="bins"):
        irfft(z, 16)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_grad_through_fft_in_shard_map_with_check_on(rng):
    from jax.sharding import PartitionSpec as P

    from ddsp_pytorch_tpu.parallel import make_mesh
    from ddsp_pytorch_tpu.parallel.ops import checked_shard_map

    mesh = make_mesh(data=2, time=4)

    def body(x):
        spec = rfft(x, 64)
        y = irfft(spec * jnp.conj(spec), 64)
        return jax.lax.psum(jnp.sum(y**2), ("data", "time"))

    f = checked_shard_map(
        body, mesh=mesh, in_specs=(P("data", "time"),), out_specs=P(),
        check=True,
    )
    x = jnp.asarray(rng.standard_normal((2, 256)).astype(np.float32))
    g = jax.jit(jax.grad(lambda x: f(x)))(x)
    assert np.all(np.isfinite(np.asarray(g)))
