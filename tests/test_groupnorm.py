import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from oneshotdet_tpu.ops.pallas_groupnorm import group_norm_act


@pytest.fixture
def data():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32))
    gamma = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    beta = jnp.asarray(rng.randn(64).astype(np.float32))
    return x, gamma, beta


def test_matches_flax_groupnorm(data):
    x, gamma, beta = data
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5)
    ref = gn.apply({"params": {"scale": gamma, "bias": beta}}, x)
    out = group_norm_act(x, gamma, beta, 32, 1e-5, None, 0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_activations(data):
    x, gamma, beta = data
    base = np.asarray(group_norm_act(x, gamma, beta, 32, 1e-5, None, 0.2))
    relu = np.asarray(group_norm_act(x, gamma, beta, 32, 1e-5, "relu", 0.2))
    np.testing.assert_allclose(relu, np.maximum(base, 0), atol=1e-6)
    leaky = np.asarray(group_norm_act(x, gamma, beta, 32, 1e-5, "leaky", 0.2))
    np.testing.assert_allclose(leaky, np.where(base >= 0, base, base * 0.2), atol=1e-6)


def test_custom_vjp_matches_autodiff(data):
    """The hand-written backward must match autodiff of the plain formula."""
    x, gamma, beta = data

    def plain(x, gamma, beta):
        g, cpg = 32, x.shape[-1] // 32
        b = x.shape[0]
        xg = x.reshape(b, -1, g, cpg)
        m = xg.mean(axis=(1, 3), keepdims=True)
        v = ((xg - m) ** 2).mean(axis=(1, 3), keepdims=True)
        xhat = ((xg - m) * jax.lax.rsqrt(v + 1e-5)).reshape(x.shape)
        y = xhat * gamma + beta
        return jnp.where(y >= 0, y, y * 0.2)

    def fused(x, gamma, beta):
        return group_norm_act(x, gamma, beta, 32, 1e-5, "leaky", 0.2)

    for f_ref, f_test in [(plain, fused)]:
        g_ref = jax.grad(lambda *a: (f_ref(*a) ** 2).sum(), argnums=(0, 1, 2))(x, gamma, beta)
        g_test = jax.grad(lambda *a: (f_test(*a) ** 2).sum(), argnums=(0, 1, 2))(x, gamma, beta)
        for a, bb in zip(g_ref, g_test):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=2e-3, atol=2e-4)
