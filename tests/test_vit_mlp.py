"""Fused ViT MLP kernel (ops/vit_mlp.py) vs the XLA op chain it replaces
(siglip.forward's LN2 -> fc1 -> gelu(tanh) -> fc2 -> +res,
siglip.py:156-159)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lavida_mod_tpu.ops.norms import layer_norm
from lavida_mod_tpu.ops.vit_mlp import fused_vit_mlp


def _ref(x, g, b, w1, b1, w2, b2, eps=1e-6):
    z = layer_norm(x, g, b, eps)
    z = jax.nn.gelu(z @ w1 + b1, approximate=True)
    return x + z @ w2 + b2


@pytest.mark.parametrize("N,T,D,F", [
    (2, 64, 256, 640),      # small
    (1, 729, 256, 520),     # so400m token count, non-tile-aligned F
    (3, 100, 128, 512),     # M not tile-aligned
])
def test_fused_vit_mlp_matches_xla(N, T, D, F):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    g = jnp.asarray(rng.standard_normal(D), jnp.float32)
    b = jnp.asarray(rng.standard_normal(D), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((D, F)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(F) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((F, D)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)

    ref = _ref(x, g, b, w1, b1, w2, b2)
    out = fused_vit_mlp(x, g, b, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_vit_mlp_bf16():
    """Serving dtype: bf16 activations/weights, f32 LN + accumulation
    inside the kernel — at least as precise as the XLA chain."""
    rng = np.random.default_rng(1)
    N, T, D, F = 2, 729, 256, 1024
    x = jnp.asarray(rng.standard_normal((N, T, D)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal(D), jnp.float32)
    b = jnp.asarray(rng.standard_normal(D), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((D, F)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal(F) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((F, D)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)

    ref = _ref(x.astype(jnp.float32), g, b, w1.astype(jnp.float32), b1,
               w2.astype(jnp.float32), b2)
    out = fused_vit_mlp(x, g, b, w1, b1, w2, b2)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), rtol=0.05, atol=0.05)
