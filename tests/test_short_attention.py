"""Parity tests for ops/short_attention.py (interpret mode on CPU).

Oracle: ops/attention.dense_attention with the segment-id mask expressed
as an additive bias — the same semantics flash_attention documents
(tokens attend only within equal segment ids; the reference's SDPA path
is an additive key-padding mask, modeling_llada.py:648-684).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lavida_mod_tpu.ops.attention import NEG_INF, dense_attention
from lavida_mod_tpu.ops.short_attention import (
    _short_reference,
    short_attention,
)


def _dense_oracle(q, k, v, q_seg=None, kv_seg=None):
    if q_seg is None:
        return dense_attention(q, k, v)
    ok = q_seg[:, None, :, None] == kv_seg[:, None, None, :]
    bias = jnp.where(ok, 0.0, NEG_INF)
    return dense_attention(q, k, v, bias=bias)


def _rand(rng, shape, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal(shape), dtype)


@pytest.mark.parametrize("B,T,S,Hq,Hkv", [
    (1, 128, 128, 4, 4),
    (2, 256, 384, 4, 2),    # GQA, S != T
    (1, 130, 200, 2, 2),    # ragged -> in-op 128 bucketing
])
def test_short_attention_matches_dense(B, T, S, Hq, Hkv):
    rng = np.random.default_rng(0)
    hd = 64
    q = _rand(rng, (B, T, Hq, hd))
    k = _rand(rng, (B, S, Hkv, hd))
    v = _rand(rng, (B, S, Hkv, hd))
    out = short_attention(q, k, v, interpret=True)
    ref = _dense_oracle(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_short_attention_segment_mask():
    rng = np.random.default_rng(1)
    B, T, S, H, hd = 2, 128, 256, 4, 64
    q = _rand(rng, (B, T, H, hd))
    k = _rand(rng, (B, S, H, hd))
    v = _rand(rng, (B, S, H, hd))
    # binary valid/pad masks like the prefill wrapper builds
    q_seg = jnp.asarray(rng.integers(0, 2, (B, T)), jnp.int32)
    kv_seg = jnp.asarray(rng.integers(0, 2, (B, S)), jnp.int32)
    # keep every q row attendable to something so softmax rows are sane
    kv_seg = kv_seg.at[:, 0].set(1).at[:, 1].set(0)
    out = short_attention(q, k, v, q_seg, kv_seg, interpret=True)
    ref = _dense_oracle(q, k, v, q_seg, kv_seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_short_attention_ragged_masked():
    """Ragged shapes + caller mask: pad rows/cols must stay masked."""
    rng = np.random.default_rng(2)
    B, T, S, H, hd = 1, 100, 150, 2, 64
    q = _rand(rng, (B, T, H, hd))
    k = _rand(rng, (B, S, H, hd))
    v = _rand(rng, (B, S, H, hd))
    q_seg = jnp.ones((B, T), jnp.int32)
    kv_seg = jnp.asarray((np.arange(S) < 120)[None].astype(np.int32))
    out = short_attention(q, k, v, q_seg, kv_seg, interpret=True)
    ref = _dense_oracle(q, k, v, q_seg, kv_seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_short_attention_grad_matches_reference():
    rng = np.random.default_rng(3)
    B, T, S, H, hd = 1, 128, 128, 2, 64
    q = _rand(rng, (B, T, H, hd))
    k = _rand(rng, (B, S, H, hd))
    v = _rand(rng, (B, S, H, hd))

    def f(q, k, v):
        return jnp.sum(short_attention(q, k, v, interpret=True) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_short_reference(
            q, k, v, None, None, 1.0 / hd ** 0.5) ** 2)

    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_flash_wrapper_dispatches_short():
    """flash_attention routes short sequences through the new kernel
    (interpret-safe check: same numbers either way on CPU)."""
    from lavida_mod_tpu.ops.attention import flash_attention

    rng = np.random.default_rng(4)
    B, T, H, hd = 1, 128, 2, 64
    q = _rand(rng, (B, T, H, hd), jnp.float32)
    k, v = q * 0.5, q * 0.25
    out = flash_attention(q, k, v)
    ref = dense_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
