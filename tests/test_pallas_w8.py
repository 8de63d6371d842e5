"""Fused W8A8 matmul kernel tests (interpret mode; chip validation in
scripts/probes/_w8a8_fused_chip.py — see ops/pallas_w8.py)."""

import numpy as np

import jax.numpy as jnp

from lavida_mod_tpu.ops.pallas_w8 import (
    linear_w8a8, quantize_act_int8, w8a8_matmul,
)
from lavida_mod_tpu.ops.quant import linear_act_int8, quantize_linear


def _mk(rng, T, K, N):
    x = rng.standard_normal((T, K)).astype(np.float32)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    p = quantize_linear({"kernel": jnp.asarray(w)})
    return jnp.asarray(x, jnp.bfloat16), p


def test_w8a8_matches_xla_act_int8():
    """Kernel output == linear_act_int8 (same quant math, fused)."""
    rng = np.random.default_rng(0)
    x, p = _mk(rng, T=8, K=256, N=256)
    ref = linear_act_int8(x, p)
    x8, sx = quantize_act_int8(x)
    out = w8a8_matmul(x8, sx, p["kernel_q"], p["scale"],
                      block_t=8, block_n=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=1e-3,
    )


def test_w8a8_pads_ragged_t():
    """T not divisible by block_t pads and trims exactly."""
    rng = np.random.default_rng(1)
    x, p = _mk(rng, T=300, K=128, N=128)
    x8, sx = quantize_act_int8(x)
    out = w8a8_matmul(x8, sx, p["kernel_q"], p["scale"],
                      block_t=256, block_n=128, interpret=True)
    assert out.shape == (300, 128)
    ref = linear_act_int8(x, p)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=1e-3,
    )


def test_linear_w8a8_wrapper_bias_and_batch_dims():
    rng = np.random.default_rng(2)
    x, p = _mk(rng, T=16, K=128, N=256)
    p = dict(p, bias=jnp.asarray(rng.standard_normal(256), jnp.float32))
    xb = x.reshape(2, 8, 128)
    out = linear_w8a8(xb, p, interpret=True)
    ref = linear_act_int8(xb, p)
    assert out.shape == (2, 8, 256) and out.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_w8a8_multi_k_and_t_blocks():
    """K=8192 -> nk=2 k-steps; T=300 -> 2 padded t-blocks: exercises the
    persistent accumulator scratch across the (k, t) sweep."""
    rng = np.random.default_rng(4)
    x, p = _mk(rng, T=300, K=8192, N=128)
    x8, sx = quantize_act_int8(x)
    out = w8a8_matmul(x8, sx, p["kernel_q"], p["scale"],
                      block_t=256, block_n=128, interpret=True)
    ref = linear_act_int8(x, p)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=1e-2,
    )


def test_linear_w8a8_quality_vs_f32():
    """End-to-end W8A8 error vs the f32 product stays ~sub-1%."""
    rng = np.random.default_rng(3)
    T, K, N = 32, 512, 256
    x = rng.standard_normal((T, K)).astype(np.float32)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.02
    p = quantize_linear({"kernel": jnp.asarray(w)})
    out = linear_w8a8(jnp.asarray(x, jnp.bfloat16), p, interpret=True)
    ref = x @ w
    rel = np.abs(np.asarray(out, np.float32) - ref).max() / (
        np.abs(ref).max() + 1e-9)
    assert rel < 0.02, rel


def test_w8a8_fullk_k_not_multiple_of_128():
    """K=4304 (SigLIP fc2, 4304 % 128 = 80) zero-pads to 4352 inside the
    kernel — exact, since zero int8 rows contribute 0 — and rides the
    full-K path instead of raising or falling back (ADVICE r3 #1)."""
    rng = np.random.default_rng(6)
    x, p = _mk(rng, T=16, K=4304, N=128)
    x8, sx = quantize_act_int8(x)
    out = w8a8_matmul(x8, sx, p["kernel_q"], p["scale"],
                      block_n=128, interpret=True)
    assert out.shape == (16, 128)
    ref = linear_act_int8(x, p)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=1e-2,
    )


def test_w8a8_fullk_nonpow2():
    """Non-pow2 K (SigLIP's 1152 = 2^7*9) rides the full-K single-step
    kernel instead of falling to 128-deep k-blocks."""
    rng = np.random.default_rng(5)
    x, p = _mk(rng, T=16, K=1152, N=128)
    x8, sx = quantize_act_int8(x)
    out = w8a8_matmul(x8, sx, p["kernel_q"], p["scale"],
                      block_n=128, interpret=True)
    ref = linear_act_int8(x, p)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=1e-2,
    )


def test_w8a8_fullk_n_not_multiple_of_128():
    """N=4304 (SigLIP fc1 out-dim, 4304 % 128 = 80) zero-pads the weight
    columns to 4352 inside the kernel and trims the output — exact, since
    zero int8 columns emit zeros.  fc1 no longer falls to the XLA
    fallback (the old linear_act_int8 gate excluded N % 128 != 0)."""
    rng = np.random.default_rng(7)
    x, p = _mk(rng, T=16, K=1152, N=4304)
    x8, sx = quantize_act_int8(x)
    out = w8a8_matmul(x8, sx, p["kernel_q"], p["scale"], interpret=True)
    assert out.shape == (16, 4304)
    ref = linear_act_int8(x, p)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=1e-2,
    )


def test_w8a8_multik_n_padded():
    """N-padding also holds on the k-blocked (K > 4608) path."""
    rng = np.random.default_rng(8)
    x, p = _mk(rng, T=16, K=8192, N=160)
    x8, sx = quantize_act_int8(x)
    out = w8a8_matmul(x8, sx, p["kernel_q"], p["scale"], interpret=True)
    assert out.shape == (16, 160)
    ref = linear_act_int8(x, p)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=1e-2,
    )


def test_w8a8_kblocked_scratch_bounded_at_batched_prefill_t():
    """The k-blocked path's persistent int32 accumulator [Tp, block_n]
    must fit the 16M scoped-VMEM budget at batched-prefill row counts
    (measured blow-up: T=4224, K=12288, block_n=512 -> 17.98M requested
    on chip).  Small-geometry interpret parity for the shrunken-block_n
    path, plus a direct check of the selection rule."""
    # the selection logic (mirrors w8a8_matmul)
    for T, n0, expect in ((1056, 512, 512), (4224, 512, 256),
                          (16896, 512, 128)):
        bn = n0
        N = 4096
        while T * bn * 4 > 6 * 1024 * 1024 and bn > 128:
            nb = bn // 2
            bn = nb if N % nb == 0 else 128
        assert bn == expect, (T, bn)
        assert T * bn * 4 <= 6 * 1024 * 1024 or bn == 128
    # interpret parity at a shrunken block_n (k-blocked path: K > 4608)
    rng = np.random.default_rng(9)
    x, p = _mk(rng, T=8, K=5120, N=256)
    x8, sx = quantize_act_int8(x)
    out = w8a8_matmul(x8, sx, p["kernel_q"], p["scale"],
                      block_n=512, interpret=True)
    ref = linear_act_int8(x, p)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=1e-2,
    )
