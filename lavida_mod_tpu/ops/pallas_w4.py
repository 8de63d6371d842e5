"""Pallas TPU kernel: int4-packed weight matmul with in-VMEM unpack.

Status: validated on v5e (0.27% rel err vs reference unpack at bf16
accumulation; ~1.17x XLA's int8-weight matmul at decode shapes
[32, 4096] x [4096, 12288], best block_n=512) and wired end-to-end opt-in:
`quantize_params(bits=4)` + `bench.py --int4` run the whole LM through this
kernel with grouped scales (g=128).  End-to-end it still trails int8 at
batch 1 (prefill is compute-bound and the kernel's MXU utilization is below
XLA's tuned matmul there) — the int4 payoff is HBM headroom (half the LM
weights) for batched serving; see NOTES_ROUND2.md lever 2b.

Why Pallas is REQUIRED for int4 here (not just faster):
  - the jnp.int4 dtype dies in the axon tunnel client (transfer layer);
  - a pure-XLA unpack (shift/mask on packed int8) gets hoisted out of the
    decode scan as loop-invariant code, rematerializing the full bf16
    weights — 16GB, OOM.  Only an in-kernel unpack keeps the packed form
    as the HBM-resident representation.

Packing layout: byte b[k, n] holds w[2k, n] in the LOW nibble and
w[2k+1, n] in the HIGH nibble (both signed, [-8, 7]); activations are
passed split into even/odd K rows so no interleave is needed in-kernel:
    y = x_even @ lo + x_odd @ hi.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pack_w4(w: np.ndarray) -> np.ndarray:
    """[K, N] ints in [-8, 7] -> packed int8 [K/2, N]."""
    assert w.shape[0] % 2 == 0
    lo = w[0::2].astype(np.int32) & 0xF
    hi = w[1::2].astype(np.int32) & 0xF
    return ((hi << 4) | lo).astype(np.uint8).view(np.int8)


def split_even_odd(x: jax.Array) -> jax.Array:
    """[T, K] -> [2, T, K/2] (even rows of K, odd rows of K)."""
    T, K = x.shape
    return jnp.stack([x[:, 0::2], x[:, 1::2]], axis=0)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def w4_matmul(
    x2: jax.Array,        # [2, T, K/2] bf16 (split_even_odd of x)
    packed: jax.Array,    # [K/2, N] int8 (pack_w4)
    scale: jax.Array,     # [N] f32 per-out-channel scale
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """(x @ unpack(packed)) * scale -> [T, N] bf16."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, T, K2 = x2.shape
    N = packed.shape[1]
    assert N % block_n == 0, (N, block_n)

    def kernel(x_ref, p_ref, s_ref, o_ref):
        p32 = p_ref[...].astype(jnp.int32)
        lo = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(p32, 28), 28
        )
        hi = jax.lax.shift_right_arithmetic(p32, 4)
        # hi nibble is already arithmetic-shifted from the int8 view, but
        # the int32 cast sign-extends the BYTE, so hi keeps its sign; lo is
        # sign-extended via the 28-bit round trip
        acc = jnp.dot(x_ref[0], lo.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        acc += jnp.dot(x_ref[1], hi.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        o_ref[...] = (acc * s_ref[0]).astype(jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid=(N // block_n,),
        in_specs=[
            pl.BlockSpec((2, T, K2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, block_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, block_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.bfloat16),
        interpret=interpret,
    )(x2, packed, scale[None])


def quantize_w4_grouped(
    w: np.ndarray, group: int = 128
) -> tuple[np.ndarray, np.ndarray]:
    """[K, N] float -> (packed int8 [K/2, N], scales f32 [K/group, N]).
    AWQ-style grouping along the input dim: each (group, out) block gets a
    symmetric scale, values in [-7, 7]."""
    K, N = w.shape
    assert K % group == 0 and group % 2 == 0
    wg = w.reshape(K // group, group, N).astype(np.float32)
    scales = np.maximum(np.abs(wg).max(axis=1) / 7.0, 1e-8)  # [K/g, N]
    q = np.clip(np.round(wg / scales[:, None, :]), -7, 7).astype(np.int32)
    return pack_w4(q.reshape(K, N)), scales.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("group", "block_n", "interpret"))
def w4_matmul_grouped(
    x2: jax.Array,        # [2, T, K/2] bf16 (split_even_odd of x)
    packed: jax.Array,    # [K/2, N] int8
    scales: jax.Array,    # [K/group, N] f32
    group: int = 128,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Grouped-scale int4 matmul: dequantize (unpack * group scale) in VMEM
    then two MXU dots.  [T, N] bf16."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, T, K2 = x2.shape
    N = packed.shape[1]
    G = scales.shape[0]
    g2 = group // 2
    assert N % block_n == 0 and K2 % g2 == 0 and K2 // g2 == G
    # block tokens AND the contraction dim: prefill calls this at T~1000+
    # and K up to 12288, where whole-operand VMEM blocks (esp. the f32
    # unpack temporaries) blow the 16M scoped limit.  K is the innermost
    # grid dim with f32 scratch accumulation (canonical pallas matmul).
    block_t = min(T, 128)
    block_k = min(K2, 1024)
    Tp = -(-T // block_t) * block_t
    if Tp != T:
        x2 = jnp.pad(x2, ((0, 0), (0, Tp - T), (0, 0)))
    assert K2 % block_k == 0 and block_k % g2 == 0
    gb = block_k // g2
    nk = K2 // block_k

    def kernel(x_ref, p_ref, s_ref, o_ref, acc_ref):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        p32 = p_ref[...].astype(jnp.int32)
        lo = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(p32, 28), 28
        ).astype(jnp.float32)
        hi = jax.lax.shift_right_arithmetic(p32, 4).astype(jnp.float32)
        s_rows = jnp.repeat(s_ref[...], g2, axis=0)   # [block_k, bn]
        lo = (lo * s_rows).astype(jnp.bfloat16)
        hi = (hi * s_rows).astype(jnp.bfloat16)
        acc_ref[...] += jnp.dot(x_ref[0], lo,
                                preferred_element_type=jnp.float32)
        acc_ref[...] += jnp.dot(x_ref[1], hi,
                                preferred_element_type=jnp.float32)

        @pl.when(ki == nk - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

    out = pl.pallas_call(
        kernel,
        grid=(Tp // block_t, N // block_n, nk),
        in_specs=[
            pl.BlockSpec((2, block_t, block_k),
                         lambda t, i, k: (0, t, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda t, i, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, block_n), lambda t, i, k: (k, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, block_n), lambda t, i, k: (t, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((block_t, block_n), jnp.float32)],
        interpret=interpret,
    )(x2, packed, scales)
    return out[:T]


def dequant_w4_grouped(packed: np.ndarray, scales: np.ndarray,
                       group: int = 128) -> np.ndarray:
    """Reference dequant: (packed, scales) -> [K, N] float32."""
    q = unpack_w4_reference(packed).astype(np.float32)
    K, N = q.shape
    return (q.reshape(K // group, group, N) * scales[:, None, :]).reshape(K, N)


def unpack_w4_reference(packed: np.ndarray) -> np.ndarray:
    """Numpy oracle: [K/2, N] int8 -> [K, N] int32."""
    p = packed.astype(np.int32)
    lo = (p << 28) >> 28
    hi = p >> 4
    K2, N = packed.shape
    out = np.empty((K2 * 2, N), np.int32)
    out[0::2] = lo
    out[1::2] = hi
    return out
