"""Pallas TPU kernel: int4-packed weight matmul with in-VMEM unpack.

Status: working and validated on v5e (0.27% rel err vs reference unpack at
bf16 accumulation; ~1.17x XLA's int8-weight matmul at decode shapes
[32, 4096] x [4096, 12288], best block_n=512).  NOT yet wired into the
model: the measured win over int8 is below the quality risk of per-channel
int4 for the 8B — revisit in round 2 with grouped scales (g=128) and a
quality evaluation (NOTES_ROUND2.md).

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
