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


def padded_in_dim(K: int) -> int:
    """Row (K) padding that keeps big matmuls on 2048-deep k-blocks.

    w4_matmul_grouped streams weights in power-of-two k-blocks; dims like
    Qwen2's 18944 = 2^9*37 only admit 256-row blocks — 8x more grid
    k-steps, measured 68 vs 39 us per [32,18944]x[18944,3584] decode
    matmul on v5e (scripts/probes/_dream_blockk.py).  Padding K to the
    next multiple of 4096 (2048 packed rows) with zero weight rows is
    numerically exact (zero rows contribute exactly 0) and costs ~8%
    extra weight bytes on the one affected matmul.  Small K stays as-is:
    the probe shows K<=4k shapes already at the weight-read floor."""
    if K < 8192 or K % 4096 == 0:
        return K
    return -(-K // 4096) * 4096


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


@functools.partial(jax.jit, static_argnames=("group", "block_n", "interpret",
                                             "dim_semantics", "block_t"))
def w4_matmul_grouped(
    x: jax.Array,         # [T, K] bf16 (or any float)
    packed: jax.Array,    # [K/2, N] int8
    scales: jax.Array,    # [K/group, N] f32
    group: int = 128,
    block_n: int = 512,
    interpret: bool = False,
    dim_semantics: bool = False,
    block_t: int | None = None,
) -> jax.Array:
    """Grouped int4 matmul, W4A8 formulation — the v5e-measured winner.

    Two measured facts drive the design (scripts/probes/_w4a8.py):
      1. `pltpu.bitcast(int8_block, int4)` reinterprets the packed bytes
         in-register as int4, doubling the SUBLANE dim in exactly pack_w4's
         row order (byte k -> rows 2k lo-nibble, 2k+1 hi) — so unpack is a
         single type conversion, not shift/mask arithmetic.  The old
         shift-based unpack (~9 VPU passes/weight) ran at ~150 GB/s; the
         kernel is VPU-bound, not DMA-bound.
      2. Converting int4->int8 and running s8 x s8 MXU dots is 2.1x faster
         than int4->bf16 + bf16 scale-mult + bf16 dot: the weight-side VPU
         work drops to one narrow convert and the group scales re-associate
         onto the small f32 accumulator (y = sum_g s_g * (x_g @ w_g)).

    Activations are dynamically quantized per token to int8 (outside the
    kernel, fusing into the producer); total error vs the f32 reference is
    ~1% of max |y| (int4 grouped weights alone: ~0.4%) — the int4 path is
    opt-in serving with per-checkpoint quality evaluation either way.

    [T, N] bf16.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, K = x.shape
    K2 = packed.shape[0]
    N = packed.shape[1]
    G = scales.shape[0]
    g2 = group // 2
    assert K == 2 * K2 and N % block_n == 0 and K2 % g2 == 0 and K2 // g2 == G

    # dynamic per-token int8 activation quantization (A8)
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    x8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)

    # Block choice (v5e sweep, scripts/probes/_w4a8_prefill_tune.py):
    # k-blocks of 2048 packed rows beat 1024 by ~6% (fewer accumulator
    # round-trips), and at prefill shapes a t-block of 288 divides the
    # 1152-token HD prefix exactly (t=256 would pad to 1280 and re-convert
    # the weights 5x instead of 4x).  Decode (T<=256) keeps block_t=T.
    if block_t is None:
        if T <= 256:
            block_t = T
        else:
            # prefer divisors of T (no pad rows): the serve HD prefix is
            # 1056 tokens — the old 288 pick padded to 1152 (+9% dead
            # rows, 301 TOPS); 352 measured 335 TOPS, 528 332, full-T
            # 1056 OOMs scoped VMEM (scripts/probes/_w4_blockt_1056.py)
            block_t = next((t for t in (352, 528, 288, 384, 256, 512)
                            if T % t == 0), 288)
    # Largest power-of-two k-block (<=2048 rows) dividing K2: 2048 for
    # the 4096/12288 LLaDA dims, 256 for Dream's 18944 FFN (K2 = 2^8*37).
    # Power-of-two only — a 2368-row block (37 unrolled group dots)
    # explodes Mosaic compile time (>9 min, measured).
    block_k = next(b for b in (2048, 1024, 512, 256, 128, 64, g2)
                   if K2 % b == 0 and b % g2 == 0)
    Tp = -(-T // block_t) * block_t
    if Tp != T:
        x8 = jnp.pad(x8, ((0, Tp - T), (0, 0)))
        sx = jnp.pad(sx, ((0, Tp - T), (0, 0)), constant_values=1.0)
    assert K2 % block_k == 0 and block_k % g2 == 0
    gb = block_k // g2
    nk = K2 // block_k
    # Mosaic requires a block's second-to-last dim be a multiple of 8 (or
    # full): pad each k-step's scale rows up to gb8 (gb=4 at Dream's
    # K2=2^8*37 FFN -> 8); the LLaDA dims (gb 16/32) pass through as-is
    gb8 = -(-gb // 8) * 8
    if gb8 != gb:
        scales = jnp.pad(
            scales.reshape(nk, gb, N), ((0, 0), (0, gb8 - gb), (0, 0))
        ).reshape(nk * gb8, N)

    def kernel(x_ref, sx_ref, p_ref, s_ref, o_ref, acc_ref):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        w8 = pltpu.bitcast(p_ref[...], jnp.int4).astype(jnp.int8)
        xb = x_ref[...]
        acc = jnp.zeros_like(acc_ref)
        for g in range(gb):
            d = jax.lax.dot_general(
                xb[:, g * group:(g + 1) * group],
                w8[g * group:(g + 1) * group],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc += d.astype(jnp.float32) * s_ref[g][None, :]
        acc_ref[...] += acc

        @pl.when(ki == nk - 1)
        def _():
            o_ref[...] = (acc_ref[...] * sx_ref[...].astype(jnp.float32)
                          ).astype(jnp.bfloat16)

    out = pl.pallas_call(
        kernel,
        grid=(Tp // block_t, N // block_n, nk),
        in_specs=[
            pl.BlockSpec((block_t, 2 * block_k),
                         lambda t, i, k: (t, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, 1), lambda t, i, k: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda t, i, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb8, block_n), lambda t, i, k: (k, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, block_n), lambda t, i, k: (t, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((block_t, block_n), jnp.float32)],
        compiler_params=(pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ) if dim_semantics else None),
        interpret=interpret,
    )(x8, sx.astype(jnp.float32), packed, scales)
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
