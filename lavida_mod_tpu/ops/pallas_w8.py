"""Pallas TPU kernel: fused W8A8 matmul with in-kernel scale epilogue.

Why this exists (round-4 perf map, NOTES_ROUND4.md): the compute-bound
prefill's A8 path (`ops/quant.py::linear_act_int8`) lets XLA materialize
an int32 accumulator [T, N] in HBM and re-read it for the f32
`acc * sx * scale` epilogue — at prefill shapes that is ~150 MB of extra
HBM round-trips per big matmul, plus whatever fusion boundaries XLA
picks around the quantized dot.  This kernel keeps the accumulator in
VMEM and applies the whole epilogue (row scale x column scale -> bf16)
before anything is written.

Design (v5e):
  - grid = (N/bn, K/bk, T/bt), t innermost then k: each weight block is
    fetched from HBM exactly ONCE per call (weights dominate traffic);
    the activation blocks are re-streamed per k step, but x8 is ~10x
    smaller than w8 at the serving shapes;
  - accumulation lives in a persistent VMEM scratch [Tp, bn] int32 that
    survives the t sweep of every k step (k-blocked so the [bt, K] x
    [K, bn] operands never exceed the 16M scoped-VMEM budget — a full-K
    variant OOMs at K=12288, measured);
  - activation quantization happens OUTSIDE the kernel: it is one fused
    VPU pass that XLA merges into the producing op, and keeping it out
    lets one (x8, sx) pair feed several matmuls without re-quantizing.

The reference serves fp16/bf16 via HF transformers (SURVEY.md §2.9;
llava/model/builder.py:62-123 loads bitsandbytes 8-bit at most) — this
int8-activation serving path has no reference counterpart; parity is
against `ops/quant.py::linear_act_int8`'s XLA math, tested in
tests/test_pallas_w8.py (interpret mode, CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def quantize_act_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dynamic per-token symmetric int8: [.., K] -> (int8 [.., K],
    f32 scale [.., 1]).  Matches linear_act_int8's quantization exactly."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(amax / 127.0, 1e-8)
    x8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return x8, sx


@functools.partial(
    jax.jit, static_argnames=("block_t", "block_n", "interpret")
)
def w8a8_matmul(
    x8: jax.Array,       # [T, K] int8 (quantize_act_int8)
    sx: jax.Array,       # [T, 1] f32 per-token scale
    w8: jax.Array,       # [K, N] int8 (quantize_linear kernel_q)
    scale: jax.Array,    # [N] f32 per-out-channel scale
    block_t: int = 384,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """(x8 @ w8) * sx * scale -> [T, N] bf16, epilogue fused in-VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, K = x8.shape
    N = w8.shape[1]
    assert w8.shape[0] == K and scale.shape == (N,), (x8.shape, w8.shape)
    # Pad N to a 128 multiple (zero int8 columns emit zero outputs that
    # the final trim drops — exact): SigLIP's fc1 N=4304 (= 2^4*269) now
    # rides the kernel instead of the N%128 XLA fallback.  The pad copies
    # ~5 MB of int8 weight per call — noise next to the matmul it fixes.
    N_out = N
    if N % 128:
        Np_ = -(-N // 128) * 128
        w8 = jnp.pad(w8, ((0, 0), (0, Np_ - N)))
        scale = jnp.pad(scale, (0, Np_ - N))
        N = Np_
    if N % block_n:
        block_n = next(b for b in (512, 256, 128) if N % b == 0)
    if T <= 256:
        block_t = T
    elif T % block_t:
        # prefer divisors of T (no pad rows; the serve HD prefix is 1056)
        block_t = next((t for t in (352, 528, 288, 384, 256, 512)
                        if T % t == 0), block_t)
    Tp = -(-T // block_t) * block_t
    if Tp != T:
        x8 = jnp.pad(x8, ((0, Tp - T), (0, 0)))
        sx = jnp.pad(sx, ((0, Tp - T), (0, 0)), constant_values=1.0)
    # Pad K to a 128 multiple (zero int8 rows contribute 0 to the int32
    # accumulator — exact): SigLIP's fc2 K=4304 (= 2^4*269) now genuinely
    # rides the full-K path instead of falling to the XLA fallback.
    if K % 128:
        Kp = -(-K // 128) * 128
        x8 = jnp.pad(x8, ((0, 0), (0, Kp - K)))
        w8 = jnp.pad(w8, ((0, Kp - K), (0, 0)))
        K = Kp
    # Full-K single k-step when K fits the scoped-VMEM budget (x block
    # [block_t, K] int8 + w [K, block_n] int8 + acc): kills the
    # accumulator round-trips AND the tiny-block pathology of non-pow2
    # dims (SigLIP's 1152 = 2^7*9 / 4304 = 2^4*269 fell to 128-deep
    # blocks).  Beyond that, largest power-of-two k block <= 4096
    # dividing K (pow2 only: ragged k blocks explode Mosaic compile
    # time — pallas_w4.py, measured; full-K at K=12288 OOMs scoped vmem).
    if K <= 4608:
        # Full-K single k-step (K is 128-padded above): no accumulator
        # scratch or round-trips, and non-pow2 dims (SigLIP 1152 = 2^7*9,
        # 4304 -> padded 4352) stop falling to 128-deep blocks.  Grid
        # (n, t) with t innermost: the weight block is constant in t ->
        # fetched once per n.
        def kernel1(x_ref, sx_ref, w_ref, s_ref, o_ref):
            d = jax.lax.dot_general(
                x_ref[...], w_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            o_ref[...] = (
                d.astype(jnp.float32)
                * sx_ref[...].astype(jnp.float32)
                * s_ref[...].astype(jnp.float32)
            ).astype(jnp.bfloat16)

        out = pl.pallas_call(
            kernel1,
            grid=(N // block_n, Tp // block_t),
            in_specs=[
                pl.BlockSpec((block_t, K), lambda n, t: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_t, 1), lambda n, t: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, block_n), lambda n, t: (0, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_n), lambda n, t: (0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_t, block_n),
                                   lambda n, t: (t, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Tp, N), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(x8, sx, w8, scale[None])
        return out[:T, :N_out]

    block_k = next((b for b in (4096, 2048, 1024, 512, 256, 128)
                    if K % b == 0), 128)  # K is 128-padded above
    # The int32 accumulator scratch [Tp, block_n] persists across the
    # whole k sweep (that is what lets each weight block be fetched from
    # HBM exactly once).  At batched-prefill T (e.g. 4224 = 4x1056 rows,
    # K=12288 ff_out) a 512-wide scratch is 8.6 MB and the kernel blows
    # the 16 MB scoped-VMEM budget (measured: 17.98M requested) — shrink
    # block_n until the scratch fits a ~6 MB slice of it (128 always
    # divides N, which is 128-padded above).
    while Tp * block_n * 4 > 6 * 1024 * 1024 and block_n > 128:
        nb = block_n // 2
        block_n = nb if N % nb == 0 else 128
    nk = K // block_k
    nt = Tp // block_t

    def kernel(x_ref, sx_ref, w_ref, s_ref, o_ref, acc_ref):
        ki = pl.program_id(1)
        ti = pl.program_id(2)
        sl = pl.ds(ti * block_t, block_t)
        d = jax.lax.dot_general(
            x_ref[...], w_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

        @pl.when(ki == 0)
        def _():
            acc_ref[sl, :] = d

        @pl.when(ki > 0)
        def _():
            acc_ref[sl, :] += d

        @pl.when(ki == nk - 1)
        def _():
            o_ref[...] = (
                acc_ref[sl, :].astype(jnp.float32)
                * sx_ref[...].astype(jnp.float32)
                * s_ref[...].astype(jnp.float32)
            ).astype(jnp.bfloat16)

    out = pl.pallas_call(
        kernel,
        # t innermost, then k: the (n,k)-indexed weight block advances
        # monotonically -> W is read from HBM exactly once per call
        grid=(N // block_n, nk, nt),
        in_specs=[
            pl.BlockSpec((block_t, block_k), lambda n, k, t: (t, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, 1), lambda n, k, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda n, k, t: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda n, k, t: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, block_n), lambda n, k, t: (t, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((Tp, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x8, sx, w8, scale[None])
    return out[:T, :N_out]


def linear_w8a8(x: jax.Array, p: dict, preferred=None,
                interpret: bool = False) -> jax.Array:
    """Drop-in for `ops/quant.py::linear_act_int8` on int8-quantized
    params, routed through the fused Pallas kernel.  Handles leading
    batch dims, bias, and LoRA factors identically."""
    assert "kernel_q" in p
    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    x8, sx = quantize_act_int8(x2d)
    y = w8a8_matmul(x8, sx, p["kernel_q"], p["scale"],
                    interpret=interpret)
    y = y.reshape(lead + (y.shape[-1],))
    if preferred is not None:
        y = y.astype(preferred)
    else:
        y = y.astype(x.dtype)
    if "lora_a" in p:
        delta = (x @ p["lora_a"].astype(x.dtype)) @ p["lora_b"].astype(x.dtype)
        y = y + delta.astype(y.dtype) * p["lora_scale"].astype(y.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y
