"""Fused W4A8 decode-layer Pallas kernels (dispatch-count reduction).

Motivation (scripts/probes/_w4_callcount.py, v5e measured): the decode
step is weight-bandwidth-bound, and its Pallas dispatch pattern costs
real time — the same int4 weight bytes stream at ~674 GB/s through 8
giant kernel calls but only ~572 GB/s through the 128-call per-layer
pattern (~8 us/dispatch + the XLA glue ops between calls).  The decode
loop's HBM floor is ~4.6 ms/step; the measured step is 7.4 ms (kv8).

These kernels shrink a decode transformer layer from 7 Pallas calls +
~10 XLA inter-ops to 3 Pallas calls + rope/attention:

  w4_qkv_norm  : RMSNorm -> per-token int8 quant -> grouped-int4 matmul
                 (the attention projection; full-K single block)
  w4_matmul_res: grouped-int4 matmul + residual add epilogue
                 (the attention output projection)
  w4_ffn_fused : RMSNorm -> quant -> up|gate matmul -> SwiGLU -> quant
                 -> down matmul -> residual add, in ONE kernel; the
                 [T, 2H] intermediate lives in VMEM scratch and never
                 touches HBM.

Numerics mirror the unfused chain exactly (same precision boundaries:
f32 rsqrt -> bf16 affine -> per-token A8 quant -> s8xs8 group dots ->
f32 scale accumulate; SwiGLU in bf16 like ops/quant._linear_w4 +
models/llada._act), so the fused path is a pure scheduling change —
parity-tested against the unfused ops in tests/test_w4_fused.py.

Reference hot path these accelerate: the per-step full-model forward of
the denoise loop, modeling_llada.py:712-787 (reference runs it as ~7
separate nn.Linear/norm torch kernels per layer per step).

Weight layout: pack_w4 bytes (ops/pallas_w4.py) — pltpu.bitcast to int4
doubles the sublane dim in exactly pack order, so unpack is one type
convert.  Grouped scales g=128 along the input dim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _group_dot_acc(x8, w8, scales, group: int, out_f32):
    """sum_g scales[g] * (x8[:, g] @ w8[g]) accumulated in f32.

    x8 [T, K] int8, w8 [K, bn] int8, scales [gb(, padded), bn] f32.
    Unrolled python loop — gb is static.
    """
    gb = x8.shape[1] // group
    acc = out_f32
    for g in range(gb):
        d = lax.dot_general(
            x8[:, g * group:(g + 1) * group],
            w8[g * group:(g + 1) * group],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc += d.astype(jnp.float32) * scales[g][None, :]
    return acc


def _rms_quant(x, norm_w, eps):
    """RMSNorm (f32 stats, bf16 affine — ops/norms.py:15-26) then
    per-token int8 quant (ops/quant.py:154-156).  x [T, D] -> (x8, sx)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    h = (xf * lax.rsqrt(var + eps)).astype(jnp.bfloat16)
    h = (h * norm_w.astype(jnp.bfloat16)).astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True),
                     1e-8) / 127.0
    x8 = jnp.clip(jnp.round(h / sx), -127, 127).astype(jnp.int8)
    return x8, sx


@functools.partial(jax.jit, static_argnames=("eps", "group", "block_n",
                                             "interpret", "block_t"))
def w4_qkv_norm(
    x: jax.Array,         # [T, D] bf16 (pre-norm residual stream)
    norm_w: jax.Array,    # [D] norm affine weight
    packed: jax.Array,    # [D/2, N] int8 (pack_w4)
    scales: jax.Array,    # [D/group, N] f32
    bias: jax.Array | None = None,  # [N] — Qwen2-family QKV bias
    eps: float = 1e-5,
    group: int = 128,
    block_n: int = 512,
    interpret: bool = False,
    block_t: int | None = None,
) -> jax.Array:
    """rmsnorm(x) @ W4 (+ bias) with in-kernel norm + A8 quant.  Full-K
    (single k-block: D/2 <= 2048 packed rows).  [T, N] bf16.

    Decode (T <= 128): 1-D grid over N blocks, whole-T scratch.
    Prefill (block_t set): 2-D grid (n, t) — the weight block is constant
    in t (fetched once per n); the norm+quant of each t-block runs at
    n == 0 into a persistent [Tp, D] scratch, so the VPU work interleaves
    with the MXU dots instead of running as separate XLA passes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, D = x.shape
    K2, N = packed.shape
    Gu = scales.shape[0]
    assert D == 2 * K2 and K2 <= 2048 and N % block_n == 0
    assert Gu * group == D
    nb = N // block_n
    has_bias = bias is not None

    if block_t is not None:
        Tp = -(-T // block_t) * block_t
        if Tp != T:
            x = jnp.pad(x, ((0, Tp - T), (0, 0)))
        nt = Tp // block_t

        def kernel_t(*refs):
            if has_bias:
                (x_ref, nw_ref, p_ref, s_ref, b_ref, o_ref,
                 x8_ref, sx_ref) = refs
            else:
                x_ref, nw_ref, p_ref, s_ref, o_ref, x8_ref, sx_ref = refs
            n = pl.program_id(0)
            t = pl.program_id(1)
            sl = pl.ds(t * block_t, block_t)

            @pl.when(n == 0)
            def _():
                x8, sx = _rms_quant(x_ref[...], nw_ref[0], eps)
                x8_ref[sl, :] = x8
                sx_ref[sl, :] = sx

            w8 = pltpu.bitcast(p_ref[...], jnp.int4).astype(jnp.int8)
            acc = _group_dot_acc(x8_ref[sl, :], w8, s_ref, group,
                                 jnp.zeros((block_t, block_n),
                                           jnp.float32))
            acc = acc * sx_ref[sl, :]
            if has_bias:
                acc = acc + b_ref[...].astype(jnp.float32)
            o_ref[...] = acc.astype(jnp.bfloat16)

        in_specs = [
            pl.BlockSpec((block_t, D), lambda n, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda n, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, block_n), lambda n, t: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Gu, block_n), lambda n, t: (0, n),
                         memory_space=pltpu.VMEM),
        ]
        operands = [x, norm_w[None], packed, scales]
        if has_bias:
            in_specs.append(
                pl.BlockSpec((1, block_n), lambda n, t: (0, n),
                             memory_space=pltpu.VMEM))
            operands.append(bias[None])

        out = pl.pallas_call(
            kernel_t,
            grid=(nb, nt),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_t, block_n),
                                   lambda n, t: (t, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Tp, N), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((Tp, D), jnp.int8),
                pltpu.VMEM((Tp, 1), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(*operands)
        return out[:T]

    def kernel(*refs):
        if has_bias:
            x_ref, nw_ref, p_ref, s_ref, b_ref, o_ref, x8_ref, sx_ref = refs
        else:
            x_ref, nw_ref, p_ref, s_ref, o_ref, x8_ref, sx_ref = refs
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            x8, sx = _rms_quant(x_ref[...], nw_ref[0], eps)
            x8_ref[...] = x8
            sx_ref[...] = sx

        w8 = pltpu.bitcast(p_ref[...], jnp.int4).astype(jnp.int8)
        acc = _group_dot_acc(x8_ref[...], w8, s_ref, group,
                             jnp.zeros((T, block_n), jnp.float32))
        acc = acc * sx_ref[...]
        if has_bias:
            acc = acc + b_ref[...].astype(jnp.float32)
        o_ref[...] = acc.astype(jnp.bfloat16)

    in_specs = [
        pl.BlockSpec((T, D), lambda s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), lambda s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K2, block_n), lambda s: (0, s),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Gu, block_n), lambda s: (0, s),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, norm_w[None], packed, scales]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, block_n), lambda s: (0, s),
                                     memory_space=pltpu.VMEM))
        operands.append(bias[None])

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, block_n), lambda s: (0, s),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((T, D), jnp.int8),
            pltpu.VMEM((T, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)


def _pick_block_k(K2: int, g2: int) -> int:
    """Largest power-of-two k-block (<= 2048 packed rows) dividing K2
    (pallas_w4.py:169-173 — non-pow2 blocks explode Mosaic compile)."""
    return next(b for b in (2048, 1024, 512, 256, 128, 64, g2)
                if K2 % b == 0 and b % g2 == 0)


def _pad_group_scales(scales, nk: int, gb: int, N: int):
    """Pad per-k-step scale rows up to a multiple of 8 (Mosaic sublane
    constraint — pallas_w4.py:181-188).  Returns (scales, gb8)."""
    gb8 = -(-gb // 8) * 8
    if gb8 != gb:
        scales = jnp.pad(
            scales.reshape(nk, gb, N), ((0, 0), (0, gb8 - gb), (0, 0))
        ).reshape(nk * gb8, N)
    return scales, gb8


@functools.partial(jax.jit, static_argnames=("group", "block_n",
                                             "interpret"))
def w4_matmul_res(
    a: jax.Array,         # [T, K] bf16 (attention output)
    res: jax.Array,       # [T, N] bf16 (residual stream)
    packed: jax.Array,    # [K/2, N] int8
    scales: jax.Array,    # [K/group, N] f32
    group: int = 128,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """res + (a @ W4) with in-kernel A8 quant + residual epilogue.
    [T, N] bf16."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, K = a.shape
    K2, N = packed.shape
    assert K == 2 * K2 and N % block_n == 0
    g2 = group // 2
    block_k = _pick_block_k(K2, g2)
    nk = K2 // block_k
    gb = block_k // g2
    scales, gb8 = _pad_group_scales(scales, nk, gb, N)

    # per-token A8 quant outside (fuses into the producer, as in
    # pallas_w4.w4_matmul_grouped)
    af = a.astype(jnp.float32)
    sa = jnp.maximum(jnp.max(jnp.abs(af), axis=-1, keepdims=True),
                     1e-8) / 127.0
    a8 = jnp.clip(jnp.round(af / sa), -127, 127).astype(jnp.int8)

    def kernel(a_ref, sa_ref, r_ref, p_ref, s_ref, o_ref, acc_ref):
        ki = pl.program_id(1)

        @pl.when(ki == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        w8 = pltpu.bitcast(p_ref[...], jnp.int4).astype(jnp.int8)
        acc_ref[...] = _group_dot_acc(a_ref[...], w8, s_ref, group,
                                      acc_ref[...])

        @pl.when(ki == nk - 1)
        def _():
            o_ref[...] = (acc_ref[...] * sa_ref[...].astype(jnp.float32)
                          + r_ref[...].astype(jnp.float32)
                          ).astype(jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid=(N // block_n, nk),
        in_specs=[
            pl.BlockSpec((T, 2 * block_k), lambda n, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda n, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, block_n), lambda n, k: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb8, block_n), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, block_n), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((T, block_n), jnp.float32)],
        interpret=interpret,
    )(a8, sa.astype(jnp.float32), res, packed, scales)


@functools.partial(jax.jit, static_argnames=("eps", "group", "block_n",
                                             "interpret"))
def w4_ffn_fused(
    x: jax.Array,          # [T, D] bf16 (pre-norm residual stream)
    norm_w: jax.Array,     # [D]
    up_packed: jax.Array,  # [D/2, 2H] int8 — fused [up|gate] layout
    up_scales: jax.Array,  # [D/group, 2H] f32
    dn_packed: jax.Array,  # [H/2, D] int8
    dn_scales: jax.Array,  # [H/group, D] f32
    eps: float = 1e-5,
    group: int = 128,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """x + down(swiglu(rmsnorm(x) @ W_upgate)) in one kernel.

    Grid phases (1D): n_up up|gate blocks (full-K dots into a VMEM
    product scratch), then a SwiGLU+quant transition on the first down
    step, then kd*nd down blocks (k-inner accumulate, residual-add
    epilogue).  Inactive inputs keep a constant block index so Pallas
    never re-fetches them.  [T, D] bf16.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, D = x.shape
    K2u, N2H = up_packed.shape
    K2d, Nd = dn_packed.shape
    H = N2H // 2
    Hd = 2 * K2d  # down matmul K: H, possibly row-padded for k-blocking
    assert Hd >= H and Nd == D and D == 2 * K2u
    assert K2u <= 2048, "up matmul must fit one k-block"
    assert N2H % block_n == 0 and D % block_n == 0 and H % block_n == 0 \
        and Hd % block_n == 0
    Gu = up_scales.shape[0]
    assert Gu * group == D

    g2 = group // 2
    bkd = _pick_block_k(K2d, g2)
    kd = K2d // bkd
    gbd = bkd // g2
    dn_scales, gbd8 = _pad_group_scales(dn_scales, kd, gbd, Nd)

    n_up = N2H // block_n       # up|gate column blocks
    nh = H // block_n           # intermediate column blocks
    nhp = Hd // block_n         # incl. zero pad blocks (padded_in_dim)
    nd = Nd // block_n          # output column blocks
    S = n_up + kd * nd
    bpk = (2 * bkd) // block_n  # intermediate blocks consumed per k-step
    gpb = block_n // group      # groups per intermediate block

    def up_idx(s):
        return (0, jnp.minimum(s, n_up - 1))

    def dn_k(s):
        return jnp.maximum(s - n_up, 0) % kd

    def dn_n(s):
        return jnp.maximum(s - n_up, 0) // kd

    def kernel(x_ref, nw_ref, xr_ref, up_ref, us_ref, dp_ref, ds_ref,
               o_ref, x8_ref, sx_ref, prod_ref, a8_ref, sa_ref, acc_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            x8, sx = _rms_quant(x_ref[...], nw_ref[0], eps)
            x8_ref[...] = x8
            sx_ref[...] = sx

        @pl.when(s < n_up)
        def _():
            w8 = pltpu.bitcast(up_ref[...], jnp.int4).astype(jnp.int8)
            acc = _group_dot_acc(x8_ref[...], w8, us_ref, group,
                                 jnp.zeros((T, block_n), jnp.float32))
            prod_ref[s] = (acc * sx_ref[...]).astype(jnp.bfloat16)

        @pl.when(s == n_up)
        def _():
            # SwiGLU in bf16 (models/llada.py:111-115 chunk order:
            # xx = first half [up], gate = second half) + per-token
            # A8 quant of the [T, H] intermediate
            amax = jnp.zeros((T, 1), jnp.float32)
            for j in range(nh):
                # silu in f32: Mosaic mis-lowers bf16 logistic (f32
                # constant broadcast into a bf16 vector, verifier error)
                g = prod_ref[nh + j].astype(jnp.float32)
                i_j = (g * lax.logistic(g)
                       * prod_ref[j].astype(jnp.float32)
                       ).astype(jnp.bfloat16)
                prod_ref[j] = i_j
                amax = jnp.maximum(
                    amax,
                    jnp.max(jnp.abs(i_j.astype(jnp.float32)),
                            axis=-1, keepdims=True))
            sa = jnp.maximum(amax, 1e-8) / 127.0
            sa_ref[...] = sa
            for j in range(nh):
                a8_ref[j] = jnp.clip(
                    jnp.round(prod_ref[j].astype(jnp.float32) / sa),
                    -127, 127).astype(jnp.int8)
            for j in range(nh, nhp):  # k-blocking pad rows: exact zeros
                a8_ref[j] = jnp.zeros((T, block_n), jnp.int8)

        @pl.when(s >= n_up)
        def _():
            k = dn_k(s)

            @pl.when(k == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            w8 = pltpu.bitcast(dp_ref[...], jnp.int4).astype(jnp.int8)
            acc = acc_ref[...]
            for g in range(gbd):
                a8_g = a8_ref[k * bpk + g // gpb][
                    :, (g % gpb) * group:(g % gpb + 1) * group]
                d = lax.dot_general(
                    a8_g, w8[g * group:(g + 1) * group],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc += d.astype(jnp.float32) * ds_ref[g][None, :]
            acc_ref[...] = acc

            @pl.when(k == kd - 1)
            def _():
                o_ref[...] = (acc_ref[...] * sa_ref[...]
                              + xr_ref[...].astype(jnp.float32)
                              ).astype(jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((T, D), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, block_n), lambda s: (0, dn_n(s)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K2u, block_n), up_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Gu, block_n), up_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bkd, block_n), lambda s: (dn_k(s), dn_n(s)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gbd8, block_n), lambda s: (dn_k(s), dn_n(s)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, block_n), lambda s: (0, dn_n(s)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, D), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((T, D), jnp.int8),            # x8 (norm quant)
            pltpu.VMEM((T, 1), jnp.float32),         # sx
            pltpu.VMEM((n_up, T, block_n), jnp.bfloat16),  # up|gate prod
            pltpu.VMEM((nhp, T, block_n), jnp.int8),  # quantized swiglu
            pltpu.VMEM((T, 1), jnp.float32),         # sa
            pltpu.VMEM((T, block_n), jnp.float32),   # down accumulator
        ],
        interpret=interpret,
    )(x, norm_w[None], x, up_packed, up_scales, dn_packed, dn_scales)
