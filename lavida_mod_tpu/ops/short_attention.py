"""Pallas TPU kernel: one-shot attention for VMEM-resident sequences.

Why this exists (round-3/4 perf map, NOTES_ROUND4.md): the serving
prefill runs attention at T ~= 1k where the stock JAX flash-attention
kernel (online-softmax over 128-wide KV tiles) measured 0.85 ms/layer —
~8x the MXU floor.  At these lengths the ENTIRE per-head K/V (S x 128
bf16 ~= 0.3 MB each) and the full f32 score tile fit in VMEM, so the
flash machinery (KV-block streaming, running max/sum rescaling, multiple
grid sweeps) is pure overhead.  This kernel does the textbook thing for
the small-S regime:

  grid = (B, Hq, T/block_q); per step it loads one q block plus the
  whole K/V for that head (K/V block index is constant in the q-block
  axis, so Mosaic's revolving-buffer detects the unchanged block and
  skips the re-fetch), computes the full [block_q, S] f32 score tile,
  applies the segment mask, takes a single-pass softmax (no online
  accumulation -- the whole row is present), and writes the output.

Masking matches `ops/attention.flash_attention`'s segment-id semantics
(tokens attend only within equal segment ids; the wrapper uses them as
binary valid/pad masks — the reference's SDPA path expresses the same
thing as an additive key-padding mask, modeling_llada.py:648-684).

GQA is native: the K/V index map divides the query-head index by the
group size instead of materializing repeated heads.

Backward: inference-first kernel; gradients recompute through the
reference XLA math (`_short_reference`) via custom_vjp, so the op stays
differentiable everywhere without a hand-written bwd kernel (the
training paths use prefix_flash/dense anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30

# Largest padded KV length routed to this kernel: beyond this the f32
# score tile stops fitting comfortably in the 16M scoped VMEM and the
# streaming flash kernel wins.
MAX_SHORT_S = 4096


def _pick_block_q(Tp: int, Sp: int) -> int:
    # score tile block_q x Sp f32 capped at ~2 MB; blocks stay multiples
    # of 128 (Tp already is, from the wrapper's bucketing)
    cap = max(128, (2 * 1024 * 1024 // (4 * Sp)) // 128 * 128)
    for b in (512, 384, 256, 128):
        if b <= cap and Tp % b == 0:
            return b
    return 128


def _short_reference(q, k, v, q_seg, kv_seg, scale):
    """XLA twin of the kernel's math (segment-equality masking)."""
    B, T, Hq, hd = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    qg = q.reshape(B, T, Hkv, G, hd)
    s = jnp.einsum("bthgd,bshd->bhgts", qg, k,
                   preferred_element_type=jnp.float32) * scale
    if q_seg is not None:
        ok = q_seg[:, None, None, :, None] == kv_seg[:, None, None, None, :]
        s = jnp.where(ok, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgts,bshd->bthgd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return o.reshape(B, T, Hq, hd).astype(q.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret")
)
def _short_kernel_call(q, k, v, q_seg, kv_seg, scale, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, Hq, hd = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv
    block_q = _pick_block_q(T, S)
    masked = q_seg is not None

    # kernel layout [B, H, T, hd]: T on the sublane axis, hd on lanes
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    def kernel(*refs):
        if masked:
            q_ref, k_ref, v_ref, qs_ref, ks_ref, o_ref = refs
        else:
            q_ref, k_ref, v_ref, o_ref = refs
        s = jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                    # [block_q, S]
        if masked:
            # segment ids arrive lane/sublane-broadcast (stock flash
            # kernel's trick): q [block_q, 128] / kv [8, S]; slicing one
            # lane/sublane keeps the comparison a 2D broadcast
            ok = qs_ref[0][:, :1] == ks_ref[0][:1, :]
            s = jnp.where(ok, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # [block_q, hd]
        o_ref[0, 0] = (o / l).astype(o_ref.dtype)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, hd), lambda b, h, t: (b, h, t, 0)),
        # constant in t -> fetched once per (b, h); GQA via h // G
        pl.BlockSpec((1, 1, S, hd), lambda b, h, t: (b, h // G, 0, 0)),
        pl.BlockSpec((1, 1, S, hd), lambda b, h, t: (b, h // G, 0, 0)),
    ]
    args = [qt, kt, vt]
    if masked:
        qs = jax.lax.broadcast_in_dim(
            q_seg.astype(jnp.int32), (B, T, 128), (0, 1))
        ks = jax.lax.broadcast_in_dim(
            kv_seg.astype(jnp.int32), (B, 8, S), (0, 2))
        in_specs += [
            pl.BlockSpec((1, block_q, 128), lambda b, h, t: (b, t, 0)),
            pl.BlockSpec((1, 8, S), lambda b, h, t: (b, 0, 0)),
        ]
        args += [qs, ks]

    out = pl.pallas_call(
        kernel,
        grid=(B, Hq, T // block_q),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, hd),
                               lambda b, h, t: (b, h, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hq, T, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return out.transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _short_attention(q, k, v, q_seg, kv_seg, scale, interpret=False):
    return _short_kernel_call(q, k, v, q_seg, kv_seg, scale,
                              interpret=interpret)


def _short_fwd(q, k, v, q_seg, kv_seg, scale, interpret=False):
    out = _short_attention(q, k, v, q_seg, kv_seg, scale, interpret)
    return out, (q, k, v, q_seg, kv_seg)


def _short_bwd(scale, interpret, res, g):
    q, k, v, q_seg, kv_seg = res
    _, vjp = jax.vjp(
        lambda q, k, v: _short_reference(q, k, v, q_seg, kv_seg, scale),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_short_attention.defvjp(_short_fwd, _short_bwd)


def short_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    segment_ids_q: jax.Array | None = None,
    segment_ids_kv: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for `ops/attention.flash_attention` in the short-S regime.

    q: [B, T, Hq, hd]; k, v: [B, S, Hkv, hd]; T/S bucketed to 128 here
    (pad q rows get a fresh negative segment id so they only attend to
    themselves-as-pad kv columns; output rows are sliced off anyway).
    """
    B, T, Hq, hd = q.shape
    S = k.shape[1]
    Tp = -(-T // 128) * 128
    Sp = -(-S // 128) * 128
    if (Tp != T or Sp != S) and segment_ids_q is None:
        segment_ids_q = jnp.ones((B, T), jnp.int32)
        segment_ids_kv = jnp.ones((B, S), jnp.int32)
    if Tp != T:
        q = jnp.pad(q, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
        segment_ids_q = jnp.pad(segment_ids_q, ((0, 0), (0, Tp - T)),
                                constant_values=-1)
    if Sp != S:
        k = jnp.pad(k, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
        segment_ids_kv = jnp.pad(segment_ids_kv, ((0, 0), (0, Sp - S)),
                                 constant_values=-2)
    out = _short_attention(q, k, v, segment_ids_q, segment_ids_kv,
                           1.0 / (hd ** 0.5), interpret)
    return out[:, :T]
