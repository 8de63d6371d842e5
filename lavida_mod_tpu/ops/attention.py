"""Attention ops: non-causal GQA attention with optional additive bias.

The reference runs torch SDPA / flash-attn with `is_causal=False` and GQA via
repeat_interleave (modeling_llada.py:648-684).  Here:

  - `dense_attention`: reference semantics in pure XLA — bf16 matmuls with
    f32 accumulation on the MXU, f32 softmax.  GQA is expressed by reshaping
    queries into [groups, kv_heads] instead of materializing repeated K/V.
  - `flash_attention`: dispatches to the Pallas TPU flash-attention kernel
    shipped with JAX (jax.experimental.pallas.ops.tpu.flash_attention) for
    long sequences where the O(T^2) scores don't fit comfortably in VMEM/HBM;
    non-causal, used by the training path.

Bias convention: additive f32, broadcastable to [B, H, T, S] (0 = attend,
NEG_INF = masked).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def dense_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """q: [B, T, Hq, hd]; k, v: [B, S, Hkv, hd]; Hq % Hkv == 0.

    Returns [B, T, Hq, hd] in q.dtype.
    """
    B, T, Hq, hd = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    assert Hq % Hkv == 0, (Hq, Hkv)
    G = Hq // Hkv
    if scale is None:
        scale = 1.0 / (hd**0.5)

    qg = q.reshape(B, T, Hkv, G, hd)
    # [B, Hkv, G, T, S] f32 scores
    scores = jnp.einsum(
        "bthgd,bshd->bhgts", qg, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if bias is not None:
        # bias broadcast over the query-group axis
        bias = bias.astype(jnp.float32)
        if bias.ndim == 4:  # [B or 1, H or 1, T, S]
            bh = bias.shape[1]
            if bh == 1:
                bias = bias[:, :, None, :, :]
            else:
                bias = bias.reshape(bias.shape[0], Hkv, G, T, S)
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhgts,bshd->bthgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, T, Hq, hd).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("causal",))
def _pallas_flash(q, k, v, segment_ids_q, segment_ids_kv, causal=False):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention as _fa,
    )

    seg = None
    if segment_ids_q is not None:
        seg = SegmentIds(q=segment_ids_q, kv=segment_ids_kv)
    return _fa(q, k, v, segment_ids=seg, causal=causal,
               sm_scale=1.0 / (q.shape[-1] ** 0.5))


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    segment_ids_q: jax.Array | None = None,
    segment_ids_kv: jax.Array | None = None,
) -> jax.Array:
    """Non-causal Pallas flash attention.  q: [B, T, Hq, hd]; k, v: [B, S,
    Hkv, hd].  Segment ids express padding (0 = pad segment) — tokens attend
    only within equal segment ids.  GQA handled by repeating K/V heads (the
    kernel streams K/V from HBM, so the repeat is a view-level broadcast cost).

    Sequence lengths are bucketed to 128 INSIDE this op: the kernel tiles
    q/kv in 128-blocks, so q/k/v are end-padded (pad rows get segment id 0)
    and the output sliced back.  Padding here — after the projections,
    before the FLOPs-dominant layers ever see it — costs one cheap copy
    instead of 9% extra QKV/FFN work at the model level (measured on v5e:
    model-level 1056->1152 padding ate most of the flash win).
    """
    B, T, Hq, hd = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    if -(-S // 128) * 128 <= 4096:
        # VMEM-resident regime (serving prefill, T ~= 1k): the one-shot
        # kernel beats the streaming flash kernel ~4x here — whole-head
        # K/V and the full f32 score tile fit in VMEM, so the online-
        # softmax machinery is pure overhead (ops/short_attention.py).
        from .short_attention import short_attention

        return short_attention(
            q, k, v, segment_ids_q, segment_ids_kv,
            interpret=jax.default_backend() != "tpu",
        )
    if Hq != Hkv:
        rep = Hq // Hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    Tp = -(-T // 128) * 128
    Sp = -(-S // 128) * 128
    if Tp != T or Sp != S:
        if segment_ids_q is None:
            segment_ids_q = jnp.ones((B, T), jnp.int32)
            segment_ids_kv = jnp.ones((B, S), jnp.int32)
        q = jnp.pad(q, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
        segment_ids_q = jnp.pad(segment_ids_q, ((0, 0), (0, Tp - T)))
        segment_ids_kv = jnp.pad(segment_ids_kv, ((0, 0), (0, Sp - S)))
    # kernel layout is [B, H, T, hd]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _pallas_flash(qt, kt, vt, segment_ids_q, segment_ids_kv, causal=False)
    return out.transpose(0, 2, 1, 3)[:, :T]


def vision_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     mesh=None,
                     batch_axes: tuple = ("dp", "fsdp")) -> jax.Array:
    """Bidirectional unmasked attention for vision towers.

    On TPU: the one-shot VMEM-resident kernel (ops/short_attention.py) —
    ViT grids always fit the S <= 4096 regime, and dense XLA attention
    materializes f32 [N, H, T, T] score tensors in HBM (26-layer SigLIP
    tower measured 39 ms dense vs 26 ms one-shot at S=729 on v5e).
    Elsewhere: dense XLA (the interpret-mode kernel is too slow for the
    CPU parity suites; kernel numerics are covered by
    tests/test_short_attention.py and validated on-chip).

    mesh: required under pjit/GSPMD when the view/head dims are sharded
    (sharded stage-2 training) — Mosaic kernels cannot be
    auto-partitioned, so the call is shard_mapped with views on
    `batch_axes` and heads on tp (matching the siglip qkv projections'
    sharding in parallel/sharding.py); attention is independent per
    (view, head), so the wrap is exact."""
    if jax.default_backend() == "tpu" and k.shape[1] <= 4096:
        if mesh is not None and mesh.devices.size > 1:
            from jax.sharding import PartitionSpec as P

            axes = tuple(a for a in batch_axes if a in mesh.axis_names)
            head = "tp" if "tp" in mesh.axis_names else None
            spec = P(axes, None, head, None)

            def fn(q, k, v):
                return flash_attention(q, k, v, None, None)

            try:  # jax >= 0.8 top-level API (check_rep -> check_vma)
                wrapped = jax.shard_map(fn, mesh=mesh, in_specs=(spec,) * 3,
                                        out_specs=spec, check_vma=False)
            except (AttributeError, TypeError):  # pragma: no cover
                from jax.experimental.shard_map import shard_map

                wrapped = shard_map(fn, mesh=mesh, in_specs=(spec,) * 3,
                                    out_specs=spec, check_rep=False)
            return wrapped(q, k, v)
        return flash_attention(q, k, v, None, None)
    return dense_attention(q, k, v)


def blockwise_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_valid: jax.Array | None = None,        # [B, S] bool
    prefix_lengths: jax.Array | None = None,  # [B]
    q_positions: jax.Array | None = None,     # [T] absolute
    scale: float | None = None,
    kv_block: int = 1024,
) -> jax.Array:
    """Memory-bounded attention: online-softmax accumulation over KV blocks
    (flash-attention's algorithm in pure XLA, scan over key blocks).

    Exists for LONG-sequence training: the reference trains at up to 30720
    tokens (llava_llada.py:195-203) where dense scores ([H, T, T] f32) are
    3.8GB/layer; this keeps peak at O(T x kv_block).  The prefix-LM block
    mask and key-padding mask are computed per KV block inside the scan —
    nothing O(T x S) is ever materialized.  Differentiable; remat-friendly.

    Shapes as dense_attention: q [B,T,Hq,hd]; k,v [B,S,Hkv,hd].
    """
    B, T, Hq, hd = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv
    if scale is None:
        scale = 1.0 / (hd**0.5)
    if q_positions is None:
        q_positions = jnp.arange(T, dtype=jnp.int32)
    nb = -(-S // kv_block)
    Sp = nb * kv_block
    pad = Sp - S
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    valid = jnp.ones((B, Sp), bool) if kv_valid is None else jnp.pad(
        kv_valid, ((0, 0), (0, pad))
    )
    if pad:
        valid = valid & (jnp.arange(Sp) < S)[None]

    qg = q.reshape(B, T, Hkv, G, hd)
    kb = k.reshape(B, nb, kv_block, Hkv, hd).transpose(1, 0, 2, 3, 4)
    vb = v.reshape(B, nb, kv_block, Hkv, hd).transpose(1, 0, 2, 3, 4)
    validb = valid.reshape(B, nb, kv_block).transpose(1, 0, 2)
    starts = jnp.arange(nb, dtype=jnp.int32) * kv_block

    def step(carry, xs):
        m, l, acc = carry
        kblk, vblk, vld, start = xs
        s = jnp.einsum("bthgd,bshd->bhgts", qg, kblk,
                       preferred_element_type=jnp.float32) * scale
        # per-block mask: padding + prefix-LM (allowed = kv in prefix
        # OR q in suffix) — O(T x kv_block) only
        allowed = vld[:, None, :]                       # [B, 1, blk]
        if prefix_lengths is not None:
            kv_pos = start + jnp.arange(kv_block, dtype=jnp.int32)
            pl = prefix_lengths[:, None, None].astype(jnp.int32)
            a2 = (kv_pos[None, None, :] < pl) | (
                q_positions[None, :, None] >= pl
            )                                           # [B, T, blk]
            allowed = allowed & a2
        else:
            allowed = jnp.broadcast_to(allowed, (B, T, kv_block))
        s = jnp.where(allowed[:, None, None], s, NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l = l * alpha + p.sum(axis=-1)
        pv = jnp.einsum("bhgts,bshd->bthgd", p.astype(vblk.dtype), vblk,
                        preferred_element_type=jnp.float32)
        acc = acc * alpha.transpose(0, 3, 1, 2)[..., None] + pv
        return (m_new, l, acc), None

    m0 = jnp.full((B, Hkv, G, T), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, Hkv, G, T), jnp.float32)
    a0 = jnp.zeros((B, T, Hkv, G, hd), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(step, (m0, l0, a0),
                                  (kb, vb, validb, starts))
    out = acc / jnp.maximum(l, 1e-30).transpose(0, 3, 1, 2)[..., None]
    return out.reshape(B, T, Hq, hd).astype(q.dtype)


def make_bias(
    kv_valid: jax.Array | None = None,
    prefix_lengths: jax.Array | None = None,
    q_positions: jax.Array | None = None,
    kv_positions: jax.Array | None = None,
) -> jax.Array | None:
    """Assemble the additive attention bias.

    kv_valid: [B, S] bool — key-padding mask (True = attend).
    prefix_lengths: [B] — prefix-LM block mask (modeling_llada.py:1358-1364):
      allowed(q, kv) = (kv_pos < prefix_len) | (q_pos >= prefix_len),
      i.e. everyone sees the prefix; suffix tokens see everything.
    q_positions / kv_positions: [T] / [S] absolute positions (required when
      prefix_lengths is given).
    Returns [B, 1, T, S] f32 bias or None.
    """
    bias = None
    if kv_valid is not None:
        bias = jnp.where(kv_valid[:, None, None, :], 0.0, NEG_INF)
    if prefix_lengths is not None:
        assert q_positions is not None and kv_positions is not None
        pl = prefix_lengths[:, None, None, None].astype(jnp.int32)
        qpos = q_positions.reshape(1, 1, -1, 1)
        kpos = kv_positions.reshape(1, 1, 1, -1)
        allowed = (kpos < pl) | (qpos >= pl)
        b2 = jnp.where(allowed, 0.0, NEG_INF)
        bias = b2 if bias is None else bias + b2
        bias = jnp.maximum(bias, NEG_INF)  # keep finite after summing
    return bias
