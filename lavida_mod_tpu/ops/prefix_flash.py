"""Pallas TPU flash attention with the prefix-LM block mask.

The reference's training path builds a flex-attention block mask from
per-sample prompt lengths (modeling_llada.py:1351-1368: prefix tokens are
bidirectionally visible, suffix tokens see everything) and runs a fused
kernel (:685-710).  The rebuild's dense path materializes that mask as an
additive bias — O(T^2) f32, 3.8 GB/layer at the reference's 30720-token
training lengths (llava_llada.py:195-203) — and `blockwise_attention` is
pure-XLA online softmax.  This module is the TPU-native kernel: the mask
is computed INSIDE the kernel from a per-row scalar (prefetched to SMEM),
so nothing O(T·S) ever touches HBM, and both forward and backward are
single fused Pallas kernels.

mask(b, q, kv) = kv_valid[b, kv] & ((kv < plen[b]) | (q >= plen[b]))

Positions are SEQUENCE indices (not RoPE positions): use_pos_skipping
shifts RoPE without changing visibility (llava_arch.py:894-900), matching
`models/llada.py::forward`'s mask_q_pos convention.

Forward:  grid (B, Hq, Tq/bq, S/bk), online-softmax accumulation in VMEM
          scratch across the innermost KV dim; emits o and the logsumexp.
Backward: custom VJP.  dq: same grid, accumulating dq over KV blocks.
          dk/dv: grid (B, Hkv, S/bk, G, Tq/bq) — the kv-block output is
          constant over the two innermost dims, so GQA head groups and
          q blocks accumulate in scratch without races.

GQA is native (kv head = q head // group) — no repeated K/V materialize.
Parity vs make_bias+dense_attention is tested in interpret mode
(tests/test_prefix_flash.py) and the kernel is wired into training via
models/llada.py (attention_impl="prefix_flash").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _mask_block(plen, qvec, kvec, kvalid):
    """[bq, bk] bool visibility for one (q-block, kv-block) pair.
    qvec: [bq, 1] int32 sequence indices; kvec: [1, bk]; kvalid: [1, bk]
    bool; plen: scalar int32."""
    allowed = (kvec < plen) | (qvec >= plen)
    return allowed & kvalid


def _fwd_kernel(plen_ref, q_ref, k_ref, v_ref, kval_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, scale, bq, bk, n_kv):
    kj = pl.program_id(3)

    @pl.when(kj == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    b = pl.program_id(0)
    plen = plen_ref[b]
    q = q_ref[0, 0]                       # [bq, hd]
    k = k_ref[0, 0]                       # [bk, hd]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                             # [bq, bk]

    qpos = (pl.program_id(2) * bq
            + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0))
    kpos = kj * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    kvalid = kval_ref[0, 0] != 0          # [bk]
    mask = _mask_block(plen, qpos, kpos, kvalid[None, :])
    s = jnp.where(mask, s, NEG_INF)

    # m/l scratch are [bq, 128] lane-replicated (Mosaic wants 128-lane
    # tiles; same layout as the shipped flash kernel's m/l_scratch)
    m_prev = m_scr[...]                   # [bq, 128]
    m_cur = jnp.max(s, axis=1, keepdims=True)   # [bq, 1]
    m_new = jnp.maximum(m_prev, m_cur)          # [bq, 128]
    # guard: fully-masked-so-far rows keep exp(NEG_INF - NEG_INF) sane
    alpha = jnp.exp(jnp.minimum(m_prev - m_new, 0.0))
    p = jnp.exp(s - m_new[:, :1])         # masked entries -> exp(-inf)=0
    l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha[:, :1] + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    m_scr[...] = m_new

    @pl.when(kj == n_kv - 1)
    def _():
        l = l_scr[...]
        o_ref[0, 0] = (acc_scr[...] / jnp.maximum(l[:, :1], 1e-30)).astype(
            o_ref.dtype)
        lse_ref[0, 0, 0] = (m_scr[...]
                         + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]


def _fwd(q, k, v, plen, kvalid, *, scale, bq, bk):
    B, Hq, T, hd = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    G = Hq // Hkv
    n_q, n_kv = T // bq, S // bk

    kernel = functools.partial(
        _fwd_kernel, scale=scale, bq=bq, bk=bk, n_kv=n_kv)
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Hq, n_q, n_kv),
            in_specs=[
                pl.BlockSpec((1, 1, bq, hd), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, bk, hd),
                             lambda b, h, i, j, *_: (b, h // G, j, 0)),
                pl.BlockSpec((1, 1, bk, hd),
                             lambda b, h, i, j, *_: (b, h // G, j, 0)),
                pl.BlockSpec((1, 1, bk), lambda b, h, i, j, *_: (b, 0, j)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, bq, hd), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, 1, bq), lambda b, h, i, j, *_: (b, h, 0, i)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, hd), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((B, Hq, 1, T), jnp.float32),
        ],
        interpret=_INTERPRET[0],
    )(plen, q, k, v, kvalid)
    return o, lse


def _dq_kernel(plen_ref, q_ref, k_ref, v_ref, kval_ref, do_ref, lse_ref,
               delta_ref, dq_ref, dq_scr, *, scale, bq, bk, n_kv):
    kj = pl.program_id(3)

    @pl.when(kj == 0)
    def _():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    b = pl.program_id(0)
    plen = plen_ref[b]
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    qpos = (pl.program_id(2) * bq
            + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0))
    kpos = kj * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    kvalid = kval_ref[0, 0] != 0
    mask = _mask_block(plen, qpos, kpos, kvalid[None, :])
    p = jnp.where(mask, jnp.exp(s - lse_ref[0, 0, 0][:, None]), 0.0)

    do = do_ref[0, 0].astype(jnp.float32)
    dp = jax.lax.dot_general(
        do.astype(v_ref.dtype), v_ref[0, 0],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, 0, 0][:, None])
    dq_scr[...] += scale * jax.lax.dot_general(
        ds.astype(k.dtype), k,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(kj == n_kv - 1)
    def _():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _dkv_kernel(plen_ref, q_ref, k_ref, v_ref, kval_ref, do_ref, lse_ref,
                delta_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                *, scale, bq, bk, n_q, n_g):
    g, qi = pl.program_id(3), pl.program_id(4)

    @pl.when((g == 0) & (qi == 0))
    def _():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    b = pl.program_id(0)
    plen = plen_ref[b]
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    qpos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    kpos = (pl.program_id(2) * bk
            + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1))
    kvalid = kval_ref[0, 0] != 0
    mask = _mask_block(plen, qpos, kpos, kvalid[None, :])
    p = jnp.where(mask, jnp.exp(s - lse_ref[0, 0, 0][:, None]), 0.0)

    do = do_ref[0, 0].astype(jnp.float32)
    dv_scr[...] += jax.lax.dot_general(
        p.astype(do_ref.dtype), do_ref[0, 0],
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do.astype(v_ref.dtype), v_ref[0, 0],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, 0, 0][:, None])
    dk_scr[...] += scale * jax.lax.dot_general(
        ds.astype(q.dtype), q,
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when((g == n_g - 1) & (qi == n_q - 1))
    def _():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_pallas(q, k, v, plen, kvalid, o, lse, do, *, scale, bq, bk):
    B, Hq, T, hd = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    G = Hq // Hkv
    n_q, n_kv = T // bq, S // bk
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)[:, :, None, :]  # [B, Hq, 1, T]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, bq=bq, bk=bk, n_kv=n_kv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Hq, n_q, n_kv),
            in_specs=[
                pl.BlockSpec((1, 1, bq, hd), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, bk, hd),
                             lambda b, h, i, j, *_: (b, h // G, j, 0)),
                pl.BlockSpec((1, 1, bk, hd),
                             lambda b, h, i, j, *_: (b, h // G, j, 0)),
                pl.BlockSpec((1, 1, bk), lambda b, h, i, j, *_: (b, 0, j)),
                pl.BlockSpec((1, 1, bq, hd), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, 1, bq), lambda b, h, i, j, *_: (b, h, 0, i)),
                pl.BlockSpec((1, 1, 1, bq), lambda b, h, i, j, *_: (b, h, 0, i)),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, hd),
                                   lambda b, h, i, j, *_: (b, h, i, 0)),
            scratch_shapes=[pltpu.VMEM((bq, hd), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_INTERPRET[0],
    )(plen, q, k, v, kvalid, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, bq=bq, bk=bk,
                          n_q=n_q, n_g=G),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Hkv, n_kv, G, n_q),
            in_specs=[
                pl.BlockSpec((1, 1, bq, hd),
                             lambda b, hk, j, g, i, *_: (b, hk * G + g, i, 0)),
                pl.BlockSpec((1, 1, bk, hd),
                             lambda b, hk, j, g, i, *_: (b, hk, j, 0)),
                pl.BlockSpec((1, 1, bk, hd),
                             lambda b, hk, j, g, i, *_: (b, hk, j, 0)),
                pl.BlockSpec((1, 1, bk), lambda b, hk, j, g, i, *_: (b, 0, j)),
                pl.BlockSpec((1, 1, bq, hd),
                             lambda b, hk, j, g, i, *_: (b, hk * G + g, i, 0)),
                pl.BlockSpec((1, 1, 1, bq),
                             lambda b, hk, j, g, i, *_: (b, hk * G + g, 0, i)),
                pl.BlockSpec((1, 1, 1, bq),
                             lambda b, hk, j, g, i, *_: (b, hk * G + g, 0, i)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, bk, hd),
                             lambda b, hk, j, g, i, *_: (b, hk, j, 0)),
                pl.BlockSpec((1, 1, bk, hd),
                             lambda b, hk, j, g, i, *_: (b, hk, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bk, hd), jnp.float32),
                pltpu.VMEM((bk, hd), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        interpret=_INTERPRET[0],
    )(plen, q, k, v, kvalid, do, lse, delta)
    return dq, dk, dv


# interpret-mode toggle for CPU tests (list so tests can flip it)
_INTERPRET = [False]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _prefix_flash_core(q, k, v, plen, kvalid, scale, bq, bk):
    o, _ = _fwd(q, k, v, plen, kvalid, scale=scale, bq=bq, bk=bk)
    return o


def _core_fwd(q, k, v, plen, kvalid, scale, bq, bk):
    o, lse = _fwd(q, k, v, plen, kvalid, scale=scale, bq=bq, bk=bk)
    return o, (q, k, v, plen, kvalid, o, lse)


def _core_bwd(scale, bq, bk, res, do):
    q, k, v, plen, kvalid, o, lse = res
    dq, dk, dv = _bwd_pallas(q, k, v, plen, kvalid, o, lse, do,
                             scale=scale, bq=bq, bk=bk)
    return dq, dk, dv, None, None


_prefix_flash_core.defvjp(_core_fwd, _core_bwd)


def prefix_flash_attention(
    q: jax.Array,                 # [B, T, Hq, hd]
    k: jax.Array,                 # [B, S, Hkv, hd]
    v: jax.Array,                 # [B, S, Hkv, hd]
    prefix_lengths: jax.Array,    # [B] int32 (0 => fully bidirectional)
    kv_valid: jax.Array | None = None,   # [B, S] bool
    *,
    scale: float | None = None,
    block_q: int = 512,
    block_k: int = 512,
    mesh=None,
    batch_axes: tuple = ("dp", "fsdp"),
    head_axis: str = "tp",
) -> jax.Array:
    """Fused prefix-LM flash attention; shapes as `dense_attention`.

    T and S are padded to the block size internally (pad kv rows masked
    via kv_valid; pad q rows sliced off).  Differentiable (custom VJP).

    mesh: required under pjit/GSPMD — Mosaic kernels cannot be
    auto-partitioned, so the call is wrapped in a shard_map with the
    batch dim on `batch_axes` and heads on `head_axis` (matching the
    qkv projections' tp sharding in parallel/sharding.py).  None = the
    single-device path.
    """
    B, T, Hq, hd = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    assert Hq % Hkv == 0
    if scale is None:
        scale = 1.0 / (hd ** 0.5)
    bq = min(block_q, -(-T // 128) * 128)
    bk = min(block_k, -(-S // 128) * 128)
    Tp = -(-T // bq) * bq
    Sp = -(-S // bk) * bk
    if kv_valid is None:
        kv_valid = jnp.ones((B, S), bool)
    if Tp != T:
        q = jnp.pad(q, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
    if Sp != S:
        k = jnp.pad(k, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, Sp - S)))

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    plen32 = prefix_lengths.astype(jnp.int32)
    kval32 = kv_valid.astype(jnp.int32)[:, None, :]

    if mesh is None:
        o = _prefix_flash_core(qt, kt, vt, plen32, kval32, scale, bq, bk)
        return o.transpose(0, 2, 1, 3)[:, :T]

    from jax.sharding import PartitionSpec as P

    batch = tuple(a for a in batch_axes if a in mesh.axis_names)
    head = head_axis if head_axis in mesh.axis_names else None
    qkv_spec = P(batch, head, None, None)     # [B, H, T, hd]
    fn = lambda a, b, c, d, e: _prefix_flash_core(a, b, c, d, e,
                                                  scale, bq, bk)
    in_specs = (qkv_spec, qkv_spec, qkv_spec, P(batch), P(batch, None, None))
    try:  # jax >= 0.8 top-level API (check_rep was renamed check_vma)
        wrapped = jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                                out_specs=qkv_spec, check_vma=False)
    except (AttributeError, TypeError):  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

        wrapped = shard_map(fn, mesh=mesh, in_specs=in_specs,
                            out_specs=qkv_spec, check_rep=False)
    o = wrapped(qt, kt, vt, plen32, kval32)
    return o.transpose(0, 2, 1, 3)[:, :T]
