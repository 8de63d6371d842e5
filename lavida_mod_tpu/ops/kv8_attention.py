"""Fused decode attention over an int8-quantized KV cache (Pallas).

Decode reads the whole KV cache every denoise step; at the 8B serving
shapes (S=1088, H=32, hd=128, 32 layers) that is ~570 MB/step of bf16
K/V — second only to the weight reads in the step's HBM budget
(NOTES_ROUND3.md).  This kernel halves it and removes the intermediate
score/softmax materializations XLA's dense path makes:

  - K/V live in HBM as int8 with per-(head, position) f32 scales
    ([B, H, S, hd] int8 + [B, H, 1, S] f32 — head-major so each grid
    step streams one head's cache contiguously);
  - scores = (q @ k8^T) * k_scale * sm_scale: the int8->bf16 convert
    happens in VMEM (int8 in [-127,127] is exact in bf16), the
    per-position k scale folds into the f32 score columns;
  - softmax in f32 in-kernel; the v scale folds into p before the AV
    dot, so the output needs no epilogue.

Quantization error is the standard per-head-per-token symmetric int8 KV
(~0.4% rms on k/v rows); parity vs the bf16 dense path is tested and the
serving default keeps the quality gate of scripts/verify_checkpoint.py.

Reference hot loop being replaced: modeling_llada.py:712-787 (torch SDPA
over a bf16 cache re-concatenated per step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# interpret-mode toggle for CPU tests
_INTERPRET = [False]


def quantize_kv(x: jax.Array, bits: int = 8) -> tuple[jax.Array, jax.Array]:
    """[B, S, H, hd] float -> ([B, H, S, hd] int8/int4, [B, H, 1, S] f32).

    Per-(b, h, s) symmetric scale; head-major layout for the kernel.
    bits=4: native jnp.int4 storage (XLA S4 packs 2/byte on TPU HBM —
    quarter the bf16 cache traffic; ~3% rms row error vs int8's ~0.4%,
    quality-gate per checkpoint with verify_checkpoint --kv4-check)."""
    assert bits in (8, 4), bits
    xt = x.transpose(0, 2, 1, 3)                       # [B, H, S, hd]
    xf = xt.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    qmax = 127.0 if bits == 8 else 7.0
    scale = jnp.maximum(amax, 1e-8) / qmax
    q = jnp.clip(jnp.round(xf / scale), -qmax, qmax).astype(
        jnp.int8 if bits == 8 else jnp.int4)
    return q, scale[..., 0][:, :, None, :]             # [B, H, 1, S]


def dequantize_kv(q: jax.Array, scale: jax.Array) -> jax.Array:
    """Inverse of quantize_kv -> [B, S, H, hd] f32 (test oracle)."""
    x = q.astype(jnp.float32) * scale[:, :, 0, :, None]
    return x.transpose(0, 2, 1, 3)


def _kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, valid_ref, o_ref,
            *, scale, T, S, hd, G):
    # one grid step handles a GROUP of KV heads: per-head grid steps are
    # overhead-bound at decode sizes (measured 8.6 us/step vs ~0.3 us of
    # DMA).  The head loop unrolls to 2D dots — Mosaic's batched 3D
    # dot_general faulted on-device.  GQA: each KV head serves G query
    # heads (query heads arrive grouped: q head j*G+g shares KV head j).
    hg = k_ref.shape[1]
    valid = valid_ref[0, 0] != 0                       # [S]
    for h in range(hg):
        k8 = k_ref[0, h].astype(jnp.bfloat16)          # [S, hd]
        v8 = v_ref[0, h].astype(jnp.bfloat16)
        kcol = ks_ref[0, h, 0][None, :] * scale
        vcol = vs_ref[0, h, 0][None, :]
        for g in range(G):
            q = q_ref[0, h * G + g]                    # [T, hd] bf16
            s = jax.lax.dot_general(
                q, k8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                          # [T, S]
            s = s * kcol
            s = jnp.where(valid[None, :], s, NEG_INF)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            pv = (p * vcol).astype(jnp.bfloat16)
            o_ref[0, h * G + g] = jax.lax.dot_general(
                pv, v8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def kv8_decode_attention(
    q: jax.Array,          # [B, T, H, hd] bf16 (T = gen length, small)
    k8: jax.Array,         # [B, H, S, hd] int8
    ks: jax.Array,         # [B, H, 1, S] f32
    v8: jax.Array,         # [B, H, S, hd] int8
    vs: jax.Array,         # [B, H, 1, S] f32
    kv_valid: jax.Array | None = None,   # [B, S] bool
) -> jax.Array:
    """Softmax(q k^T * scale) v over the quantized cache -> [B,T,H,hd].

    GQA-native: Hq may be a multiple of Hkv (query head j*G+g reads KV
    head j, the standard grouped order).  The whole per-KV-head cache is
    one VMEM block (S=1088, hd=128 -> 2x136 KB int8), so no online
    softmax is needed."""
    B, T, H, hd = q.shape
    Hkv, S = k8.shape[1], k8.shape[2]
    assert H % Hkv == 0, (H, Hkv)
    G = H // Hkv
    scale = 1.0 / (hd ** 0.5)
    if kv_valid is None:
        valid = jnp.ones((B, 1, S), jnp.int32)
    else:
        valid = kv_valid.astype(jnp.int32)[:, None, :]

    # head-group size: as many KV heads per grid step as fit VMEM
    # (K+V int8 + f32 scores per query head; 8 MHA heads ~ 3.6 MB at
    # S=1088).  Bound hg*G so the q/out blocks stay small too.
    # All supported geometries have G <= 16 (LLaDA MHA G=1, Dream/Qwen2
    # GQA G=4..7); beyond that even hg=1 exceeds the documented q/out
    # VMEM bound, so refuse loudly rather than silently blow VMEM.
    assert G <= 16, f"GQA group size {G} > 16 unsupported by kv8 kernel"
    hg = next((g for g in (8, 4, 2, 1) if Hkv % g == 0 and g * G <= 16),
              1)

    qt = q.transpose(0, 2, 1, 3)                       # [B, H, T, hd]
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, T=T, S=S, hd=hd, G=G),
        grid=(B, Hkv // hg),
        in_specs=[
            pl.BlockSpec((1, hg * G, T, hd), lambda b, g: (b, g, 0, 0)),
            pl.BlockSpec((1, hg, S, hd), lambda b, g: (b, g, 0, 0)),
            pl.BlockSpec((1, hg, 1, S), lambda b, g: (b, g, 0, 0)),
            pl.BlockSpec((1, hg, S, hd), lambda b, g: (b, g, 0, 0)),
            pl.BlockSpec((1, hg, 1, S), lambda b, g: (b, g, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, g: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hg * G, T, hd),
                               lambda b, g: (b, g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, T, hd), q.dtype),
        interpret=_INTERPRET[0],
    )(qt, k8, ks, v8, vs, valid)
    return out.transpose(0, 2, 1, 3)


def write_rows(k8, ks, v8, vs, k_new, v_new, index):
    """Quantize this step's K/V rows and write them into the cache at
    [index, index+T): k_new/v_new [B, T, H, hd], traced `index` ok.
    Quantization width follows the cache dtype (int8 or int4)."""
    bits = 4 if k8.dtype == jnp.int4 else 8
    nk8, nks = quantize_kv(k_new, bits)
    nv8, nvs = quantize_kv(v_new, bits)
    k8 = jax.lax.dynamic_update_slice(k8, nk8, (0, 0, index, 0))
    v8 = jax.lax.dynamic_update_slice(v8, nv8, (0, 0, index, 0))
    ks = jax.lax.dynamic_update_slice(ks, nks, (0, 0, 0, index))
    vs = jax.lax.dynamic_update_slice(vs, nvs, (0, 0, 0, index))
    return k8, ks, v8, vs
