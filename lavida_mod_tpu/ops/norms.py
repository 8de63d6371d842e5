"""Normalization ops, matching the reference's precision boundaries.

RMSNorm computes the variance in float32 then casts back before the affine
(modeling_llada.py:339-353); LayerNorm is standard; Gemma-RMS applies
(1 + weight) (modeling_llada.py:370-384).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array | None, eps: float = 1e-5,
             bias: jax.Array | None = None, gemma: bool = False) -> jax.Array:
    og_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    x = xf.astype(og_dtype)
    if weight is not None:
        w = (1.0 + weight) if gemma else weight
        x = x * w
        if bias is not None:
            x = x + bias
    return x


def layer_norm(x: jax.Array, weight: jax.Array | None, bias: jax.Array | None,
               eps: float = 1e-5) -> jax.Array:
    og_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    x = xf.astype(og_dtype)
    if weight is not None:
        x = x * weight
    if bias is not None:
        x = x + bias
    return x


def apply_norm(x: jax.Array, params: dict | None, norm_type: str, *,
               rms_eps: float = 1e-5, ln_eps: float = 1e-5) -> jax.Array:
    """Dispatch on LayerNormType (configuration_llada.py:51-77)."""
    w = params.get("weight") if params else None
    b = params.get("bias") if params else None
    if norm_type == "rms":
        return rms_norm(x, w, rms_eps, bias=b)
    if norm_type == "gemma_rms":
        return rms_norm(x, w, rms_eps, bias=b, gemma=True)
    if norm_type in ("default", "low_precision"):
        return layer_norm(x, w, b, ln_eps)
    raise NotImplementedError(norm_type)
