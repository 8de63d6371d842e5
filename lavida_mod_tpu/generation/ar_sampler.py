"""Autoregressive sampler — the legacy AR-LLaVA baseline path.

The reference keeps LLaVA-NeXT's AR model zoo (llava_llama/qwen/mistral/
mixtral, SURVEY.md §2.1) whose generation is HF `model.generate`.  Here:
one fused executable — causal prefill into a fixed-size KV buffer, then a
`lax.scan` greedy/temperature decode writing one token per step via
`kv_write_index` (no concat, no retrace).  EOS handling: rows that emitted
eos keep emitting pad (masked), matching HF early-stop semantics for
batch decoding.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import LLaDAConfig
from ..models import llada as llada_model


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "temperature", "top_k"),
)
def ar_generate_fused(
    params,
    cfg: LLaDAConfig,
    prefix_embeds: jax.Array,      # [B, P, D]
    key: jax.Array,
    max_new_tokens: int,
    temperature: float = 0.0,
    top_k: Optional[int] = None,
    eos_id: Optional[int] = None,
):
    B, P, D = prefix_embeds.shape
    G = max_new_tokens
    Smax = P + G
    eos = cfg.eos_token_id if eos_id is None else eos_id

    # causal prefill -> cache, then pad buffers to Smax
    logits_last, cache = llada_model.forward(
        params, cfg, prefix_embeds, causal=True, use_cache=True,
        last_logits_only=True,
    )
    if isinstance(params["blocks"], (list, tuple)):
        # unrolled serving layout: forward returns (and expects) a
        # per-layer list cache on the write-index decode path
        pw = ((0, 0), (0, G), (0, 0), (0, 0))
        cache = [
            (jnp.pad(cache["k"][li], pw), jnp.pad(cache["v"][li], pw))
            for li in range(cache["k"].shape[0])
        ]
    else:
        pad_width = ((0, 0), (0, 0), (0, G), (0, 0), (0, 0))
        cache = {
            "k": jnp.pad(cache["k"], pad_width),
            "v": jnp.pad(cache["v"], pad_width),
        }

    def sample(logits, k):
        logits = logits.astype(jnp.float32)
        if temperature == 0.0:
            return jnp.argmax(logits, axis=-1)
        logits = logits / temperature
        if top_k is not None:
            kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
            logits = jnp.where(logits < kth, -1e30, logits)
        return jax.random.categorical(k, logits, axis=-1)

    first = sample(logits_last[:, -1], key).astype(jnp.int32)   # [B]

    def step(carry, i):
        tok, cache, finished, key = carry
        key, sk = jax.random.split(key)
        emb = llada_model.embed_tokens(params, tok[:, None])
        logits, cache = llada_model.forward(
            params, cfg, emb, kv_cache=cache, kv_write_index=P + i,
            use_cache=True, causal=True,
        )
        nxt = sample(logits[:, -1], sk).astype(jnp.int32)
        nxt = jnp.where(finished, eos, nxt)
        finished = finished | (nxt == eos)
        return (nxt, cache, finished, key), tok

    finished = first == eos
    (last, _, _, _), toks = jax.lax.scan(
        step, (first, cache, finished, key), jnp.arange(G - 1)
    )
    out = jnp.concatenate([toks.T, last[:, None]], axis=1)  # [B, G]
    return out
