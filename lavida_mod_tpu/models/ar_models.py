"""AR baseline model configs (legacy LLaVA families, SURVEY.md §2.1).

The reference keeps LLaVA-NeXT's autoregressive wrappers (llava_llama,
llava_qwen, llava_mistral, llava_mixtral).  All of these are llama-layout
transformers our shared core already executes with `causal=True`; the HF
checkpoint naming is identical to Dream's (Qwen2) converter, which handles
optional qkv bias — so the conversion is shared.

Usage: cfg = llama3_8b_config(); params = convert_ar_state_dict(state, cfg);
ar_generate_fused(params, cfg, prefix_embeds, ...).
"""

from __future__ import annotations

from ..config import LLaDAConfig
from .dream import convert_dream_state_dict as convert_ar_state_dict  # noqa: F401


def llama3_8b_config(**kw) -> LLaDAConfig:
    base = dict(
        d_model=4096, n_heads=32, n_kv_heads=8, n_layers=32,
        mlp_hidden_size=14336, block_type="llama", activation="silu",
        rope_theta=500000.0, layer_norm_type="rms", rms_norm_eps=1e-5,
        include_qkv_bias=False, vocab_size=128256, embedding_size=128256,
        weight_tying=False, max_sequence_length=8192,
        mask_token_id=128255, eos_token_id=128009, pad_token_id=128009,
    )
    base.update(kw)
    return LLaDAConfig(**base)


def qwen2_7b_config(**kw) -> LLaDAConfig:
    base = dict(
        d_model=3584, n_heads=28, n_kv_heads=4, n_layers=28,
        mlp_hidden_size=18944, block_type="llama", activation="silu",
        rope_theta=1000000.0, layer_norm_type="rms", rms_norm_eps=1e-6,
        include_qkv_bias=True, vocab_size=152064, embedding_size=152064,
        weight_tying=False, max_sequence_length=32768,
        mask_token_id=151666, eos_token_id=151645, pad_token_id=151643,
    )
    base.update(kw)
    return LLaDAConfig(**base)


def mistral_7b_config(**kw) -> LLaDAConfig:
    base = dict(
        d_model=4096, n_heads=32, n_kv_heads=8, n_layers=32,
        mlp_hidden_size=14336, block_type="llama", activation="silu",
        rope_theta=1000000.0, layer_norm_type="rms", rms_norm_eps=1e-5,
        include_qkv_bias=False, vocab_size=32768, embedding_size=32768,
        weight_tying=False, max_sequence_length=32768,
        mask_token_id=32767, eos_token_id=2, pad_token_id=2,
    )
    base.update(kw)
    return LLaDAConfig(**base)


def mixtral_8x7b_config(**kw) -> LLaDAConfig:
    """Mixtral-8x7B geometry; blocks carry a "moe" params entry (moe.py)."""
    base = dict(
        d_model=4096, n_heads=32, n_kv_heads=8, n_layers=32,
        mlp_hidden_size=14336, block_type="llama", activation="silu",
        rope_theta=1000000.0, layer_norm_type="rms", rms_norm_eps=1e-5,
        include_qkv_bias=False, vocab_size=32000, embedding_size=32000,
        weight_tying=False, max_sequence_length=32768,
        mask_token_id=31999, eos_token_id=2, pad_token_id=2,
    )
    base.update(kw)
    return LLaDAConfig(**base)


def convert_mixtral_moe_layer(state, layer_idx: int, n_experts: int = 8,
                              dtype=None, prefix: str = "model."):
    """HF mixtral naming -> our moe params for one layer:
    block_sparse_moe.gate.weight + experts.N.{w1,w2,w3}.weight
    (w1=gate/ff_proj, w3=up, w2=down/ff_out)."""
    import numpy as np

    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.bfloat16

    def get(name):
        for cand in (prefix + name, name):
            if cand in state:
                return np.asarray(state[cand])
        raise KeyError(name)

    lp = f"layers.{layer_idx}.block_sparse_moe."
    experts = {"ff_proj": [], "up_proj": [], "ff_out": []}
    for e in range(n_experts):
        experts["ff_proj"].append(get(f"{lp}experts.{e}.w1.weight").T)
        experts["up_proj"].append(get(f"{lp}experts.{e}.w3.weight").T)
        experts["ff_out"].append(get(f"{lp}experts.{e}.w2.weight").T)
    return {
        "router": {"kernel": jnp.asarray(get(f"{lp}gate.weight").T, dtype)},
        "experts": {
            k: {"kernel": jnp.asarray(np.stack(v), dtype)}
            for k, v in experts.items()
        },
    }
