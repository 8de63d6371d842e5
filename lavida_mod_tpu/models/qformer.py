"""Q-Former resampler: BLIP-2-style BERT with cross-attention, functional.

Parity target: reference llava/model/multimodal_resampler/qformer.py
(1160 LoC vendored BLIP-2 BERT).  As configured there
(qformer.py:1102-1133):

  - bert-base geometry (hidden 768, 12 layers, 12 heads, intermediate
    3072, post-LN, eps 1e-12), word/position embeddings removed — the
    input is the learned query bank [num_query_token, 768] run through the
    embeddings LayerNorm;
  - cross-attention to `ln_vision`-normalized image features inserted at
    every layer with layer_num % cross_attention_freq == 0 (NOTE the
    reference passes `mm_qformer_depth` as cross_attention_freq, not as a
    layer count — preserved here);
  - query positions use the dedicated intermediate_query/output_query FFN
    (qformer.py:354-436 query path).

Weights convert 1:1 from the torch module (convert_qformer_state_dict);
output parity is tested against the vendored implementation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

Params = dict


@dataclass(frozen=True)
class QformerConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-12
    encoder_width: int = 1152          # vision feature dim
    num_query_tokens: int = 32
    cross_attention_freq: int = 2


def _ln(x, p, eps):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + eps) * p["weight"] + p["bias"]


def _lin(x, p):
    return x @ p["kernel"] + p["bias"]


def init_params(cfg: QformerConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    W = cfg.encoder_width
    ks = iter(jax.random.split(key, 8 * L + 8))

    def lin(i, o, std=0.02):
        return {"kernel": (jax.random.normal(next(ks), (i, o)) * std).astype(dtype),
                "bias": jnp.zeros((o,), dtype)}

    def ln():
        return {"weight": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)}

    layers = []
    for li in range(L):
        lp = {
            "self": {"q": lin(D, D), "k": lin(D, D), "v": lin(D, D),
                     "out": lin(D, D), "ln": ln()},
            "ffn_q": {"fc1": lin(D, I), "fc2": lin(I, D), "ln": ln()},
        }
        if li % cfg.cross_attention_freq == 0:
            lp["cross"] = {"q": lin(D, D), "k": lin(W, D), "v": lin(W, D),
                           "out": lin(D, D), "ln": ln()}
        layers.append(lp)
    return {
        "query_tokens": (jax.random.normal(next(ks), (cfg.num_query_tokens, D))
                         * 0.02).astype(dtype),
        "emb_ln": ln(),
        "ln_vision": {"weight": jnp.ones((W,), dtype),
                      "bias": jnp.zeros((W,), dtype)},
        "layers": layers,
    }


def _attention(x_q, x_kv, p, nh, eps):
    B, Tq, D = x_q.shape
    hd = D // nh
    q = _lin(x_q, p["q"]).reshape(B, Tq, nh, hd)
    k = _lin(x_kv, p["k"]).reshape(B, x_kv.shape[1], nh, hd)
    v = _lin(x_kv, p["v"]).reshape(B, x_kv.shape[1], nh, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(hd)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, Tq, D)
    # post-LN BertSelfOutput (qformer.py:246-251)
    return _ln(_lin(ctx, p["out"]) + x_q, p["ln"], eps)


def apply(params: Params, cfg: QformerConfig,
          image_features: jax.Array) -> jax.Array:
    """[B, N, W] image features -> [B, num_query_tokens, hidden] queries."""
    eps = cfg.layer_norm_eps
    feats = _ln(image_features,
                {"weight": params["ln_vision"]["weight"],
                 "bias": params["ln_vision"]["bias"]}, 1e-5)
    B = feats.shape[0]
    x = jnp.broadcast_to(params["query_tokens"][None],
                         (B,) + params["query_tokens"].shape)
    x = _ln(x, params["emb_ln"], eps)  # BertEmbeddings LN on query input
    for lp in params["layers"]:
        x = _attention(x, x, lp["self"], cfg.num_attention_heads, eps)
        if "cross" in lp:
            x = _attention(x, feats, lp["cross"], cfg.num_attention_heads,
                           eps)
        # query FFN path (intermediate_query/output_query)
        z = jax.nn.gelu(_lin(x, lp["ffn_q"]["fc1"]), approximate=False)
        x = _ln(_lin(z, lp["ffn_q"]["fc2"]) + x, lp["ffn_q"]["ln"], eps)
    return x


def convert_qformer_state_dict(
    state: dict[str, np.ndarray], cfg: QformerConfig, dtype=jnp.float32,
) -> Params:
    """torch Qformer module state dict -> our params."""
    def g(name):
        return np.asarray(state[name])

    def lin(base):
        return {"kernel": jnp.asarray(g(base + ".weight").T, dtype),
                "bias": jnp.asarray(g(base + ".bias"), dtype)}

    def ln(base):
        return {"weight": jnp.asarray(g(base + ".weight"), dtype),
                "bias": jnp.asarray(g(base + ".bias"), dtype)}

    layers = []
    for li in range(cfg.num_hidden_layers):
        b = f"Qformer.bert.encoder.layer.{li}"
        lp = {
            "self": {
                "q": lin(f"{b}.attention.self.query"),
                "k": lin(f"{b}.attention.self.key"),
                "v": lin(f"{b}.attention.self.value"),
                "out": lin(f"{b}.attention.output.dense"),
                "ln": ln(f"{b}.attention.output.LayerNorm"),
            },
            "ffn_q": {
                "fc1": lin(f"{b}.intermediate_query.dense"),
                "fc2": lin(f"{b}.output_query.dense"),
                "ln": ln(f"{b}.output_query.LayerNorm"),
            },
        }
        if li % cfg.cross_attention_freq == 0:
            lp["cross"] = {
                "q": lin(f"{b}.crossattention.self.query"),
                "k": lin(f"{b}.crossattention.self.key"),
                "v": lin(f"{b}.crossattention.self.value"),
                "out": lin(f"{b}.crossattention.output.dense"),
                "ln": ln(f"{b}.crossattention.output.LayerNorm"),
            }
        layers.append(lp)
    return {
        "query_tokens": jnp.asarray(g("query_tokens")[0], dtype),
        "emb_ln": ln("Qformer.bert.embeddings.LayerNorm"),
        "ln_vision": ln("ln_vision"),
        "layers": layers,
    }
