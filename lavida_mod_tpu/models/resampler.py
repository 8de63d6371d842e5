"""Vision resamplers (reference llava/model/multimodal_resampler/*).

LaViDa ships with the identity resampler; the alternates are kept for
capability parity, re-expressed functionally:

  identity      IdentityMap (builder default)
  masked_drop   MAE-style random token drop at train time
                (masked_drop.py:7-89: fixed / range / cls_only modes,
                skip probability)
  spatial_pool  stride pooling over the token grid (spatial_pool.py:6-45;
                average / max / conv)
  perceiver     Flamingo-style PerceiverResampler (perceiver.py:30-160):
                learned latents cross-attend to [media; latents], softmax
                with max-subtraction, ff_mult MLP, final LN
  qformer       real BLIP-2 BERT Q-former (models/qformer.py): learned
                query bank through a post-LN BERT with cross-attention
                every cross_attention_freq layers; torch-parity tested
                against the vendored qformer.py
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.norms import layer_norm

Params = dict


# ---------------------------------------------------------------------------
# masked drop
# ---------------------------------------------------------------------------

def masked_drop(
    features: jax.Array,            # [N, T, D]
    key: jax.Array,
    mode: str = "fixed",
    ratio: float = 0.5,
    ratio_upper: float = 0.75,
    ratio_lower: float = 0.25,
    skip_percentage: float = 0.0,
    training: bool = True,
):
    """Random token subset per image (masked_drop.py random_masking)."""
    if not training:
        return features
    N, T, D = features.shape
    ks, kr, kn = jax.random.split(key, 3)
    if skip_percentage > 0 and float(
        jax.random.uniform(ks, ())
    ) < skip_percentage:
        return features
    if mode == "cls_only":
        return features[:, :1]
    if mode == "fixed":
        keep = int(T * ratio)
    elif mode == "range":
        r = float(jax.random.uniform(
            kr, (), minval=ratio_lower, maxval=ratio_upper
        ))
        keep = max(int(T * r), 1)
    else:
        raise ValueError(f"Unexpected masked drop mode: {mode}")
    noise = jax.random.uniform(kn, (N, T))
    ids = jnp.argsort(noise, axis=1)[:, :keep]
    return jnp.take_along_axis(features, ids[..., None], axis=1)


# ---------------------------------------------------------------------------
# spatial pool
# ---------------------------------------------------------------------------

def spatial_pool(features: jax.Array, mode: str = "average",
                 stride: int = 2) -> jax.Array:
    """[N, g*g, D] -> pooled (spatial_pool.py:24-32); conv mode is the
    parameterized pooler projector (models/projector.py "pooler")."""
    from ..ops.pooling import pool_2d

    assert mode in ("average", "max")
    return pool_2d(features, mode, stride)


# ---------------------------------------------------------------------------
# perceiver
# ---------------------------------------------------------------------------

def init_perceiver(
    dim: int, key: jax.Array, depth: int = 6, dim_head: int = 64,
    heads: int = 8, num_latents: int = 64, ff_mult: int = 4,
    dtype=jnp.float32,
) -> Params:
    inner = dim_head * heads
    keys = iter(jax.random.split(key, 2 + depth * 5))

    def lin(i, o):
        return {"kernel": (jax.random.normal(next(keys), (i, o)) *
                           (i ** -0.5)).astype(dtype)}

    def ln():
        return {"weight": jnp.ones((dim,), dtype),
                "bias": jnp.zeros((dim,), dtype)}

    layers = []
    for _ in range(depth):
        layers.append({
            "norm_media": ln(), "norm_latents": ln(),
            "to_q": lin(dim, inner), "to_kv": lin(dim, inner * 2),
            "to_out": lin(inner, dim),
            "ff_norm": ln(),
            "ff1": lin(dim, dim * ff_mult), "ff2": lin(dim * ff_mult, dim),
        })
    return {
        "latents": jax.random.normal(next(keys), (num_latents, dim)).astype(dtype),
        "layers": layers,
        "norm": ln(),
        "heads": heads,
        "dim_head": dim_head,
    }


def perceiver_resample(params: Params, features: jax.Array) -> jax.Array:
    """[B, v, D] image tokens -> [B, num_latents, D]."""
    B, v, D = features.shape
    h = params["heads"]
    hd = params["dim_head"]
    lat = jnp.broadcast_to(
        params["latents"][None], (B,) + params["latents"].shape
    ).astype(features.dtype)

    for p in params["layers"]:
        x = layer_norm(features, p["norm_media"]["weight"],
                       p["norm_media"]["bias"])
        l_in = layer_norm(lat, p["norm_latents"]["weight"],
                          p["norm_latents"]["bias"])
        q = (l_in @ p["to_q"]["kernel"]).reshape(B, -1, h, hd)
        kv_in = jnp.concatenate([x, l_in], axis=1)
        kv = kv_in @ p["to_kv"]["kernel"]
        k, vv = jnp.split(kv, 2, axis=-1)
        k = k.reshape(B, -1, h, hd)
        vv = vv.reshape(B, -1, h, hd)
        scale = hd ** -0.5
        sim = jnp.einsum("bihd,bjhd->bhij", q * scale, k)
        sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn, vv).reshape(B, -1, h * hd)
        lat = lat + out @ p["to_out"]["kernel"]
        z = layer_norm(lat, p["ff_norm"]["weight"], p["ff_norm"]["bias"])
        z = jax.nn.gelu(z @ p["ff1"]["kernel"], approximate=False)
        lat = lat + z @ p["ff2"]["kernel"]
    return layer_norm(lat, params["norm"]["weight"], params["norm"]["bias"])


# ---------------------------------------------------------------------------
# registry (builder.py equivalent)
# ---------------------------------------------------------------------------

def build_resampler(name: Optional[str], dim: int = 1152,
                    key: Optional[jax.Array] = None, **kw):
    """Returns (params, apply_fn(params, features, key=None, training=False)).

    Mirrors multimodal_resampler/builder.py name dispatch; None/identity is
    LaViDa's configuration."""
    if name in (None, "identity"):
        return {}, lambda p, f, **_: f
    if name == "masked_drop":
        return {}, (
            lambda p, f, key=None, training=False, **_:
            masked_drop(
                f, key if key is not None else jax.random.PRNGKey(0),
                training=training, **kw,
            )
        )
    if name == "spatial_pool":
        return {}, lambda p, f, **_: spatial_pool(f, **kw)
    if name == "perceiver":
        assert key is not None
        return (init_perceiver(dim, key, **kw),
                lambda p, f, **_: perceiver_resample(p, f))
    if name == "qformer":
        # real BLIP-2 BERT Q-former (models/qformer.py, torch-parity
        # tested).  Mirrors the reference wiring
        # (multimodal_resampler/qformer.py:1102-1133): `depth` feeds
        # cross_attention_freq — a reference quirk preserved as-is.
        from . import qformer as qf

        assert key is not None
        cfg = qf.QformerConfig(
            encoder_width=dim,
            num_query_tokens=kw.pop("latents", kw.pop("num_latents", 32)),
            cross_attention_freq=kw.pop("depth", 2),
            **kw,
        )
        return (qf.init_params(cfg, key),
                lambda p, f, **_: qf.apply(p, cfg, f))
    raise ValueError(f"unknown resampler: {name}")
