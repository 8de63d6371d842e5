"""GSPMD sharding rules for the LaViDa parameter pytrees.

This is the whole "distributed backend": instead of DeepSpeed engine code,
each parameter gets a PartitionSpec and XLA inserts the collectives
(SURVEY.md §2.9).  Rules (axes from parallel.mesh):

  LLaDA blocks (stacked [L, in, out]):
    q/k/v/ff_proj/up_proj (col-parallel)   P(None, "fsdp", "tp")
    attn_out/ff_out       (row-parallel)   P(None, "tp", "fsdp")
    fused att_proj                          P(None, "fsdp", "tp")
    norms                                   replicated
  wte [E, D]     P("tp", "fsdp")   (vocab-sharded embedding)
  lm head ff_out [D, E]  P("fsdp", "tp")
  SigLIP layers mirror the same col/row pattern; pos/patch embeds replicated.
  Projector / image_newline: replicated (tiny).

Col-then-row pairing means TP activations need exactly one psum per block
(inserted by XLA), matching the Megatron recipe from the scaling book.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (regex over "/"-joined path, spec) — first match wins.
_RULES: list[tuple[str, P]] = [
    # LLaDA stacked blocks
    (r"blocks/(q_proj|k_proj|v_proj|ff_proj|up_proj|att_proj)/kernel$",
     P(None, "fsdp", "tp")),
    (r"blocks/(attn_out|ff_out)/kernel$", P(None, "tp", "fsdp")),
    (r"blocks/.*/bias$", P()),
    (r"blocks/(attn_norm|ff_norm|q_norm|k_norm)/.*$", P()),
    # embeddings / head
    (r"(^|/)wte$", P("tp", "fsdp")),
    (r"(^|/)ff_out/kernel$", P("fsdp", "tp")),
    (r"(^|/)ln_f/.*$", P()),
    # SigLIP stacked layers
    (r"siglip/layers/(q_proj|k_proj|v_proj|fc1)/kernel$",
     P(None, "fsdp", "tp")),
    (r"siglip/layers/(out_proj|fc2)/kernel$", P(None, "tp", "fsdp")),
    (r"siglip/.*$", P()),
    # projector & misc
    (r"projector/.*$", P()),
    (r"image_newline$", P()),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for(path_str: str, leaf: Any) -> P:
    for pat, spec in _RULES:
        if re.search(pat, path_str):
            return _fit(spec, leaf)
    return P()


def _fit(spec: P, leaf: Any) -> P:
    """Trim a spec to the leaf's rank (defensive for bias-less layouts)."""
    ndim = getattr(leaf, "ndim", 0)
    parts = (list(spec) + [None] * ndim)[:ndim]
    while parts and parts[-1] is None:
        parts.pop()
    return P(*parts)


def param_specs(params) -> Any:
    """Pytree of PartitionSpec matching `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec_for(_path_str(path), leaf), params
    )


def param_shardings(params, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), param_specs(params)
    )


def shard_params(params, mesh: Mesh):
    """Place a params pytree onto the mesh per the rules."""
    return jax.device_put(params, param_shardings(params, mesh))


def batch_spec() -> P:
    """Batch axis sharded over dp×fsdp (standard FSDP batch layout)."""
    return P(("dp", "fsdp"))
