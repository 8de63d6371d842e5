"""Checkpoint conversion: reference (torch/HF) LLaDA weights -> params pytree.

Reference parameter naming (modeling_llada.py:1125-1159, 809-948):
  transformer.wte.weight                       [E, D]
  transformer.ln_f.weight                      [D]
  transformer.ff_out.weight                    [E, D]   (absent when tied)
  transformer.blocks.<i>.attn_norm.weight      [D]
  transformer.blocks.<i>.ff_norm.weight        [D]
  llama block:  q_proj/k_proj/v_proj/attn_out/ff_proj/up_proj/ff_out .weight
  sequential:   att_proj/attn_out/ff_proj/ff_out .weight

torch Linear weights are [out, in]; our kernels are [in, out].  Per-layer
tensors are stacked along a leading n_layers axis.
"""

from __future__ import annotations

from typing import Callable, Mapping

import numpy as np
import jax.numpy as jnp

from ..config import LLaDAConfig

_LLAMA_LINEARS = ("q_proj", "k_proj", "v_proj", "attn_out",
                  "ff_proj", "up_proj", "ff_out")
_SEQ_LINEARS = ("att_proj", "attn_out", "ff_proj", "ff_out")
_NORMS = ("attn_norm", "ff_norm", "q_norm", "k_norm")


def convert_state_dict(
    state: Mapping[str, np.ndarray],
    cfg: LLaDAConfig,
    dtype=jnp.bfloat16,
) -> dict:
    """Convert a torch state_dict (values as numpy arrays) to a params pytree.

    Accepts names with or without the HF wrapper's "model." prefix.
    """
    def get(name: str) -> np.ndarray | None:
        for cand in (name, "model." + name):
            if cand in state:
                return np.asarray(state[cand])
        return None

    def req(name: str) -> np.ndarray:
        a = get(name)
        if a is None:
            raise KeyError(f"missing weight: {name}")
        return a

    L = cfg.n_layers
    linears = _LLAMA_LINEARS if cfg.block_type == "llama" else _SEQ_LINEARS

    blocks: dict = {}
    for ln in linears:
        ws = [req(f"transformer.blocks.{i}.{ln}.weight").T for i in range(L)]
        blocks[ln] = {"kernel": jnp.asarray(np.stack(ws), dtype)}
        b0 = get(f"transformer.blocks.0.{ln}.bias")
        if b0 is not None:
            bs = [req(f"transformer.blocks.{i}.{ln}.bias") for i in range(L)]
            blocks[ln]["bias"] = jnp.asarray(np.stack(bs), dtype)
    for nn_ in _NORMS:
        w0 = get(f"transformer.blocks.0.{nn_}.weight")
        if w0 is None:
            continue
        ws = [req(f"transformer.blocks.{i}.{nn_}.weight") for i in range(L)]
        blocks[nn_] = {"weight": jnp.asarray(np.stack(ws), dtype)}
        b0 = get(f"transformer.blocks.0.{nn_}.bias")
        if b0 is not None:
            bs = [req(f"transformer.blocks.{i}.{nn_}.bias") for i in range(L)]
            blocks[nn_]["bias"] = jnp.asarray(np.stack(bs), dtype)

    params: dict = {
        "wte": jnp.asarray(req("transformer.wte.weight"), dtype),
        "ln_f": {"weight": jnp.asarray(req("transformer.ln_f.weight"), dtype)},
        "blocks": blocks,
    }
    lnb = get("transformer.ln_f.bias")
    if lnb is not None:
        params["ln_f"]["bias"] = jnp.asarray(lnb, dtype)
    if not cfg.weight_tying:
        params["ff_out"] = {
            "kernel": jnp.asarray(req("transformer.ff_out.weight").T, dtype)
        }
    return params


def load_torch_checkpoint(path: str, cfg: LLaDAConfig, dtype=jnp.bfloat16) -> dict:
    """Load safetensors/torch .bin shards from a local HF checkpoint dir."""
    import glob
    import os

    state: dict[str, np.ndarray] = {}
    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            state.update(load_file(f))
    else:
        import torch

        for f in sorted(glob.glob(os.path.join(path, "pytorch_model*.bin"))):
            sd = torch.load(f, map_location="cpu", weights_only=True)
            state.update({k: v.float().numpy() for k, v in sd.items()})
    if not state:
        raise FileNotFoundError(f"no checkpoint shards under {path}")
    return convert_state_dict(state, cfg, dtype)
