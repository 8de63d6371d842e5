"""Vision->LM projectors (reference llava/model/multimodal_projector/builder.py).

LaViDa uses "mlp2x_gelu": Linear(1152->4096) · GELU(exact) · Linear(4096->4096)
(builder.py:44-50; torch nn.GELU default is the erf form).  Also provided:
"linear", "identity", "pooler" (conv k=stride=ratio + GELU + Linear,
pooler_projector.py:9-35), and "mlp{N}x_res{M}x_gelu".

Weight conversion: torch Sequential names "0.weight", "2.weight", ... map to
layer list entries; Linear weights transpose to [in, out].
"""

from __future__ import annotations

import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import layer_norm

Params = dict


def parse_projector_type(projector_type: str) -> dict[str, Any]:
    if projector_type in ("linear", "identity", "pooler"):
        return {"kind": projector_type}
    m = re.match(r"^mlp(\d+)x_gelu$", projector_type)
    if m:
        return {"kind": "mlp", "depth": int(m.group(1)), "res": 0}
    m = re.match(r"^mlp(\d+)x_res(\d+)x_gelu$", projector_type)
    if m:
        return {"kind": "mlp", "depth": int(m.group(1)), "res": int(m.group(2))}
    raise ValueError(f"Unknown projector type: {projector_type}")


def init_params(
    projector_type: str, mm_hidden: int, hidden: int, key: jax.Array,
    dtype=jnp.float32, pooler_ratio: int = 2,
) -> Params:
    spec = parse_projector_type(projector_type)
    keys = iter(jax.random.split(key, 16))

    def lin(i, o):
        k = next(keys)
        return {
            "kernel": (jax.random.normal(k, (i, o)) * 0.02).astype(dtype),
            "bias": jnp.zeros((o,), dtype),
        }

    if spec["kind"] == "identity":
        return {}
    if spec["kind"] == "linear":
        return {"layers": [lin(mm_hidden, hidden)]}
    if spec["kind"] == "pooler":
        return {
            "conv": lin(mm_hidden * pooler_ratio * pooler_ratio, hidden),
            "proj": lin(hidden, hidden),
        }
    layers = [lin(mm_hidden, hidden)]
    for _ in range(spec["depth"] - 1):
        layers.append(lin(hidden, hidden))
    p: Params = {"layers": layers}
    if spec["res"]:
        p["res_blocks"] = [
            {
                "pre_norm": {"weight": jnp.ones((hidden,), dtype),
                             "bias": jnp.zeros((hidden,), dtype)},
                "fc1": lin(hidden, hidden),
                "fc2": lin(hidden, hidden),
            }
            for _ in range(spec["res"])
        ]
    return p


def forward(
    params: Params, projector_type: str, x: jax.Array,
    pooler_ratio: int = 2,
) -> jax.Array:
    """x: [N, tokens, mm_hidden] -> [N, tokens', hidden]."""
    spec = parse_projector_type(projector_type)
    if spec["kind"] == "identity":
        return x
    if spec["kind"] == "pooler":
        N, T, D = x.shape
        g = int(round(float(np.sqrt(T))))
        r = pooler_ratio
        # conv k=stride=r == block reshape + matmul (pooler_projector.py:26-30)
        xg = x.reshape(N, g // r, r, g // r, r, D) if g % r == 0 else None
        assert xg is not None, "pooler requires grid divisible by ratio"
        # torch conv weight [O, D, r, r] flattened (D, rh, rw)
        xg = xg.transpose(0, 1, 3, 5, 2, 4).reshape(N, (g // r) ** 2, D * r * r)
        h = xg @ params["conv"]["kernel"] + params["conv"]["bias"]
        h = jax.nn.gelu(h, approximate=False)
        return h @ params["proj"]["kernel"] + params["proj"]["bias"]

    h = x
    for i, lp in enumerate(params["layers"]):
        if i > 0:
            h = jax.nn.gelu(h, approximate=False)
        h = h @ lp["kernel"] + lp["bias"]
    for rb in params.get("res_blocks", []):
        z = layer_norm(h, rb["pre_norm"]["weight"], rb["pre_norm"]["bias"])
        y = z @ rb["fc1"]["kernel"] + rb["fc1"]["bias"]
        y = jax.nn.gelu(y, approximate=False)
        y = y @ rb["fc2"]["kernel"] + rb["fc2"]["bias"]
        h = z + y
    return h


def convert_projector_state_dict(
    state: dict[str, np.ndarray], projector_type: str, dtype=jnp.bfloat16,
    prefix: str = "",
) -> Params:
    """torch mm_projector state_dict -> params (Sequential index names)."""
    spec = parse_projector_type(projector_type)

    def get(name):
        for cand in (prefix + name, name, "model.mm_projector." + name):
            if cand in state:
                return np.asarray(state[cand])
        raise KeyError(f"missing projector weight: {prefix + name}")

    if spec["kind"] == "identity":
        return {}
    if spec["kind"] == "pooler":
        conv_w = get("conv_pool.weight")  # [O, D, r, r]
        return {
            "conv": {"kernel": jnp.asarray(conv_w.reshape(conv_w.shape[0], -1).T, dtype),
                     "bias": jnp.asarray(get("conv_pool.bias"), dtype)},
            "proj": {"kernel": jnp.asarray(get("proj.1.weight").T, dtype),
                     "bias": jnp.asarray(get("proj.1.bias"), dtype)},
        }
    if spec["kind"] == "linear":
        return {"layers": [{"kernel": jnp.asarray(get("weight").T, dtype),
                            "bias": jnp.asarray(get("bias"), dtype)}]}
    depth = spec["depth"]
    layers = []
    for i in range(depth):
        idx = 0 if i == 0 else 2 * i  # Sequential: Linear, GELU, Linear, ...
        layers.append({
            "kernel": jnp.asarray(get(f"{idx}.weight").T, dtype),
            "bias": jnp.asarray(get(f"{idx}.bias"), dtype),
        })
    return {"layers": layers}
