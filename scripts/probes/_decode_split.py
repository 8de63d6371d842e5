"""Decompose the W4A8 decode step (9.9ms at G=32): vary G and remasking
to split weight-reads vs attention/sampling/elementwise. Step cost from
steps32-steps16 deltas (async-safe)."""
import sys; sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from lavida_mod_tpu.config import GenerationConfig, LaViDaConfig
from lavida_mod_tpu.generation import diffusion
from lavida_mod_tpu.models import llada as L
from lavida_mod_tpu.models import multimodal as mm

cfg = LaViDaConfig()


def build_int4():
    def b(k):
        p = mm.init_params(cfg, k, jnp.bfloat16)
        p["llada"] = L.unstack_blocks(p["llada"])
        return p
    shapes = jax.eval_shape(b, jax.random.PRNGKey(0))

    def q4(d):
        if isinstance(d, list):
            return [q4(x) for x in d]
        if isinstance(d, dict):
            if "kernel" in d and len(d["kernel"].shape) == 2:
                K, N = d["kernel"].shape
                if N % 512 == 0:
                    o = {"kernel_p4": jnp.zeros((K // 2, N), jnp.int8),
                         "scales4": jnp.zeros((K // 128, N), jnp.float32)}
                else:
                    o = {"kernel_q": jnp.zeros((K, N), jnp.int8),
                         "scale": jnp.zeros((N,), jnp.float32)}
                if "bias" in d:
                    o["bias"] = jnp.zeros(d["bias"].shape, d["bias"].dtype)
                return o
            return {k: q4(v) for k, v in d.items()}
        return jnp.zeros(d.shape, d.dtype)
    return {k: (q4(v) if k == "llada" else jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), v))
        for k, v in shapes.items()}


params = build_int4()
prefix = jnp.zeros((1, 1184, 4096), jnp.bfloat16)


def step_cost(G, remasking, n=5):
    def run(steps):
        gen = GenerationConfig(max_new_tokens=G, block_length=G,
                               steps=None, step_per_block=steps,
                               prefix_lm=True, remasking=remasking)
        def one(i):
            out = diffusion.generate(
                params["llada"], cfg.llada, prefix + 1e-4 * i, gen,
                use_flash_prefill=True, key=jax.random.PRNGKey(i))
            return int(jnp.sum(out))
        one(0)
        ts = []
        for i in range(1, n):
            t0 = time.perf_counter(); one(i)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))
    return (run(32) - run(16)) / 16


if __name__ == "__main__":
    G = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rm = sys.argv[2] if len(sys.argv) > 2 else "low_confidence"
    c = step_cost(G, rm)
    print(f"G={G:3d} remask={rm:15s} per-step {c*1e3:6.2f} ms",
          flush=True)
