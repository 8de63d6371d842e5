"""Ablate the W4A8 decode step to locate the 9.9ms - 4.9ms gap.

Variants (all: 32 layers, G=32 gen tokens, P=1056 cache, unrolled int4):
  full       — the real denoise step (forward + denoise_commit)
  nosample   — forward + argmax over first 1k logits (no softmax/topk)
  nohead     — forward hidden only (return_logits=False), checksum on h
  noattn     — matmul chain only: attention replaced by q-passthrough
  attnonly   — attention path with weights replaced by 1-col dummies is
               not representable; instead measure noattn delta.

Timing: amortized over n=40 fori_loop-chained steps with a host checksum
fetch (measurement law, NOTES_ROUND3.md).
"""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp

from lavida_mod_tpu.config import LaViDaConfig
from lavida_mod_tpu.models import llada as L
from lavida_mod_tpu.ops import sampling

cfg = LaViDaConfig().llada
P, G = 1056, 32


def q4_zero(d):
    if isinstance(d, list):
        return [q4_zero(x) for x in d]
    if isinstance(d, dict):
        if "kernel" in d and len(d["kernel"].shape) == 2:
            K, N = d["kernel"].shape
            return {"kernel_p4": jnp.zeros((K // 2, N), jnp.int8),
                    "scales4": jnp.zeros((K // 128, N), jnp.float32)}
        return {k: q4_zero(v) for k, v in d.items()}
    return jnp.zeros(d.shape, d.dtype)


def build():
    def b(k):
        return L.unstack_blocks(L.init_params(cfg, k, jnp.bfloat16))
    shapes = jax.eval_shape(b, jax.random.PRNGKey(0))
    return {k: (q4_zero(v) if k == "blocks" else jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), v))
        for k, v in shapes.items()}


def main():
    params = build()
    Hkv, hd, Lb = cfg.effective_n_kv_heads, cfg.head_dim, cfg.n_layers
    cache = [(jnp.zeros((1, P + G, Hkv, hd), jnp.bfloat16),
              jnp.zeros((1, P + G, Hkv, hd), jnp.bfloat16))
             for _ in range(Lb)]
    x0 = jnp.zeros((1, G), jnp.int32)
    positions = jnp.arange(P, P + G, dtype=jnp.int32)
    k_row = jnp.full((1,), 2, jnp.int32)

    def fwd(params, cache, x, *, return_logits=True):
        return L.forward(
            params, cfg, L.embed_tokens(params, x), positions=positions,
            kv_cache=cache, kv_write_index=P, use_cache=True,
            return_logits=return_logits)

    @partial(jax.jit, static_argnames=("n", "mode"))
    def chain(params, cache, x, n, mode):
        def body(i, carry):
            x, cache, acc = carry
            if mode == "nohead":
                h, cache = fwd(params, cache, x, return_logits=False)
                x = (jnp.abs(h[0, :, 0]) * 100).astype(jnp.int32) % 1000
                return x[None], cache, acc + h[0, 0, :8].astype(jnp.float32)
            logits, cache = fwd(params, cache, x)
            if mode == "full":
                x = sampling.denoise_commit(
                    x, logits, x == cfg.mask_token_id, k_row, G,
                    temperature=0.0, remasking="low_confidence")
            else:  # nosample
                x = jnp.argmax(logits[:, :, :1000], -1).astype(jnp.int32)
            return x, cache, acc + logits[0, 0, :8].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, (x0, cache, jnp.zeros(8, jnp.float32)))[2]

    n = 40
    for mode in ("nosample", "full", "nohead"):
        # warm up with the SAME static n — a different trip count is a
        # different executable and its compile would land in the timing
        float(jnp.sum(chain(params, cache, x0, n, mode)))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            float(jnp.sum(chain(params, cache, x0, n, mode)))
        dt = (time.perf_counter() - t0) / (n * reps)
        print(f"{mode}: {dt*1e3:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
