"""Probe: one denoise decode step (32 tokens, 1056-cache) int8 vs int4."""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from lavida_mod_tpu.config import LaViDaConfig
from lavida_mod_tpu.models import llada as L


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


def main():
    cfg = LaViDaConfig().llada
    P, G = 1056, 32

    def build8(k):
        p = L.init_params(cfg, k, jnp.bfloat16)
        return L.quantize_params(L.unstack_blocks(p))
    shapes8 = jax.eval_shape(build8, jax.random.PRNGKey(0))
    p8 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes8)

    def build_raw(k):
        return L.unstack_blocks(L.init_params(cfg, k, jnp.bfloat16))
    shapes_raw = jax.eval_shape(build_raw, jax.random.PRNGKey(0))
    p4 = {k: (q4_zero(v) if k == "blocks" else
              jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), v))
          for k, v in jax.tree.map(lambda s: s, shapes_raw).items()}
    # logit head + embeds stay int8/bf16 as in serving
    p4["ff_out"] = p8.get("ff_out", p4.get("ff_out"))

    Hkv, hd, Lb = cfg.effective_n_kv_heads, cfg.head_dim, cfg.n_layers
    cache = [(jnp.zeros((1, P + G, Hkv, hd), jnp.bfloat16),
              jnp.zeros((1, P + G, Hkv, hd), jnp.bfloat16)) for _ in range(Lb)]
    x = jnp.zeros((1, G), jnp.int32)
    positions = jnp.arange(P, P + G, dtype=jnp.int32)

    @partial(jax.jit, static_argnames=("n",))
    def chain(params, cache, x, n):
        def body(i, carry):
            x, cache, acc = carry
            logits, cache = L.forward(
                params, cfg, L.embed_tokens(params, x), positions=positions,
                kv_cache=cache, kv_write_index=P, use_cache=True)
            x = jnp.argmax(logits[:, :, :1000], -1).astype(jnp.int32)
            return x, cache, acc + logits[0, 0, :8].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, (x, cache, jnp.zeros(8, jnp.float32)))[2]

    n = 40
    for name, p in [("int8", p8), ("int4", p4)]:
        try:
            float(jnp.sum(chain(p, cache, x, 2)))
            t0 = time.perf_counter(); float(jnp.sum(chain(p, cache, x, n)))
            dt = (time.perf_counter() - t0) / n
            print(f"{name}: {dt*1e3:.2f} ms/step")
        except Exception as e:
            print(name, "FAILED:", str(e)[:300])


if __name__ == "__main__":
    main()
