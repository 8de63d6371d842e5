import time, numpy as np, jax, jax.numpy as jnp
from lavida_mod_tpu.config import GenerationConfig, LaViDaConfig
from lavida_mod_tpu.generation import diffusion
from lavida_mod_tpu.models import llada as L
from lavida_mod_tpu.models import multimodal

# int4 storage test


def main():
    try:
        w4 = jnp.ones((128,128), jnp.int4)
        print("int4 dtype ok:", w4.dtype, w4.nbytes, "bytes")
    except Exception as e:
        print("int4 unsupported:", e); raise SystemExit

    cfg = LaViDaConfig()
    def build(k):
        p = multimodal.init_params(cfg, k, jnp.bfloat16)
        return L.quantize_params(L.unstack_blocks(p["llada"]))
    shapes = jax.eval_shape(build, jax.random.PRNGKey(0))
    p8 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    def to4(d):
        if isinstance(d, list): return [to4(x) for x in d]
        if isinstance(d, dict):
            if "kernel_q" in d:
                out = dict(d); out["kernel_q"] = d["kernel_q"].astype(jnp.int4); return out
            return {k: to4(v) for k, v in d.items()}
        return d
    p4 = to4(p8)
    jax.block_until_ready((p8, p4))

    P, G = 1056, 32
    def bench(params, tag):
        prefix = jnp.zeros((1, P, 4096), jnp.bfloat16)
        gen = GenerationConfig(max_new_tokens=G, block_length=G, step_per_block=16, prefix_lm=True)
        def run(i):
            pb = jnp.full((1, P, 4096), 1e-4*i, jnp.bfloat16)
            out = diffusion.generate(params, cfg.llada, pb, gen)
            return int(jnp.sum(out))
        run(0)
        t0=time.perf_counter()
        for i in range(1,5): run(i)
        print(f"{tag}: {(time.perf_counter()-t0)/4:.3f}s (prefill+16 steps)", flush=True)

    bench(p8, "int8")
    bench(p4, "int4")



if __name__ == "__main__":
    main()
