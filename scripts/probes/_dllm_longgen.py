"""Probe: dLLM-cache speedup at long gen (G=256, 32 steps) on the 8B layout."""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from lavida_mod_tpu.config import GenerationConfig, LaViDaConfig
from lavida_mod_tpu.generation import diffusion
from lavida_mod_tpu.models import llada as L


def main():
    cfg = LaViDaConfig().llada
    P, G, S = 1056, 256, 32

    def build8(k):
        return L.quantize_params(L.unstack_blocks(L.init_params(cfg, k, jnp.bfloat16)))
    shapes8 = jax.eval_shape(build8, jax.random.PRNGKey(0))
    p8 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes8)
    key = jax.random.PRNGKey(0)
    gen = GenerationConfig(max_new_tokens=G, block_length=G, steps=S,
                           prefix_lm=True, schedule="shift",
                           schedule_shift=0.33)

    def run(i, dllm):
        prefix = jnp.full((1, P, cfg.d_model), 1e-4 * i, jnp.bfloat16)
        out = diffusion.generate(p8, cfg, prefix, gen, key=key,
                                 use_flash_prefill=True, dllm_cache=dllm)
        return int(np.asarray(out).sum())

    for name, dllm in (("standard", None), ("dllm r=64", 64),
                       ("dllm r=96", 96)):
        try:
            run(0, dllm)
            t0 = time.perf_counter()
            cs = sum(run(i, dllm) for i in range(1, 4))
            print(f"{name}: {(time.perf_counter()-t0)/3*1e3:.1f} ms/gen (cs={cs})")
        except Exception as e:
            print(name, "FAIL:", str(e)[:300])


if __name__ == "__main__":
    main()
