import time, numpy as np, jax, jax.numpy as jnp
from lavida_mod_tpu.config import GenerationConfig, LaViDaConfig
from lavida_mod_tpu.generation import diffusion
from lavida_mod_tpu.models import llada as L
from lavida_mod_tpu.models import multimodal



def main():
    cfg = LaViDaConfig()
    def build(k):
        p = multimodal.init_params(cfg, k, jnp.bfloat16)
        p["llada"] = L.quantize_params(L.unstack_blocks(p["llada"]))
        return p
    shapes = jax.eval_shape(build, jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    jax.block_until_ready(params)
    gen = GenerationConfig(max_new_tokens=32, block_length=32, step_per_block=16, prefix_lm=True)
    P, Pb = 1056, 1152

    def run(i, flash):
        pb = jnp.full((1, Pb, 4096), 1e-4*i, jnp.bfloat16)
        pv = jnp.concatenate([jnp.zeros((1, Pb-P), bool), jnp.ones((1, P), bool)], axis=1)
        out = diffusion.generate(params["llada"], cfg.llada, pb, gen,
                                 prefix_valid=pv, use_flash_prefill=flash)
        return int(jnp.sum(out))

    for flash in (False, True):
        try:
            run(0, flash)
            t0=time.perf_counter()
            for i in range(1,9): run(i, flash)
            print(f"flash_prefill={flash}: {(time.perf_counter()-t0)/8:.4f}s/image", flush=True)
        except Exception as e:
            print(f"flash_prefill={flash}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)



if __name__ == "__main__":
    main()
