"""Probe: real fused-generate per-step decode cost via step-count deltas."""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from lavida_mod_tpu.config import LaViDaConfig
from lavida_mod_tpu.generation import diffusion
from lavida_mod_tpu.models import llada as L


def main():
    cfg = LaViDaConfig().llada
    P, G = 1056, 32

    def build8(k):
        return L.quantize_params(L.unstack_blocks(L.init_params(cfg, k, jnp.bfloat16)))
    shapes8 = jax.eval_shape(build8, jax.random.PRNGKey(0))
    p8 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes8)
    key = jax.random.PRNGKey(0)

    def run(S, i):
        prefix = jnp.full((1, P, cfg.d_model), 1e-4 * i, jnp.bfloat16)
        x = jnp.full((1, G), cfg.mask_token_id, jnp.int32)
        k_table = jnp.ones((S, 1), jnp.int32)
        block_end = jnp.full((S,), G, jnp.int32)
        out = diffusion._generate_cached_fused(
            p8, cfg, x, prefix, k_table, block_end, None, key,
            temperature=0.0, remasking="low_confidence", use_flash=False,
            act_int8_prefill=False, use_flash_prefill=True)
        return int(np.asarray(out).sum())

    for S in (16, 48):
        run(S, 0)  # compile
        t0 = time.perf_counter()
        cs = sum(run(S, i) for i in range(1, 6))
        print(f"S={S}: {(time.perf_counter()-t0)/5*1e3:.1f} ms/gen (cs={cs})")


if __name__ == "__main__":
    main()
