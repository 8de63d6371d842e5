"""Probe: int4 decode per-step cost via step-count deltas (real fused path)."""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from lavida_mod_tpu.config import LaViDaConfig
from lavida_mod_tpu.generation import diffusion
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

    def build_raw(k):
        return L.unstack_blocks(L.init_params(cfg, k, jnp.bfloat16))
    shapes = jax.eval_shape(build_raw, jax.random.PRNGKey(0))

    def build8(k):
        return L.quantize_params(L.unstack_blocks(L.init_params(cfg, k, jnp.bfloat16)))
    shapes8 = jax.eval_shape(build8, jax.random.PRNGKey(0))
    p8 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes8)
    # int4 blocks; embeddings/head from the int8 tree
    p4 = dict(p8)
    p4["blocks"] = q4_zero(jax.tree.map(lambda s: s, shapes["blocks"]))
    if "ff_out" in shapes:
        from lavida_mod_tpu.ops.quant import quantize_linear
        p4["ff_out"] = {"kernel_q": jnp.zeros((cfg.d_model, shapes["ff_out"]["kernel"].shape[-1]), jnp.int8),
                        "scale": jnp.zeros((shapes["ff_out"]["kernel"].shape[-1],), jnp.float32)}
    key = jax.random.PRNGKey(0)

    def run(S, i, params):
        prefix = jnp.full((1, P, cfg.d_model), 1e-4 * i, jnp.bfloat16)
        x = jnp.full((1, G), cfg.mask_token_id, jnp.int32)
        k_table = jnp.ones((S, 1), jnp.int32)
        block_end = jnp.full((S,), G, jnp.int32)
        out = diffusion._generate_cached_fused(
            p8, cfg, x, prefix, k_table, block_end, None, key,
            temperature=0.0, remasking="low_confidence", use_flash=False,
            act_int8_prefill=False, use_flash_prefill=True,
            decode_params=params)
        return int(np.asarray(out).sum())

    for S in (16, 48):
        run(S, 0, p4)
        t0 = time.perf_counter()
        cs = sum(run(S, i, p4) for i in range(1, 6))
        print(f"int4 S={S}: {(time.perf_counter()-t0)/5*1e3:.1f} ms/gen (cs={cs})")


if __name__ == "__main__":
    main()
