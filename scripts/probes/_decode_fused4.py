"""Probe: fused-layout (4 matmuls/layer) decode step, int8 vs int4."""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from lavida_mod_tpu.config import LaViDaConfig
from lavida_mod_tpu.generation import diffusion
from lavida_mod_tpu.models import llada as L


def zeros_like_shapes(shapes):
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


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
    cfg0 = LaViDaConfig().llada
    P, G = 1056, 32

    def build_fused(k):
        p = L.init_params(cfg0, k, jnp.bfloat16)
        p, cfg = L.to_fused_layout(p, cfg0)
        return L.unstack_blocks(p)
    shapes = jax.eval_shape(build_fused, jax.random.PRNGKey(0))
    _, cfg = L.to_fused_layout(
        jax.eval_shape(lambda k: L.init_params(cfg0, k, jnp.bfloat16),
                       jax.random.PRNGKey(0)).copy() | {}, cfg0) \
        if False else (None, cfg0.replace(
            block_type="sequential", activation="swiglu",
            mlp_hidden_size=2 * cfg0.hidden_size))

    def build8(k):
        p = L.init_params(cfg0, k, jnp.bfloat16)
        p, _ = L.to_fused_layout(p, cfg0)
        return L.quantize_params(L.unstack_blocks(p))
    shapes8 = jax.eval_shape(build8, jax.random.PRNGKey(0))
    p8 = zeros_like_shapes(shapes8)
    p4 = dict(p8)
    p4["blocks"] = q4_zero(jax.tree.map(lambda s: s, shapes["blocks"]))

    key = jax.random.PRNGKey(0)

    def run(S, i, dec):
        prefix = jnp.full((1, P, cfg.d_model), 1e-4 * i, jnp.bfloat16)
        x = jnp.full((1, G), cfg.mask_token_id, jnp.int32)
        k_table = jnp.ones((S, 1), jnp.int32)
        block_end = jnp.full((S,), G, jnp.int32)
        out = diffusion._generate_cached_fused(
            p8, cfg, x, prefix, k_table, block_end, None, key,
            temperature=0.0, remasking="low_confidence", use_flash=False,
            act_int8_prefill=False, use_flash_prefill=True,
            decode_params=dec)
        return int(np.asarray(out).sum())

    for name, dec in (("fused-int8", None), ("fused-int4", p4)):
        try:
            ts = {}
            for S in (16, 48):
                run(S, 0, dec)
                t0 = time.perf_counter()
                cs = sum(run(S, i, dec) for i in range(1, 6))
                ts[S] = (time.perf_counter() - t0) / 5
            step = (ts[48] - ts[16]) / 32
            print(f"{name}: total16={ts[16]*1e3:.1f} ms  step={step*1e3:.2f} ms")
        except Exception as e:
            print(name, "FAIL:", str(e)[:200])


if __name__ == "__main__":
    main()
