import jax, jax.numpy as jnp, functools
from lavida_mod_tpu.config import LaViDaConfig
from lavida_mod_tpu.models import llada as L


def main():
    cfg = LaViDaConfig().llada
    shapes = jax.eval_shape(lambda k: L.init_params(cfg, k, jnp.bfloat16), jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    params = L.quantize_params(L.unstack_blocks(params))

    @jax.jit
    def prefill(p, e):
        _, cache = L.forward(p, cfg, e, use_cache=True, return_logits=False)
        return cache

    e = jnp.zeros((1, 1056, 4096), jnp.bfloat16)
    lowered = prefill.lower(params, e)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list): ca = ca[0]
    flops = ca.get("flops", 0)
    bytes_ = ca.get("bytes accessed", 0)
    print(f"flops: {flops/1e12:.2f} TF, bytes: {bytes_/1e9:.2f} GB")
    print(f"  at 197 TF/s: {flops/197e12*1e3:.0f} ms; at 819 GB/s: {bytes_/819e9*1e3:.0f} ms")
    for k, v in sorted(ca.items(), key=lambda x: -x[1] if isinstance(x[1], (int,float)) else 0)[:8]:
        print(" ", k, v)



if __name__ == "__main__":
    main()
