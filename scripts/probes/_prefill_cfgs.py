"""Probe: real 8B prefill latency across {dense,flash} x {bf16,act-int8}."""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from lavida_mod_tpu.config import LaViDaConfig
from lavida_mod_tpu.models import llada as L
from lavida_mod_tpu.models.lavida import LaViDa


def main():
    cfg = LaViDaConfig()
    params = LaViDa.zero_init(cfg, jnp.bfloat16, quantized=True).params["llada"]
    P, D = 1056, cfg.llada.d_model
    prefix = jnp.zeros((1, P, D), jnp.bfloat16)

    from functools import partial
    @partial(jax.jit, static_argnames=("use_flash", "act_int8", "n"))
    def chain(params, prefix, n, use_flash, act_int8):
        def body(i, carry):
            prefix, acc = carry
            _, cache = L.forward(params, cfg.llada, prefix, use_cache=True,
                                 return_logits=False, use_flash=use_flash,
                                 act_int8=act_int8)
            k = cache["k"] if isinstance(cache, dict) else cache[0][0]
            probe = k[..., 0, 0, :8].reshape(-1)[:8].astype(jnp.float32)
            prefix = prefix + probe[0].astype(jnp.bfloat16) * 1e-9
            return prefix, acc + probe
        return jax.lax.fori_loop(0, n, body, (prefix, jnp.zeros(8, jnp.float32)))[1]

    n = 20
    for uf in (False, True):
        for a8 in (False, True):
            float(jnp.sum(chain(params, prefix, 2, uf, a8)))
            t0 = time.perf_counter()
            float(jnp.sum(chain(params, prefix, n, uf, a8)))
            dt = (time.perf_counter() - t0) / n
            print(f"flash={uf} act_int8={a8}: {dt*1e3:.1f} ms/prefill")


if __name__ == "__main__":
    main()
