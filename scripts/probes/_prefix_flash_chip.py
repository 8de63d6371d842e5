"""Chip probe: prefix_flash_attention fwd+bwd at training lengths vs
blockwise_attention (pure-XLA online softmax) and the dense-bias path.
8B geometry: H=32, hd=128.  Forced-fetch timing (measurement law)."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp

from lavida_mod_tpu.ops.attention import (blockwise_attention,
                                          dense_attention, make_bias)
from lavida_mod_tpu.ops.prefix_flash import prefix_flash_attention


def bench(f, *args, n=8):
    f(*args)  # compile
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(n):
        acc += float(jnp.sum(f(*args)[0]))
    dt = (time.perf_counter() - t0) / n
    return dt, acc


def main():
    B, H, hd = 2, 32, 128
    for T in (2048, 8192, 30720):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, T, H, hd), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, T, H, hd), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, T, H, hd), jnp.bfloat16)
        plen = jnp.array([T // 3, T // 2], jnp.int32)

        @jax.jit
        def f_kernel(q, k, v):
            def loss(q, k, v):
                o = prefix_flash_attention(q, k, v, plen)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            l, g = jax.value_and_grad(loss, argnums=(0,))(q, k, v)
            return g[0], l

        @jax.jit
        def f_blockwise(q, k, v):
            def loss(q, k, v):
                o = blockwise_attention(
                    q, k, v, prefix_lengths=plen,
                    q_positions=jnp.arange(T, dtype=jnp.int32))
                return jnp.sum(o.astype(jnp.float32) ** 2)
            l, g = jax.value_and_grad(loss, argnums=(0,))(q, k, v)
            return g[0], l

        @jax.jit
        def f_dense(q, k, v):
            def loss(q, k, v):
                bias = make_bias(
                    prefix_lengths=plen, q_positions=jnp.arange(T),
                    kv_positions=jnp.arange(T))
                o = dense_attention(q, k, v, bias=bias)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            l, g = jax.value_and_grad(loss, argnums=(0,))(q, k, v)
            return g[0], l

        try:
            dt, _ = bench(f_kernel, q, k, v)
            print(f"T={T} prefix_flash fwd+bwd: {dt*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"T={T} prefix_flash FAILED: {str(e)[:400]}", flush=True)
        try:
            dt, _ = bench(f_blockwise, q, k, v, n=4)
            print(f"T={T} blockwise    fwd+bwd: {dt*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"T={T} blockwise FAILED: {str(e)[:200]}", flush=True)
        if T <= 8192:
            try:
                dt, _ = bench(f_dense, q, k, v, n=4)
                print(f"T={T} dense        fwd+bwd: {dt*1e3:.1f} ms",
                      flush=True)
            except Exception as e:
                print(f"T={T} dense FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
