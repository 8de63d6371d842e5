"""True decode weight floor: 32 layers' worth of W4A8 matmuls at decode
shapes ([32, 4096] activations), NOTHING else — same-n warmup (the old
floor number predates the static-trip-count timing fix).

Also measures: + attention (kv8 kernel), + norms/rope-ish VPU ops, to
bracket where the 7.4 ms/step (bench steps-delta, kv8) actually goes.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp

from lavida_mod_tpu.ops.pallas_w4 import quantize_w4_grouped, w4_matmul_grouped
from lavida_mod_tpu.ops import kv8_attention as KV8

import numpy as np

D, H_FF, V, T, S, NH = 4096, 12288, 126464, 32, 1088, 32
L = 32


def build_layer(rng):
    def q4(k, n):
        w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
        p, s = quantize_w4_grouped(w)
        return jnp.asarray(p), jnp.asarray(s)
    return {
        "qkv": q4(D, 3 * D),
        "o": q4(D, D),
        "gate_up": q4(D, 2 * H_FF),
        "down": q4(H_FF, D),
    }


def main():
    rng = np.random.default_rng(0)
    layers = [build_layer(rng) for _ in range(L)]
    head = build_layer(rng)["qkv"]  # stand-in ~3*D out; plus real head:
    wv = rng.standard_normal((D, V // 2 * 2)).astype(np.float32) * 0.02
    hp, hs = quantize_w4_grouped(wv)
    head_p, head_s = jnp.asarray(hp), jnp.asarray(hs)

    k8 = jnp.zeros((1, NH, S, 128), jnp.int8)
    ks = jnp.ones((1, NH, 1, S), jnp.float32)
    v8 = jnp.zeros_like(k8)
    vs = jnp.ones_like(ks)

    x0 = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)

    @partial(jax.jit, static_argnames=("n", "mode"))
    def chain(x0, layers, n, mode):
        def body(i, x):
            for lp in layers:
                qkv = w4_matmul_grouped(x, *lp["qkv"])
                if mode in ("attn", "attnvpu"):
                    q = qkv[:, :D].reshape(1, T, NH, 128)
                    att = KV8.kv8_decode_attention(q, k8, ks, v8, vs)
                    a = att.reshape(T, D)
                else:
                    a = qkv[:, :D]
                if mode == "attnvpu":
                    # rms-norm-ish VPU work twice per layer
                    a = a * jax.lax.rsqrt(
                        jnp.mean(a.astype(jnp.float32) ** 2, -1,
                                 keepdims=True) + 1e-5).astype(a.dtype)
                x = x + w4_matmul_grouped(a, *lp["o"])
                g = w4_matmul_grouped(x, *lp["gate_up"])
                h = jax.nn.silu(g[:, H_FF:]) * g[:, :H_FF]
                x = x + w4_matmul_grouped(h, *lp["down"])
                x = (x.astype(jnp.float32) * 0.99).astype(jnp.bfloat16)
            logits = w4_matmul_grouped(x, head_p, head_s)
            # feed a logit back so the head matmul can't be hoisted
            return x + logits[:, :1].astype(x.dtype) * 1e-3
        return jax.lax.fori_loop(0, n, body, x0)

    n = 16
    modes = sys.argv[1:] or ["mm"]
    for mode in modes:
        float(jnp.sum(chain(x0, layers, n, mode)))  # same-n warmup
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            float(jnp.sum(chain(x0, layers, n, mode)))
        dt = (time.perf_counter() - t0) / (n * reps)
        print(f"{mode}: {dt*1e3:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
