"""Chip probe: 32-layer W4A8 grouped-int4 matmul chain at PREFILL shape.

The DEFAULT serving config runs prefill through `ops/quant._linear_w4`
(w4_matmul_grouped) — this measures the whole 32-layer dot chain at
T=1056 so we can compare against the fused W8A8 rate (51 ms / 287 TOPS,
scripts/probes/_w8a8_fused_chip.py) and decide whether the default
prefill should ride int8 weights instead.

Usage: python _w4_prefill_chain.py
Protocol: measurement law v3 (inner fori_loop, n-delta).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

assert jax.default_backend() != "cpu", jax.default_backend()
print("backend:", jax.default_backend(), flush=True)

D, H, M, L, group = 4096, 12288, 1056, 32, 128

from lavida_mod_tpu.ops.quant import linear as lin  # routes kernel_p4 -> w4


@jax.jit
def build():
    def w4(k, n):
        return {"kernel_p4": jnp.zeros((k // 2, n), jnp.int8),
                "scales4": jnp.full((k // group, n), 1e-4, jnp.float32)}
    return [{
        "qkv": w4(D, 3 * D), "o": w4(D, D),
        "ff": w4(D, 2 * H), "down": w4(H, D),
    } for _ in range(L)]


layers = build()


@jax.jit
def chain(layers, x, n):
    def body(i, x):
        x = x + i * 1e-9
        for lp in layers:
            qkv = lin(x, lp["qkv"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            a = q + k * 0.5 + v * 0.25
            x = x + lin(a, lp["o"])
            h = lin(x, lp["ff"])
            hh, gate = jnp.split(h, 2, axis=-1)
            x = x + lin(jax.nn.silu(gate) * hh, lp["down"])
        return x * 0.999
    return jax.lax.fori_loop(0, n, body, x)


rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((M, D)), jnp.bfloat16)
t0 = time.perf_counter()
float(jnp.sum(chain(layers, x0, 2)))
print("compile+first:", round(time.perf_counter() - t0, 1), flush=True)


def timed(n, reps=3):
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(chain(layers, x0 + i * 1e-6, n)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


t_lo, t_hi = timed(1), timed(5)
per = (t_hi - t_lo) / 4
flops = 2 * M * L * (D * 3 * D + D * D + D * 2 * H + H * D)
print(f"w4 prefill: chain device time {per*1e3:.1f} ms  "
      f"{flops/per/1e12:.0f} TOPS (lo={t_lo*1e3:.1f} hi={t_hi*1e3:.1f})",
      flush=True)
