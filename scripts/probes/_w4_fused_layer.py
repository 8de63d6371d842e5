"""Chip probe: fused decode-layer kernels (ops/w4_fused.py) at LLaDA-8B
dims — Mosaic compile check + n-delta rate vs the per-call pattern
(_w4_callcount.py: many 626 GB/s, few 674 GB/s, same session).

Chain per layer: w4_qkv_norm -> (slice as fake attention) ->
w4_matmul_res -> w4_ffn_fused.  Weight bytes/layer = same 3.49 GB total
as the real model.  Protocol: measurement law v3.
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

from lavida_mod_tpu.ops.w4_fused import (  # noqa: E402
    w4_ffn_fused, w4_matmul_res, w4_qkv_norm,
)

D, H, L, T = 4096, 12288, 32, 32


@jax.jit
def build():
    def w4(k, n):
        return {"kernel_p4": jnp.zeros((k // 2, n), jnp.int8),
                "scales4": jnp.zeros((k // 128, n), jnp.float32)}
    return [{
        "qkv": w4(D, 3 * D), "o": w4(D, D),
        "ff": w4(D, 2 * H), "down": w4(H, D),
        "nw1": jnp.ones((D,), jnp.bfloat16),
        "nw2": jnp.ones((D,), jnp.bfloat16),
    } for _ in range(L)]


layers = build()
gb = L * (D * 3 * D + D * D + D * 2 * H + H * D) / 2 / 1e9
print(f"total weight bytes: {gb:.2f} GB", flush=True)


@jax.jit
def chain(layers, x, n):
    def body(i, x):
        x = x + i * 1e-9
        for lp in layers:
            qkv = w4_qkv_norm(x, lp["nw1"], lp["qkv"]["kernel_p4"],
                              lp["qkv"]["scales4"])
            att = qkv[:, :D] + qkv[:, D:2 * D] * 0.5 + qkv[:, 2 * D:] * 0.25
            x = w4_matmul_res(att, x, lp["o"]["kernel_p4"],
                              lp["o"]["scales4"])
            x = w4_ffn_fused(x, lp["nw2"], lp["ff"]["kernel_p4"],
                             lp["ff"]["scales4"], lp["down"]["kernel_p4"],
                             lp["down"]["scales4"])
        return x * 0.999
    return jax.lax.fori_loop(0, n, body, x)


rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
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


t_lo, t_hi = timed(2), timed(10)
per = (t_hi - t_lo) / 8
print(f"fused: chain device time {per*1e3:.2f} ms "
      f"({gb/per:.0f} GB/s on {gb:.2f} GB; "
      f"lo={t_lo*1e3:.1f} hi={t_hi*1e3:.1f})", flush=True)
