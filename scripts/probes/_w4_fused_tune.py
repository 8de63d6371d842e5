"""Chip probe: w4_fused chain rate vs block_n (256/512/1024).

The fused chain measured 632 GB/s at block_n=512 (_w4_fused_layer.py);
v5e HBM peak is ~819.  Larger n-blocks mean fewer grid steps + bigger
contiguous weight reads; smaller ones mean more double-buffer overlap
slots.  Protocol: measurement law v3 (n-delta over fori_loop, one
executable per variant run, same-n warmup).

Usage: python _w4_fused_tune.py [block_n]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

BN = int(sys.argv[1]) if len(sys.argv) > 1 else 512
assert jax.default_backend() != "cpu", jax.default_backend()
print("backend:", jax.default_backend(), "block_n:", BN, flush=True)

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


@jax.jit
def chain(layers, x, n):
    def body(i, x):
        x = x + i * 1e-9
        for lp in layers:
            qkv = w4_qkv_norm(x, lp["nw1"], lp["qkv"]["kernel_p4"],
                              lp["qkv"]["scales4"], block_n=BN)
            att = qkv[:, :D] + qkv[:, D:2 * D] * 0.5 + qkv[:, 2 * D:] * 0.25
            x = w4_matmul_res(att, x, lp["o"]["kernel_p4"],
                              lp["o"]["scales4"], block_n=BN)
            x = w4_ffn_fused(x, lp["nw2"], lp["ff"]["kernel_p4"],
                             lp["ff"]["scales4"], lp["down"]["kernel_p4"],
                             lp["down"]["scales4"], block_n=BN)
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
print(f"bn={BN}: chain {per*1e3:.2f} ms ({gb/per:.0f} GB/s; "
      f"lo={t_lo*1e3:.1f} hi={t_hi*1e3:.1f})", flush=True)
