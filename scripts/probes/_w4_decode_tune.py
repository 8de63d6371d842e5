"""Chip probe: w4 kernel block/semantics tuning at the REAL decode
call pattern (128 calls of LLaDA shapes; baseline 572 GB/s, giant-call
ceiling 674, HBM floor 819 — scripts/probes/_w4_callcount.py).

Variants (argv[1]):
  base    block_n=512  (the shipped config)
  bn1024  block_n=1024 (half the n-grid steps -> less per-step overhead)
  bn2048  block_n=2048 (VMEM-bounded maximum)
  dsem    block_n=512 + dimension_semantics=(parallel,parallel,arbitrary)
  bn1024d block_n=1024 + dimension_semantics

Protocol: measurement law v3 (inner fori_loop, real dependency chain,
n-delta, forced checksum fetch).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

variant = sys.argv[1] if len(sys.argv) > 1 else "bn1024"
block_n = {"base": 512, "bn1024": 1024, "bn2048": 2048,
           "dsem": 512, "bn1024d": 1024}[variant]
dsem = variant in ("dsem", "bn1024d")
assert jax.default_backend() != "cpu", jax.default_backend()
print("backend:", jax.default_backend(), "variant:", variant, flush=True)

from lavida_mod_tpu.ops.pallas_w4 import w4_matmul_grouped  # noqa: E402

D, H, L, T = 4096, 12288, 32, 32


@jax.jit
def build():
    def w4(k, n):
        return {"kernel_p4": jnp.zeros((k // 2, n), jnp.int8),
                "scales4": jnp.zeros((k // 128, n), jnp.float32)}
    return [{
        "qkv": w4(D, 3 * D), "o": w4(D, D),
        "ff": w4(D, 2 * H), "down": w4(H, D),
    } for _ in range(L)]


layers = build()
gb = L * (D * 3 * D + D * D + D * 2 * H + H * D) / 2 / 1e9
print(f"total weight bytes: {gb:.2f} GB", flush=True)


def mm(x, p):
    return w4_matmul_grouped(x, p["kernel_p4"], p["scales4"],
                             block_n=block_n, dim_semantics=dsem)


@jax.jit
def chain(layers, x, n):
    def body(i, x):
        x = x + i * 1e-9
        for lp in layers:
            qkv = mm(x, lp["qkv"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            a = q + k * 0.5 + v * 0.25
            x = x + mm(a, lp["o"])
            h = mm(x, lp["ff"])
            hh, gate = jnp.split(h, 2, axis=-1)
            x = x + mm(jax.nn.silu(gate) * hh, lp["down"])
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
print(f"{variant}: chain device time {per*1e3:.2f} ms "
      f"({gb/per:.0f} GB/s on {gb:.2f} GB; "
      f"lo={t_lo*1e3:.1f} hi={t_hi*1e3:.1f})", flush=True)
