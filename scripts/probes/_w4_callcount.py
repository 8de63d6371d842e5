"""Chip probe: is the decode w4 chain's 572-GB/s ceiling per-CALL
overhead or in-kernel inefficiency?

Compares, at equal total weight bytes (~3.5 GB int4-packed):
  many:  the real per-layer call pattern — 128 w4_matmul_grouped calls
         of LLaDA decode shapes (what the model does; measured 572 GB/s)
  few:   8 giant calls [32, 4096] x [4096, 110592] — same bytes, 16x
         fewer pallas_call dispatches and grid re-entries

If `few` approaches the 819 GB/s HBM floor, the gap is dispatch/ramp
overhead and a fused decode-layer megakernel is the right fix; if it
stays ~570, the kernel's inner loop (group dots + f32 scale-accumulate)
is the binding constraint and block-level tuning is the lever.

Protocol: measurement law v3 (inner fori_loop, traced bound, n-delta).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

variant = sys.argv[1] if len(sys.argv) > 1 else "few"
assert jax.default_backend() != "cpu", jax.default_backend()
print("backend:", jax.default_backend(), "variant:", variant, flush=True)

from lavida_mod_tpu.ops.pallas_w4 import w4_matmul_grouped  # noqa: E402

D, H, L, T = 4096, 12288, 32, 32


@jax.jit
def build():
    def w4(k, n):
        return {"kernel_p4": jnp.zeros((k // 2, n), jnp.int8),
                "scales4": jnp.zeros((k // 128, n), jnp.float32)}
    if variant == "few":
        return [w4(D, 110592) for _ in range(8)]
    return [{
        "qkv": w4(D, 3 * D), "o": w4(D, D),
        "ff": w4(D, 2 * H), "down": w4(H, D),
    } for _ in range(L)]


layers = build()

if variant == "few":
    gb = 8 * (D * 110592) / 2 / 1e9
else:
    gb = L * (D * 3 * D + D * D + D * 2 * H + H * D) / 2 / 1e9
print(f"total weight bytes: {gb:.2f} GB", flush=True)


@jax.jit
def chain(layers, x, n):
    def body(i, x):
        x = x + i * 1e-9
        if variant == "few":
            for p in layers:
                y = w4_matmul_grouped(x, p["kernel_p4"], p["scales4"])
                # fold a slice back so the next call depends on this one
                x = x + y[:, :D] * 1e-9
        else:
            for lp in layers:
                qkv = w4_matmul_grouped(
                    x, lp["qkv"]["kernel_p4"], lp["qkv"]["scales4"])
                q, k, v = jnp.split(qkv, 3, axis=-1)
                a = q + k * 0.5 + v * 0.25
                x = x + w4_matmul_grouped(
                    a, lp["o"]["kernel_p4"], lp["o"]["scales4"])
                h = w4_matmul_grouped(
                    x, lp["ff"]["kernel_p4"], lp["ff"]["scales4"])
                hh, gate = jnp.split(h, 2, axis=-1)
                x = x + w4_matmul_grouped(
                    jax.nn.silu(gate) * hh,
                    lp["down"]["kernel_p4"], lp["down"]["scales4"])
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
