"""Chip probe: 32-layer W8A8 matmul chain at prefill shape —
XLA linear_act_int8 vs the fused Pallas kernel (ops/pallas_w8.py).

Usage: python _w8a8_fused_chip.py {xla|pallas} [block_t block_n]

Protocol (measurement law v3): inner fori_loop with TRACED bound n; the
device time per 32-layer chain is (t(n_hi)-t(n_lo))/(hi-lo) of single
calls — per-call tunnel RPC cancels in the delta.  s8 MXU peak on v5e:
394 TOPS -> 14.7 TFLOP chain floor = 37 ms bf16 / 17.5 ms s8-ideal...
practical ceiling measured by the xla variant itself.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

variant = sys.argv[1] if len(sys.argv) > 1 else "pallas"

assert jax.default_backend() != "cpu", jax.default_backend()
print("backend:", jax.default_backend(), "variant:", variant, flush=True)

D, H, M, L = 4096, 12288, 1056, 32


@jax.jit
def build():
    def w8(k, n):
        return {"kernel_q": jnp.zeros((k, n), jnp.int8),
                "scale": jnp.full((n,), 1e-4, jnp.float32)}
    return [{
        "qkv": w8(D, 3 * D), "o": w8(D, D),
        "ff": w8(D, 2 * H), "down": w8(H, D),
    } for _ in range(L)]


layers = build()

if variant == "xla":
    from lavida_mod_tpu.ops.quant import linear_act_int8 as lin
else:
    from lavida_mod_tpu.ops.pallas_w8 import linear_w8a8 as lin


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
print(f"{variant}: chain device time {per*1e3:.1f} ms  "
      f"{flops/per/1e12:.0f} TOPS (lo={t_lo*1e3:.1f} hi={t_hi*1e3:.1f})",
      flush=True)
