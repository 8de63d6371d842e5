"""Chip probe: 32-layer W8A8 matmul chain at prefill shape —
XLA linear_act_int8 vs the fused Pallas kernel (ops/pallas_w8.py).

Usage: python _w8a8_fused_chip.py {xla|pallas} [block_t block_n]
One variant per process (remote-compile hygiene, NOTES_ROUND4).
Protocol: zeros weights (latency value-independent), n-delta timing via
repeated calls with a real data dependency + forced host checksum fetch.
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
block_t = int(sys.argv[2]) if len(sys.argv) > 2 else 384
block_n = int(sys.argv[3]) if len(sys.argv) > 3 else 512

assert jax.default_backend() != "cpu", jax.default_backend()
print("backend:", jax.default_backend(), "variant:", variant,
      block_t, block_n, flush=True)

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
    import functools

    from lavida_mod_tpu.ops.pallas_w8 import linear_w8a8

    lin = functools.partial(linear_w8a8)


@jax.jit
def one(layers, x):
    for lp in layers:
        qkv = lin(x, lp["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = q + k * 0.5 + v * 0.25      # stand-in for attention
        x = x + lin(a, lp["o"])
        h = lin(x, lp["ff"])
        hh, gate = jnp.split(h, 2, axis=-1)
        x = x + lin(jax.nn.silu(gate) * hh, lp["down"])
    return x


rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((M, D)), jnp.bfloat16)
t0 = time.perf_counter()
float(jnp.sum(one(layers, x0)))
print("compile+first:", round(time.perf_counter() - t0, 1), flush=True)
for reps in (6, 18):
    t0 = time.perf_counter()
    for i in range(reps):
        float(jnp.sum(one(layers, x0 + i * 1e-6)))
    per = (time.perf_counter() - t0) / reps
    print(f"{variant} 32-layer chain n={reps}: {per*1e3:.1f} ms/call",
          flush=True)
flops = 2 * M * L * (D * 3 * D + D * D + D * 2 * H + H * D)
print(f"-> {flops/per/1e12:.0f} TOPS-equiv (chain incl RPC)", flush=True)
