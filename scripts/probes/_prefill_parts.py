"""Chip probe: non-matmul prefill parts, each as a 32x chain.

Usage: python _prefill_parts.py {attn|vpu}
  attn = 32x flash_attention (the real 128-bucketed prefill wrapper) at
         [1, 1056, 32, 128]
  vpu  = 32x the per-layer elementwise work: 2 RMSNorm + RoPE(q,k) +
         act-int8 quant x4 + swiglu + 2 residuals, at prefill shape,
         NO matmuls

Matmul chain is measured by _w8a8_fused_chip.py; real full prefill by the
bench. n-delta protocol (marginal cost over extra reps).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

variant = sys.argv[1] if len(sys.argv) > 1 else "attn"
assert jax.default_backend() != "cpu", jax.default_backend()
print("backend:", jax.default_backend(), "variant:", variant, flush=True)

B, T, Hh, hd, D, H = 1, 1056, 32, 128, 4096, 12288
L = 32

if variant == "attn":
    from lavida_mod_tpu.ops.attention import flash_attention

    @jax.jit
    def one(q, k, v):
        for _ in range(L):
            o = flash_attention(q, k, v, None, None)
            q = q + o * 1e-6
        return q

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, Hh, hd)), jnp.bfloat16)
    args = (q, q * 0.5, q * 0.25)
else:
    from lavida_mod_tpu.ops.norms import apply_norm
    from lavida_mod_tpu.ops.rope import apply_rope, rope_tables

    sin, cos = rope_tables(hd, 4096, 500000.0)
    positions = jnp.arange(T, dtype=jnp.int32)
    wn = {"weight": jnp.ones((D,), jnp.bfloat16)}

    def quant(x):
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), -1, keepdims=True),
                         1e-8) / 127.0
        return jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8), sx

    @jax.jit
    def one(x, big):
        for _ in range(L):
            h = apply_norm(x, wn, "rms", rms_eps=1e-5, ln_eps=1e-5)
            x8, sx = quant(h)
            qkv = x8[:, :, :D].astype(jnp.bfloat16) * sx  # stand-in dequant
            q = qkv.reshape(B, T, Hh, hd)
            k = (qkv * 0.5).reshape(B, T, Hh, hd)
            q = apply_rope(q, positions, sin, cos, True)
            k = apply_rope(k, positions, sin, cos, True)
            a = (q + k).reshape(B, T, D)
            a8, asx = quant(a)
            x = x + a8.astype(jnp.bfloat16) * asx
            h2 = apply_norm(x, wn, "rms", rms_eps=1e-5, ln_eps=1e-5)
            h8, hsx = quant(h2)
            hh = big + h8[:, :, :1].astype(jnp.bfloat16) * hsx  # [B,T,2H] dep
            u, g = jnp.split(hh, 2, axis=-1)
            f = jax.nn.silu(g) * u
            f8, fsx = quant(f)
            x = x + f8[:, :, :D].astype(jnp.bfloat16) * fsx
        return x

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
    args = (x, jnp.asarray(rng.standard_normal((B, T, 2 * H)),
                           jnp.bfloat16))

t0 = time.perf_counter()
float(jnp.sum(one(*args)))
print("compile+first:", round(time.perf_counter() - t0, 1), flush=True)
times = {}
for reps in (6, 18):
    t0 = time.perf_counter()
    for i in range(reps):
        a0 = args[0] + i * 1e-6
        float(jnp.sum(one(a0, *args[1:])))
    times[reps] = time.perf_counter() - t0
    print(f"{variant} n={reps}: {times[reps]/reps*1e3:.1f} ms/call",
          flush=True)
marg = (times[18] - times[6]) / 12
print(f"{variant} marginal (device) estimate: {marg*1e3:.1f} ms", flush=True)
