"""Chip probe: fused decode-layer chain at LLaDA vs Dream geometry.

Decode steps-deltas say Dream pays ~0.27 ms/layer vs LLaDA's ~0.17
against similar weight floors (0.145 vs 0.153 ms) — this isolates the
3-kernel chain (w4_qkv_norm + w4_matmul_res + w4_ffn_fused) at T=32 to
see whether the loss is in the kernels or the surrounding step.

Usage: python _fused_chain_geom.py {llada|dream}
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

geom = sys.argv[1] if len(sys.argv) > 1 else "dream"
assert jax.default_backend() != "cpu"
print("backend:", jax.default_backend(), "geom:", geom, flush=True)

from lavida_mod_tpu.ops.w4_fused import w4_ffn_fused, w4_matmul_res, \
    w4_qkv_norm

T = 32
if geom == "llada":
    D, Nqkv, H, Hd, L = 4096, 3 * 4096, 12288, 12288, 32
    qkv_bias = None
else:
    D, Nqkv, H, Hd, L = 3584, 4608, 18944, 20480, 28
    qkv_bias = jnp.zeros((Nqkv,), jnp.bfloat16)

w_qkv = jnp.zeros((D // 2, Nqkv), jnp.int8)
s_qkv = jnp.zeros((D // 128, Nqkv), jnp.float32)
w_o = jnp.zeros((D // 2, D), jnp.int8)
s_o = jnp.zeros((D // 128, D), jnp.float32)
w_up = jnp.zeros((D // 2, 2 * H), jnp.int8)
s_up = jnp.zeros((D // 128, 2 * H), jnp.float32)
w_dn = jnp.zeros((Hd // 2, D), jnp.int8)
s_dn = jnp.zeros((Hd // 128, D), jnp.float32)
nw = jnp.ones((D,), jnp.bfloat16)

wbytes = (w_qkv.size + w_o.size + w_up.size + w_dn.size)


@jax.jit
def chain(x, n):
    def body(_, x):
        h = x
        for _ in range(L):
            qkv = w4_qkv_norm(h, nw, w_qkv, s_qkv, bias=qkv_bias,
                              eps=1e-5)
            h = w4_matmul_res(qkv[:, :D], h, w_o, s_o)
            h = w4_ffn_fused(h, nw, w_up, s_up, w_dn, s_dn, eps=1e-5)
        return h

    return jax.lax.fori_loop(0, n, body, x)


rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)

t0 = time.perf_counter()
float(jnp.sum(chain(x, 2)))
print("compile+first:", round(time.perf_counter() - t0, 1), flush=True)

times = {}
for n in (4, 16):
    t0 = time.perf_counter()
    float(jnp.sum(chain(x, n)))
    times[n] = time.perf_counter() - t0
    print(f"n={n}: total {times[n]*1e3:.1f} ms", flush=True)
marg = (times[16] - times[4]) / 12
floor = L * wbytes / 819e9
print(f"{geom} {L}-layer fused chain: {marg*1e3:.2f} ms "
      f"(floor {floor*1e3:.2f} ms, {marg/floor:.2f}x, "
      f"{L*wbytes/marg/1e9:.0f} GB/s)", flush=True)
