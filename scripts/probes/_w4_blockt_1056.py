"""Chip probe: w4_matmul_grouped block_t sweep at the REAL prefill T=1056.

The old heuristic picked 288 (assuming T=1152), padding 1056 -> 1152:
+9% dead rows and 4 t-sweeps of weight re-convert.  Sweep divisors.

Usage: python _w4_blockt_1056.py <block_t>
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

bt = int(sys.argv[1]) if len(sys.argv) > 1 else 528
assert jax.default_backend() != "cpu"
print("backend:", jax.default_backend(), "block_t:", bt, flush=True)

from lavida_mod_tpu.ops.pallas_w4 import w4_matmul_grouped

T, D, H, L = 1056, 4096, 12288, 32
qkv_p = jnp.zeros((D // 2, 3 * D), jnp.int8)
qkv_s = jnp.zeros((D // 128, 3 * D), jnp.float32)
o_p = jnp.zeros((D // 2, D), jnp.int8)
o_s = jnp.zeros((D // 128, D), jnp.float32)
ff_p = jnp.zeros((D // 2, 2 * H), jnp.int8)
ff_s = jnp.zeros((D // 128, 2 * H), jnp.float32)
dn_p = jnp.zeros((H // 2, D), jnp.int8)
dn_s = jnp.zeros((H // 128, D), jnp.float32)


@jax.jit
def chain(x, n):
    def body(_, x):
        h = x
        for _ in range(L):
            qkv = w4_matmul_grouped(h, qkv_p, qkv_s, block_t=bt)
            h = h + w4_matmul_grouped(qkv[:, :D], o_p, o_s,
                                      block_t=bt) * 1e-6
            ff = w4_matmul_grouped(h, ff_p, ff_s, block_t=bt)
            h = h + w4_matmul_grouped(ff[:, :H], dn_p, dn_s,
                                      block_t=bt) * 1e-6
        return h

    return jax.lax.fori_loop(0, n, body, x)


rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)

t0 = time.perf_counter()
float(jnp.sum(chain(x, 1)))
print("compile+first:", round(time.perf_counter() - t0, 1), flush=True)

times = {}
for n in (2, 6):
    t0 = time.perf_counter()
    float(jnp.sum(chain(x, n)))
    times[n] = time.perf_counter() - t0
    print(f"n={n}: total {times[n]*1e3:.1f} ms", flush=True)
marg = (times[6] - times[2]) / 4
tf = 2 * T * (3 * D * D + D * D + 2 * D * H + H * D) * L / 1e12
print(f"block_t={bt}: {marg*1e3:.2f} ms/chain = {tf/marg:.0f} TOPS",
      flush=True)
