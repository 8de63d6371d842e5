"""Chip probe (measurement law v3): 32-layer prefill attention chain.

Inner fori_loop with a TRACED bound n; device time per 32-layer chain is
(t(hi)-t(lo))/(hi-lo) — the per-call tunnel RPC cancels in the delta.
Real dependency chain (q feeds forward) so XLA cannot DCE or hoist.

Usage: python _prefill_attn_v3.py {short|dense}
  short = ops/attention.flash_attention wrapper (routes to the one-shot
          short_attention kernel at S<=4096)
  dense = plain XLA dense attention at the same shape
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

variant = sys.argv[1] if len(sys.argv) > 1 else "short"
assert jax.default_backend() != "cpu", jax.default_backend()
print("backend:", jax.default_backend(), "variant:", variant, flush=True)

B, T, Hh, hd = 1, 1056, 32, 128
L = 32

from lavida_mod_tpu.ops.attention import dense_attention, flash_attention

fn = flash_attention if variant == "short" else dense_attention


@jax.jit
def chain(q, k, v, n):
    def body(_, q):
        for _ in range(L):
            o = fn(q, k, v) if variant == "dense" else fn(q, k, v, None, None)
            q = q + o * 1e-6
        return q

    return jax.lax.fori_loop(0, n, body, q)


rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, T, Hh, hd)), jnp.bfloat16)
k = q * 0.5
v = q * 0.25

t0 = time.perf_counter()
float(jnp.sum(chain(q, k, v, 2)))
print("compile+first:", round(time.perf_counter() - t0, 1), flush=True)
# warm both executables? same executable (n traced). warm again at n=2
float(jnp.sum(chain(q, k, v, 2)))

times = {}
for n in (4, 16):
    t0 = time.perf_counter()
    float(jnp.sum(chain(q, k, v, n)))
    times[n] = time.perf_counter() - t0
    print(f"n={n}: total {times[n]*1e3:.1f} ms", flush=True)
marg = (times[16] - times[4]) / 12
print(f"{variant} 32-layer chain device time: {marg*1e3:.2f} ms "
      f"({marg/L*1e3:.3f} ms/layer)", flush=True)
