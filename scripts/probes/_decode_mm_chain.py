"""Chip probe: decode-step matmul chain at T=32 — what fraction of the
int4 weight-read floor does the W4A8 kernel achieve?

Usage: python _decode_mm_chain.py {w4|w4h|xla8}

Protocol (measurement law v3): the 32-layer chain repeats n times INSIDE
one executable via fori_loop with a TRACED bound (one executable for all
n), and the device time per chain is the delta (t(n_hi)-t(n_lo))/(hi-lo)
of single-call walls — per-call RPC round trips cancel in the delta.
(Per-call timings through the async axon tunnel carry ~15-40 ms of RPC;
deltas over separate python calls do NOT cancel it — that poisoned the
first version of this probe.)

Floors at 819 GB/s: blocks 3.49 GB -> 4.26 ms; +head 259 MB -> 4.58.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

variant = sys.argv[1] if len(sys.argv) > 1 else "w4"

assert jax.default_backend() != "cpu", jax.default_backend()
print("backend:", jax.default_backend(), "variant:", variant, flush=True)

D, H, V, L, T = 4096, 12288, 126464, 32, 32


@jax.jit
def build():
    def w4(k, n):
        return {"kernel_p4": jnp.zeros((k // 2, n), jnp.int8),
                "scales4": jnp.zeros((k // 128, n), jnp.float32)}

    def w8(k, n):
        return {"kernel_q": jnp.zeros((k, n), jnp.int8),
                "scale": jnp.zeros((n,), jnp.float32)}
    mk = w8 if variant == "xla8" else w4
    layers = [{
        "qkv": mk(D, 3 * D), "o": mk(D, D),
        "ff": mk(D, 2 * H), "down": mk(H, D),
    } for _ in range(L)]
    head = mk(D, V)
    return layers, head


layers, head = build()

from lavida_mod_tpu.ops.quant import linear  # noqa: E402


@jax.jit
def chain(layers, head, x, n):
    def body(i, x):
        x = x + i * 1e-9
        for lp in layers:
            qkv = linear(x, lp["qkv"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            a = q + k * 0.5 + v * 0.25
            x = x + linear(a, lp["o"])
            h = linear(x, lp["ff"])
            hh, gate = jnp.split(h, 2, axis=-1)
            x = x + linear(jax.nn.silu(gate) * hh, lp["down"])
        if variant == "w4h":
            logits = linear(x, head, preferred=jnp.float32)
            tok = jnp.argmax(logits, axis=-1)
            x = x + tok[:, None].astype(x.dtype) * 1e-9
        return x * 0.999
    return jax.lax.fori_loop(0, n, body, x)


rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
t0 = time.perf_counter()
float(jnp.sum(chain(layers, head, x0, 2)))
print("compile+first:", round(time.perf_counter() - t0, 1), flush=True)

gb = L * (D * 3 * D + D * D + D * 2 * H + H * D) / 2 / 1e9
if variant == "w4h":
    gb += D * V / 2 / 1e9
if variant == "xla8":
    gb *= 2


def timed(n, reps=3):
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(chain(layers, head, x0 + i * 1e-6, n)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


t_lo, t_hi = timed(2), timed(10)
per = (t_hi - t_lo) / 8
print(f"{variant}: chain device time {per*1e3:.2f} ms "
      f"({gb/per:.0f} GB/s on {gb:.2f} GB weights; "
      f"lo={t_lo*1e3:.1f} hi={t_hi*1e3:.1f})", flush=True)
