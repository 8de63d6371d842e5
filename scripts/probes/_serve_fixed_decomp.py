"""Chip probe: serve fixed-part decomposition (measurement law v3).

Stages of the single-dispatch serve graph, each as an n-delta fori_loop
chain with a views->output dependency:

  encode   = multimodal_embeds (vision tower + projector + pool + splice)
  prefill  = encode + 32-layer cached prefill (flash) + ln? (no logits)
  pad      = prefill + the per-layer [P]->[P+G] cache pad list
  (full16 comes from bench.py)

Usage: python _serve_fixed_decomp.py {encode|prefill|pad}
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

variant = sys.argv[1] if len(sys.argv) > 1 else "encode"
assert jax.default_backend() != "cpu"
print("backend:", jax.default_backend(), "variant:", variant, flush=True)

from lavida_mod_tpu.config import LaViDaConfig
from lavida_mod_tpu.models import llada as L
from lavida_mod_tpu.models import multimodal

cfg = LaViDaConfig()
lm_cfg = cfg.llada

# int4 zero LM + bf16 vision, exactly like bench.py


def q4_zero(d):
    from lavida_mod_tpu.ops.pallas_w4 import padded_in_dim
    if isinstance(d, list):
        return [q4_zero(x) for x in d]
    if isinstance(d, dict):
        if "kernel" in d and len(d["kernel"].shape) == 2:
            K, N = d["kernel"].shape
            Np = -(-N // 512) * 512
            K = padded_in_dim(K)
            out = {"kernel_p4": jnp.zeros((K // 2, Np), jnp.int8),
                   "scales4": jnp.zeros((K // 128, Np), jnp.float32)}
            if Np != N:
                out[f"__trim_{N}__"] = ()
            if "bias" in d:
                out["bias"] = jnp.zeros(d["bias"].shape, d["bias"].dtype)
            return out
        return {k: q4_zero(v) for k, v in d.items()}
    return jnp.zeros(d.shape, d.dtype)


def build():
    return {k: (q4_zero(v) if k == "llada"
                else jax.tree.map(
                    lambda sh: jnp.zeros(sh.shape, sh.dtype), v))
            for k, v in shapes.items()}


def unstacked_shapes(k):
    p = multimodal.init_params(cfg, k, jnp.bfloat16)
    p["llada"] = L.unstack_blocks(p["llada"])
    return p


shapes = jax.eval_shape(unstacked_shapes, jax.random.PRNGKey(0))
params = jax.jit(build)()

rng = np.random.default_rng(0)
text_ids = rng.integers(3, 30000, size=48)
ids = np.concatenate([text_ids[:8], [-200], text_ids[8:]])
gather_idx, text_ids_p, valid, _ = multimodal.build_gather_plan(
    cfg, [ids], [[5]], [[(640, 640)]])
gather_idx = jnp.asarray(gather_idx)
text_ids_p = jnp.asarray(text_ids_p)
G = 32


def stage(params, views):
    prefix = multimodal.multimodal_embeds(params, cfg, views, text_ids_p,
                                          gather_idx)
    if variant == "encode":
        return jnp.sum(prefix.astype(jnp.float32))
    _, cache = L.forward(params["llada"], lm_cfg, prefix, use_cache=True,
                         return_logits=False, use_flash=True)
    if variant == "prefill":
        return jnp.sum(cache["k"][-1].astype(jnp.float32))
    cache_l = [
        (jnp.pad(cache["k"][li], ((0, 0), (0, G), (0, 0), (0, 0))),
         jnp.pad(cache["v"][li], ((0, 0), (0, G), (0, 0), (0, 0))))
        for li in range(cache["k"].shape[0])
    ]
    # checksum REAL rows from every layer — summing only pad rows (all
    # zero) lets XLA DCE the whole prefill (observed: "-0.18 ms")
    return sum(jnp.sum(k[:, 0].astype(jnp.float32)) +
               jnp.sum(v[:, 0].astype(jnp.float32))
               for k, v in cache_l)


@jax.jit
def chain(params, n):
    # params as an ARGUMENT: closing over the ~5.6GB tree bakes it into
    # the lowering as captured constants (10+ min compiles, bench.py
    # learned the same lesson)
    def body(i, s):
        views = jnp.full((5, 3, 384, 384), 1e-9 * s + 0.001, jnp.bfloat16)
        return stage(params, views) * 1e-20

    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))


t0 = time.perf_counter()
float(chain(params, 2))
print("compile+first:", round(time.perf_counter() - t0, 1), flush=True)
times = {}
for n in (4, 12):
    t0 = time.perf_counter()
    float(chain(params, n))
    times[n] = time.perf_counter() - t0
    print(f"n={n}: total {times[n]*1e3:.1f} ms", flush=True)
marg = (times[12] - times[4]) / 8
print(f"{variant} device time: {marg*1e3:.2f} ms", flush=True)
