"""Chip probe: batched-serving decomposition at B=4/8 (measurement law
v3, pipelined window).  Why does B=8 cost 0.347 s/image when B=4 costs
0.1865 — decode amortizes weights, so per-image cost should FALL?

Stages (each timed as a W-call pipelined window, checksums fetched
inside the wall):
  encode   = _encode_views_jit on 5*B views
  prefill  = encode + chunked prefill (chunk=4, ONE compile) into the
             merged [*, B, P, ...] cache
  full     = encode + generate_chunked_prefill (prefill + merged decode)

Usage: python _batch_decomp.py B [kv8] [mono]
  mono: use the monolithic diffusion.generate path (what bench runs at
        B<=4) instead of the chunked one, for the apples-to-apples diff.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
kv8 = "kv8" in sys.argv[2:]
mono = "mono" in sys.argv[2:]
assert jax.default_backend() != "cpu"
print(f"backend: {jax.default_backend()} B={B} kv8={kv8} mono={mono}",
      flush=True)

from lavida_mod_tpu.config import GenerationConfig, LaViDaConfig
from lavida_mod_tpu.generation import diffusion
from lavida_mod_tpu.models import llada as L
from lavida_mod_tpu.models import multimodal

cfg = LaViDaConfig()
lm_cfg = cfg.llada


# int4 zero LM + bf16 vision, exactly like bench.py --batch (int4 is the
# bench default; zero_init's int8 LM is 8.5G and OOMs next to the B=8
# cache — found the hard way, first probe run)
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


def unstacked_shapes(k):
    p = multimodal.init_params(cfg, k, jnp.bfloat16)
    p["llada"] = L.unstack_blocks(p["llada"])
    return p


shapes = jax.eval_shape(unstacked_shapes, jax.random.PRNGKey(0))
params = jax.jit(lambda: {
    k: (q4_zero(v) if k == "llada"
        else jax.tree.map(lambda sh: jnp.zeros(sh.shape, sh.dtype), v))
    for k, v in shapes.items()})()

rng = np.random.default_rng(0)
text_len = 48
ids = rng.integers(3, 30000, size=text_len + 1)
gen = GenerationConfig(max_new_tokens=32, block_length=32,
                       step_per_block=16, prefix_lm=True)


def make_prefix(i):
    views = jnp.full((5 * B, 3, 384, 384), 0.001 * i, jnp.bfloat16)
    feats = multimodal._encode_views_jit(params, cfg, views, False, True,
                                         False)
    D = feats.shape[-1]
    return jnp.concatenate(
        [feats.reshape(B, 5 * feats.shape[1], D),
         jnp.zeros((B, len(ids), D), jnp.bfloat16)], axis=1)


@jax.jit
def _lmfwd_jit(lp, emb):
    _, cache = L.forward(lp, lm_cfg, emb, use_cache=True,
                         return_logits=False, use_flash=True)
    return sum(jnp.sum(v[:, 0].astype(jnp.float32))
               for v in jax.tree.leaves(cache))


def run(variant, i):
    if variant in ("lmfwd", "lmchunk"):
        # LM-only on a [4, P] chunk: forward alone vs the full
        # _chunk_prefill_prealloc (zero buffers + prealloc'd-cache write
        # + merge DUS) — the diff is the cache-write machinery's cost
        C = min(4, B)
        P = 196 * 5 + text_len + 1
        emb = jnp.full((C, P, lm_cfg.d_model), 0.001 * i, jnp.bfloat16)
        if variant == "lmfwd":
            # MUST be jitted: a bare L.forward call runs eagerly through
            # the tunnel (one RPC per op; measured 5.4 s/call of pure
            # RPC — first probe run's garbage number)
            return _lmfwd_jit(params["llada"], emb)
        S = P + 32
        nL = len(params["llada"]["blocks"])
        Hkv, hd = lm_cfg.effective_n_kv_heads, lm_cfg.head_dim
        buf = jax.jit(lambda: [
            (jnp.zeros((C, S, Hkv, hd), jnp.bfloat16),
             jnp.zeros((C, S, Hkv, hd), jnp.bfloat16))
            for _ in range(nL)])()
        buf = diffusion._chunk_prefill_prealloc(
            buf, params["llada"], lm_cfg, emb, None, jnp.int32(0), True)
        return sum(jnp.sum(v[:, 0].astype(jnp.float32))
                   for v in jax.tree.leaves(buf))
    prefix = make_prefix(i)
    if variant == "encode":
        return jnp.sum(prefix[:, 0].astype(jnp.float32))
    if variant == "prefill":
        # the chunked-prefill loop alone (generate_chunked_prefill's
        # first half): merged cache built in place, no decode
        chunk = min(4, B)
        starts = list(range(0, B - chunk + 1, chunk))
        if starts[-1] + chunk < B:
            starts.append(B - chunk)
        shapes = jax.eval_shape(
            lambda p, e: diffusion.prefill(p, lm_cfg, e, None,
                                           use_flash=True),
            params["llada"], prefix[:chunk])
        cache = jax.tree.map(
            lambda s: jnp.zeros(s.shape[:1] + (B,) + s.shape[2:],
                                s.dtype), shapes)
        for lo in starts:
            cache = diffusion._prefill_into(
                cache, params["llada"], lm_cfg, prefix[lo:lo + chunk],
                None, jnp.int32(lo), True)
        # checksum REAL rows of every layer (zero-only slices get DCE'd)
        return sum(jnp.sum(v[:, 0].astype(jnp.float32))
                   for v in jax.tree.leaves(cache))
    if mono:
        out = diffusion.generate(params["llada"], lm_cfg, prefix, gen,
                                 use_flash_prefill=True, kv8=kv8)
    else:
        out = diffusion.generate_chunked_prefill(
            params["llada"], lm_cfg, prefix, gen, chunk=4,
            use_flash_prefill=True, kv8=kv8)
    return jnp.sum(out)


W = 10
results = {}
variants = (("lmfwd", "lmchunk") if "lm" in sys.argv[2:]
            else ("encode", "prefill", "full"))
for variant in variants:
    t0 = time.perf_counter()
    int(run(variant, 0))
    print(f"{variant} compile+first: {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    sums = [run(variant, i) for i in range(1, W + 1)]
    checks = [int(s) for s in sums]
    assert len(checks) == W
    results[variant] = (time.perf_counter() - t0) / W
    print(f"{variant}: {results[variant]*1e3:.1f} ms/batch "
          f"({results[variant]/B*1e3:.1f} ms/image)", flush=True)

if "encode" in results:
    enc = results["encode"]
    pre = results["prefill"] - enc
    dec = results["full"] - results["prefill"]
    print(f"\nB={B} kv8={kv8} mono={mono}: encode {enc*1e3:.0f} ms, "
          f"prefill {pre*1e3:.0f} ms, decode+glue {dec*1e3:.0f} ms "
          f"(per image: {enc/B*1e3:.1f} / {pre/B*1e3:.1f} / "
          f"{dec/B*1e3:.1f})", flush=True)
else:
    print(f"\ncache-write machinery: "
          f"{(results['lmchunk']-results['lmfwd'])*1e3:.1f} ms/chunk",
          flush=True)
