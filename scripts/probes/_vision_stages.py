"""Chip probe: vision encode stage decomposition (measurement law v3).

_vision_chain measured 76.6 ms for the full 5-view encode but the
26-layer tower body alone is 39 ms (_vision_decomp) — this probe finds
the other half. Each stage runs as an n-delta fori_loop chain with a
value dependency so XLA cannot hoist or DCE.

Usage: python _vision_stages.py {forward|proj|pool|full}
  forward = siglip.forward on pixels (patchify + embed + pos + 26-layer scan)
  proj    = projector mlp2x on [5,729,1152]
  pool    = pool_2d on [5,729,4096]
  full    = multimodal.encode_views (tower + projector + pool)
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

variant = sys.argv[1] if len(sys.argv) > 1 else "full"
assert jax.default_backend() != "cpu", jax.default_backend()
print("backend:", jax.default_backend(), "variant:", variant, flush=True)

from lavida_mod_tpu.config import LaViDaConfig
from lavida_mod_tpu.models import multimodal, projector, siglip
from lavida_mod_tpu.ops.pooling import pool_2d

cfg = LaViDaConfig()
shapes = jax.eval_shape(
    lambda k: multimodal.init_params(cfg, k, jnp.bfloat16),
    jax.random.PRNGKey(0))
shapes = {k: v for k, v in shapes.items() if k in ("siglip", "projector")}
params = jax.jit(
    lambda: jax.tree.map(lambda sh: jnp.zeros(sh.shape, sh.dtype), shapes)
)()

views = jnp.full((5, 3, 384, 384), 0.001, jnp.bfloat16)
rng = np.random.default_rng(0)
feats1152 = jnp.asarray(rng.standard_normal((5, 729, 1152)) * 0.01,
                        jnp.bfloat16)
feats4096 = jnp.asarray(rng.standard_normal((5, 729, 4096)) * 0.01,
                        jnp.bfloat16)


def stage(s):
    if variant == "forward":
        return siglip.forward(params["siglip"], cfg.vision.siglip,
                              views * (1.0 + s))
    if variant == "proj":
        return projector.forward(params["projector"],
                                 cfg.vision.projector_type,
                                 feats1152 * (1.0 + s))
    if variant == "pool":
        return pool_2d(feats4096 * (1.0 + s),
                       cfg.vision.spatial_pool_mode,
                       cfg.vision.spatial_pool_stride)
    return multimodal.encode_views(params, cfg, views * (1.0 + s))


@jax.jit
def chain(n):
    def body(_, s):
        out = stage(s)
        return jnp.sum(out).astype(jnp.float32) * 1e-30

    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))


t0 = time.perf_counter()
float(chain(2))
print("compile+first:", round(time.perf_counter() - t0, 1), flush=True)
float(chain(2))

times = {}
for n in (4, 12):
    t0 = time.perf_counter()
    float(chain(n))
    times[n] = time.perf_counter() - t0
    print(f"n={n}: total {times[n]*1e3:.1f} ms", flush=True)
marg = (times[12] - times[4]) / 8
print(f"{variant} device time: {marg*1e3:.2f} ms", flush=True)
