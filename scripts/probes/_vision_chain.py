"""Chip probe: SigLIP 5-view anyres encode (+projector) device time.

Measures the vision share of the serving fixed part: the real
`multimodal._encode_views_jit` on [5, 3, 384, 384] bf16 views, n-delta
over an outer python loop with forced checksum fetches (each call is one
dispatch; the tunnel RPC cancels in the delta between rep counts).

Usage: python _vision_chain.py [--int8]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

assert jax.default_backend() != "cpu", jax.default_backend()
vision_int8 = "--int8" in sys.argv
print("backend:", jax.default_backend(), "int8:", vision_int8, flush=True)

from lavida_mod_tpu.config import LaViDaConfig
from lavida_mod_tpu.models import multimodal

cfg = LaViDaConfig()
shapes = jax.eval_shape(
    lambda k: multimodal.init_params(cfg, k, jnp.bfloat16),
    jax.random.PRNGKey(0))
# vision probe only needs the tower + projector: materializing the 8B
# bf16 LM alongside OOMs the 15.75G chip
shapes = {k: v for k, v in shapes.items() if k in ("siglip", "projector")}


@jax.jit
def build():
    import jax as _j

    def viz_q8_zero(tower):
        layers = {
            k: ({"kernel_q": jnp.zeros(v["kernel"].shape, jnp.int8),
                 "scale": jnp.zeros(v["kernel"].shape[::2], jnp.float32),
                 "bias": jnp.zeros(v["bias"].shape, v["bias"].dtype)}
                if "kernel" in v else _j.tree.map(
                    lambda sh: jnp.zeros(sh.shape, sh.dtype), v))
            for k, v in tower["layers"].items()
        }
        out = _j.tree.map(
            lambda sh: jnp.zeros(sh.shape, sh.dtype),
            {k: v for k, v in tower.items() if k != "layers"})
        return {**out, "layers": layers}

    return {
        k: (viz_q8_zero(v) if k == "siglip" and vision_int8
            else jax.tree.map(lambda sh: jnp.zeros(sh.shape, sh.dtype), v))
        for k, v in shapes.items()
    }


params = build()


def one(i):
    views = jnp.full((5, 3, 384, 384), 0.001 * i, jnp.bfloat16)
    out = multimodal._encode_views_jit(params, cfg, views, False, True,
                                       vision_int8)
    return float(jnp.sum(out))


t0 = time.perf_counter()
one(0)
print("compile+first:", round(time.perf_counter() - t0, 1), flush=True)

times = {}
for reps in (4, 12):
    t0 = time.perf_counter()
    for i in range(reps):
        one(i + 1)
    times[reps] = time.perf_counter() - t0
    print(f"n={reps}: {times[reps]/reps*1e3:.1f} ms/call", flush=True)
marg = (times[12] - times[4]) / 8
print(f"vision marginal (device) estimate: {marg*1e3:.1f} ms", flush=True)
