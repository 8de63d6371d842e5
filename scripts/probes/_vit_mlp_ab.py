"""A/B: fused ViT-MLP Pallas kernel vs the XLA op chain on the real chip
(VERDICT r4 item 10 / weak #7: vision encode 27.5 ms vs ~15-17 ms
roofline; the untried structural lever).

Runs the full so400m tower forward over the serving 5-view batch both
ways, checks numeric parity, and times each amortized over >=20 chained
calls with checksums fetched inside the window (NOTES_ROUND3 law).

Run: python scripts/probes/_vit_mlp_ab.py [--iters 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import functools

    import jax.numpy as jnp
    import numpy as np

    from lavida_mod_tpu.config import LaViDaConfig
    from lavida_mod_tpu.models import siglip

    cfg = LaViDaConfig().vision.siglip  # so400m geometry
    params = siglip.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("fused",))
    def enc(params, views, fused):
        return siglip.forward(params, cfg, views, fused_mlp=fused)

    def views_for(i):
        return jnp.full((5, 3, cfg.image_size, cfg.image_size),
                        0.001 * i, jnp.bfloat16)

    # parity first
    a = enc(params, views_for(1), False)
    b = enc(params, views_for(1), True)
    diff = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                 - b.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(a.astype(jnp.float32))))

    def amortize(fused):
        float(jnp.sum(enc(params, views_for(0), fused)))
        t0 = time.perf_counter()
        sums = [jnp.sum(enc(params, views_for(i), fused))
                for i in range(1, args.iters + 1)]
        _ = [float(s) for s in sums]
        return (time.perf_counter() - t0) / args.iters * 1e3

    t_xla = amortize(False)
    t_fused = amortize(True)
    print(json.dumps({
        "xla_ms": round(t_xla, 2),
        "fused_mlp_ms": round(t_fused, 2),
        "speedup": round(t_xla / t_fused, 3),
        "max_abs_diff": diff, "out_scale": scale,
    }), flush=True)


if __name__ == "__main__":
    main()
