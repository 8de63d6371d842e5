"""SHIRG selection latency vs its <30 ms budget (VERDICT r4 item 5).

The reference budgets SHIRG token selection at <30 ms (reference
CLAUDE.md:165,239; timing instrumentation siglip_shirg.py:233,363) for the
2-view pipeline: 448^2 global + foveal encode -> scoring -> top-724 ->
projector (980 tokens out).  This probe times the full jitted
shirg_encode chain per method on the real chip, amortized over >=20
chained calls with checksum outputs (NOTES_ROUND3 measurement law — the
axon tunnel executes async, per-call timings lie).

Decomposition: --stage tower|select splits the wall into the SigLIP
2-view encode (not SHIRG's doing; the anyres baseline pays 5 views of the
same kernel) and the selection machinery itself (scoring + fused top-k +
pool + projector) — the part the reference's budget governs.

Run: python scripts/probes/_shirg_latency.py [--methods base,full]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", default="base,entropy,edge,full")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--no-fused-vit", action="store_true",
                    help="keep the XLA op-chain MLP in the tower (the "
                         "fused ViT-MLP kernel wins standalone, "
                         "NOTES_ROUND6 A/B)")
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

    from lavida_mod_tpu.config import LaViDaConfig
    from lavida_mod_tpu.models import shirg as shirg_model
    from lavida_mod_tpu.models import siglip as siglip_model
    from lavida_mod_tpu.models.lavida import LaViDa

    cfg = LaViDaConfig()  # 8B/so400m geometry, bf16 tower
    model = LaViDa.zero_init(cfg, jnp.bfloat16, quantized=True)
    params = model.params

    fused = not args.no_fused_vit

    @functools.partial(jax.jit, static_argnames=("method",))
    def full(params, views, key, method):
        return shirg_model.shirg_encode(
            params, cfg, views, method=method,
            selection_params={"merge_similar": method == "full"}, key=key,
            fused_mlp=fused)

    @jax.jit
    def tower_only(params, views):
        return siglip_model.forward(params["siglip"], cfg.vision.siglip,
                                    views, fused_mlp=fused)

    def amortize(fn, *argfns):
        # warmup/compile, then one timed window of chained calls with the
        # checksums fetched inside the window
        float(jnp.sum(fn(*[a(0) for a in argfns])))
        t0 = time.perf_counter()
        sums = [jnp.sum(fn(*[a(i) for a in argfns]))
                for i in range(1, args.iters + 1)]
        _ = [float(s) for s in sums]
        return (time.perf_counter() - t0) / args.iters * 1e3  # ms

    def views_for(i):
        return jnp.full((2, 3, 448, 448), 0.001 * i, jnp.bfloat16)

    t_tower = amortize(tower_only, lambda i: params, views_for)
    rows = {"tower_2view_448_ms": round(t_tower, 2)}
    budget = 30.0
    for method in args.methods.split(","):
        t = amortize(
            functools.partial(full, method=method),
            lambda i: params, views_for,
            lambda i: jax.random.PRNGKey(i),
        )
        rows[f"shirg_{method}_ms"] = round(t, 2)
        rows[f"shirg_{method}_select_ms"] = round(t - t_tower, 2)
        rows[f"shirg_{method}_under_30ms_budget"] = bool(t < budget)
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
