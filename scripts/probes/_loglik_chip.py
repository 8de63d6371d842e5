"""MC-loglikelihood on-chip cost at real MMMU geometry (VERDICT r4
item 4): P=1061 prefix, 300-token answer, mc_num=16 — one [16, 1361]
non-causal forward per doc (reference eval adapter llava_llada.py:277-409,
answer truncation :322).

Times `_mc_round` over the serving layouts `eval --quant` actually ships:
  int8      — what `--quant int8` passes to get_log_likelihood
  int4fused — `--quant int4` (fused layout, W4 kernels)
(mixed rides the int8 tree via adapter.py's prefill_params routing — the
estimator is prefill-shaped, so "mixed" == the int8 row here.)

Amortized >=20 chained calls, checksums fetched inside the window
(NOTES_ROUND3 law).  Running at the full co-resident serving geometry on
the chip doubles as the fit check: if the [16,1361] forward + layout
didn't fit next to the weights, this OOMs loudly.

Run: python scripts/probes/_loglik_chip.py [--mc-num 16] [--iters 20]
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
    ap.add_argument("--mc-num", type=int, default=16)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--prefix", type=int, default=1061)
    ap.add_argument("--answer", type=int, default=300)
    ap.add_argument("--layouts", default="int8,int4fused,int8+a8",
                    help="comma list; '+a8' suffix = act_int8 W8A8 "
                         "prefill kernels (the opt-in speed knob)")
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

    import jax.numpy as jnp
    import numpy as np

    from lavida_mod_tpu.config import LaViDaConfig
    from lavida_mod_tpu.generation.log_likelihood import _mc_round
    from lavida_mod_tpu.models import llada as jl

    base_cfg = LaViDaConfig().llada   # 8B geometry
    rng = np.random.default_rng(0)
    answer = jnp.asarray(rng.integers(5, 30000, size=args.answer))

    def zero_layout(kind):
        """Serving-layout zero trees straight from shapes (zeros: latency
        is weight-value independent; materializing 16G of random weights
        next to the quantized copy OOMs one v5e — bench.py convention)."""
        def build(k):
            p = jl.init_params(base_cfg, k, jnp.bfloat16)
            p = {"llada": jl.unstack_blocks(p)}
            if kind == "int4fused":
                p["llada"], fcfg = jl.to_fused_layout(p["llada"], base_cfg)
            return p

        shapes = jax.eval_shape(build, jax.random.PRNGKey(0))["llada"]
        cfg = (base_cfg if kind == "int8" else base_cfg.replace(
            block_type="sequential", activation="swiglu",
            mlp_hidden_size=2 * base_cfg.hidden_size))

        def q_zero(d, bits):
            if isinstance(d, list):
                return [q_zero(x, bits) for x in d]
            if isinstance(d, dict):
                if "kernel" in d and len(d["kernel"].shape) == 2:
                    K, N = d["kernel"].shape
                    if bits == 8:
                        out = {"kernel_q": jnp.zeros((K, N), jnp.int8),
                               "scale": jnp.zeros((N,), jnp.float32)}
                    else:
                        from lavida_mod_tpu.ops.pallas_w4 import \
                            padded_in_dim

                        Np = -(-N // 512) * 512
                        Kp = padded_in_dim(K)
                        out = {"kernel_p4": jnp.zeros((Kp // 2, Np),
                                                      jnp.int8),
                               "scales4": jnp.zeros((Kp // 128, Np),
                                                    jnp.float32)}
                        if Np != N:
                            out[f"__trim_{N}__"] = ()
                    if "bias" in d:
                        out["bias"] = jnp.zeros(d["bias"].shape,
                                                d["bias"].dtype)
                    return out
                return {k: q_zero(v, bits) for k, v in d.items()}
            return jnp.zeros(d.shape, d.dtype)

        bits = 8 if kind == "int8" else 4
        params = jax.jit(lambda: q_zero(shapes, bits))()
        return params, cfg

    results = {}
    for kind in args.layouts.split(","):
        act = kind.endswith("+a8")
        params, cfg = zero_layout(kind[:-3] if act else kind)
        prefix = jnp.zeros((1, args.prefix, cfg.d_model), jnp.bfloat16)
        rounds = max(args.mc_num // args.batch_size, 1)

        def one_doc(i):
            tot = 0.0
            for r in range(rounds):
                # use_flash mirrors get_log_likelihood's auto default
                # (dense scores are 14.5G of temps at this geometry)
                tot += _mc_round(params, cfg, prefix, answer,
                                 jax.random.PRNGKey(i * 131 + r),
                                 args.batch_size,
                                 use_flash=jax.default_backend() == "tpu",
                                 act_int8=act,
                                 forward_chunk=4 if act else 8)
            return tot

        float(one_doc(0))  # compile
        t0 = time.perf_counter()
        sums = [one_doc(i) for i in range(1, args.iters + 1)]
        _ = [float(s) for s in sums]
        s_doc = (time.perf_counter() - t0) / args.iters
        results[f"s_per_doc_{kind}"] = round(s_doc, 4)
        # incremental: a later layout's compile OOM must not eat this row
        print(json.dumps({f"s_per_doc_{kind}": round(s_doc, 4)}),
              flush=True)
        del params
    results.update({
        "mc_num": args.mc_num, "batch_size": args.batch_size,
        "prefix": args.prefix, "answer_len": args.answer,
    })
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
