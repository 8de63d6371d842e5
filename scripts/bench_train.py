#!/usr/bin/env python
"""Training-step throughput on real hardware (single chip).

The inference headline (bench.py) covers serving; this measures the
TRAINING path — the real `train/step.py` step (diffusion loss with
complementary masking, Pallas prefix-LM flash attention, whole-layer
remat, adamw) — at a model size that fits one v5e's 15.75G with
optimizer state (the 8B stage-2 plan needs fsdp=8; its AOT memory table
lives in NOTES_ROUND3.md and scripts/probes/_aot_memory.py).

Reference counterpart: the HF-Trainer loop of train.py (SURVEY.md §2.5);
the reference publishes no tokens/s, so this row is self-baselined — it
documents achieved MFU on TPU and guards against regressions.

Protocol: pipelined steps (donated params/opt_state chain the steps on
device; one loss checksum forces completion), wall over N steps after a
2-step warmup.  Prints ONE json line like bench.py.

Usage: python scripts/bench_train.py [--steps 16] [--batch 4] [--seq 1024]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--d-model", type=int, default=2048)
    ap.add_argument("--mlp", type=int, default=6144)
    ap.add_argument("--remat", default="whole_layer",
                    help="activation-checkpointing strategy: whole_layer "
                         "/ dots_nobatch / dots / none (models/llada.py "
                         "remat ladder).  Swept on v5e at the default "
                         "config: whole_layer 50.2%% MFU > dots_nobatch "
                         "47.1%% ~= dots 47.1%% (recompute FLOPs beat "
                         "the HBM traffic of stashed activations); none "
                         "OOMs — whole_layer is the default for a reason")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from lavida_mod_tpu.config import LaViDaConfig, LLaDAConfig
    from lavida_mod_tpu.models import llada as L
    from lavida_mod_tpu.train.step import jit_train_step, make_train_step

    lm = LLaDAConfig(
        vocab_size=32000, d_model=args.d_model, n_layers=args.layers,
        n_heads=args.d_model // 128, n_kv_heads=args.d_model // 128,
        mlp_hidden_size=args.mlp, block_type="llama", activation="silu",
        max_sequence_length=max(4096, args.seq), weight_tying=True,
    )
    cfg = LaViDaConfig(llada=lm)

    import optax
    params = L.init_params(lm, jax.random.PRNGKey(0), jnp.bfloat16)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)

    on_tpu = jax.default_backend() == "tpu"
    remat = False if args.remat == "none" else args.remat
    step = jit_train_step(make_train_step(
        cfg, opt,
        prefix_lm=True, remat=remat,
        attention_impl="prefix_flash" if on_tpu else "dense",
    ))

    B, S, D = args.batch, args.seq, args.d_model
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 31000, (B, S)), jnp.int32)
    labels = np.asarray(ids).copy()
    labels[:, : S // 4] = -100  # prompt region (prefix-LM mask)
    batch = {
        "inputs_embeds": L.embed_tokens(params, ids),
        "labels": jnp.asarray(labels),
    }
    key = jax.random.PRNGKey(1)

    # warmup / compile (donation: params/opt_state must be re-threaded)
    for i in range(2):
        key, k = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, batch, k)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, batch, k)
    loss = float(metrics["loss"])  # forces the whole chain
    wall = time.perf_counter() - t0

    s_per_step = wall / args.steps
    # complementary masking doubles the forwarded batch (train/loss.py);
    # tokens/s counts the DATA tokens (B*S), FLOPs count the compute (2x)
    tok_s = B * S / s_per_step
    flops = 6 * n_params * (2 * B * S)   # fwd+bwd, doubled batch
    mfu = flops / s_per_step / 197e12    # v5e bf16 peak
    print(json.dumps({
        "metric": f"train_tokens_per_s_{args.layers}L_d{args.d_model}"
                  f"_b{B}x{S}",
        "value": round(tok_s, 1),
        "unit": "tokens/s",
        "vs_baseline": round(mfu, 4),   # field reused: achieved MFU
        "detail": {
            "s_per_step": round(s_per_step, 4),
            "params_m": round(n_params / 1e6, 1),
            "loss": round(loss, 4),
            "mfu_bf16_peak": round(mfu, 4),
        },
    }))


if __name__ == "__main__":
    main()
