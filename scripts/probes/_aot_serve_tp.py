"""AOT memory analysis of multi-chip SERVING: the bf16 8B fused
generate graph (prefill + denoise scan) sharded tensor-parallel over a
v5e slice, no weights materialized.

Single-chip serving needs int8/int4 quantization because the bf16 8B
(~15.45G) cannot co-reside with its KV cache in 15.75G of HBM
(rehearse_8b_load).  The multi-chip answer is tp: column/row-paired
sharding puts 1/tp of every weight and 1/tp of every KV head on each
chip (parallel/sharding.py), so bf16 serving — zero quantization error —
fits from tp=2 up.  This probe has XLA's buffer assignment confirm it.

Run:  python scripts/probes/_aot_serve_tp.py --tpu-topo   (v5e:2x4)
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      JAX_PLATFORMS=cpu python scripts/probes/_aot_serve_tp.py

NOTE: AOT topology probes grab /tmp/libtpu_lockfile — never run two in
parallel (NOTES_ROUND5).
"""
import argparse
import os
import sys

sys.path.insert(0, "/root/repo")
_TPU_TOPO = "--tpu-topo" in sys.argv
if not _TPU_TOPO:
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

if not _TPU_TOPO:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from lavida_mod_tpu.config import GenerationConfig, LaViDaConfig
from lavida_mod_tpu.generation import diffusion
from lavida_mod_tpu.models import llada as jl
from lavida_mod_tpu.parallel.mesh import make_mesh
from lavida_mod_tpu.parallel.sharding import param_specs


def analyze(tp, *, B=1, Ppre=1061, G=32, steps=16, devices=None):
    cfg = LaViDaConfig().llada  # full 8B geometry
    mesh = make_mesh(dp=1, fsdp=1, tp=tp, devices=devices)

    p_shapes = jax.eval_shape(
        lambda k: jl.init_params(cfg, k, jnp.bfloat16),
        jax.random.PRNGKey(0))
    specs = param_specs(p_shapes)
    p_abs = jax.tree.map(
        lambda s, sp: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, sp)),
        p_shapes, specs)

    rep = NamedSharding(mesh, P())
    gen = GenerationConfig(max_new_tokens=G, block_length=G,
                           step_per_block=steps, prefix_lm=True)
    x0 = np.full((B, G), cfg.mask_token_id, np.int32)
    k_table, block_end = diffusion.build_control_table(x0, 0, G, gen,
                                                       cfg.mask_token_id)
    abs_args = dict(
        x=jax.ShapeDtypeStruct((B, G), jnp.int32, sharding=rep),
        prefix_embeds=jax.ShapeDtypeStruct(
            (B, Ppre, cfg.d_model), jnp.bfloat16, sharding=rep),
        k_table=jax.ShapeDtypeStruct(k_table.shape, jnp.int32,
                                     sharding=rep),
        block_end=jax.ShapeDtypeStruct(block_end.shape, jnp.int32,
                                       sharding=rep),
        key=jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep),
    )

    fn = jax.jit(
        lambda p, x, prefix, kt, be, key: diffusion._generate_cached_fused_body(
            p, cfg, x, prefix, kt, be, None, key,
            temperature=0.0, remasking="low_confidence", use_flash=False))
    lowered = fn.lower(p_abs, abs_args["x"], abs_args["prefix_embeds"],
                       abs_args["k_table"], abs_args["block_end"],
                       abs_args["key"])
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    gib = 1 << 30
    print(f"tp={tp} B={B} P={Ppre} G={G}: "
          f"args {mem.argument_size_in_bytes / gib:.2f}G  "
          f"temp {mem.temp_size_in_bytes / gib:.2f}G  "
          f"output {mem.output_size_in_bytes / gib:.3f}G  "
          f"(per device)", flush=True)
    return mem


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu-topo", action="store_true",
                    help="AOT-compile against a v5e:2x4 topology instead "
                         "of the virtual CPU mesh")
    ap.add_argument("--tp", default="4,8")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    devices = None
    if args.tpu_topo:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name="v5e:2x4")
        devices = list(topo.devices)

    for tp in (int(t) for t in args.tp.split(",")):
        devs = (devices if devices is not None else jax.devices())[:tp]
        try:
            analyze(tp, B=args.batch, devices=np.array(devs))
        except Exception as e:
            print(f"tp={tp} FAILED: {str(e)[:400]}", flush=True)


if __name__ == "__main__":
    main()
