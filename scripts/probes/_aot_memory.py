"""AOT memory analysis of the REAL 8B stage-2 train step (no weights
materialized): jit(train_step).lower(abstract args).compile() on the
8-device CPU mesh, reporting XLA's buffer-assignment numbers per device.

Stage-2 shapes from the reference cluster scripts
(scripts/train/exps/cluster/llada-hd-llada-s2.sh): per-device batch 4,
model_max_length 4096, gradient checkpointing on, effective global batch
128 (8 GPUs x 4/device x accum 4); diffusion_loss doubles rows internally
(complementary masking), exactly like the reference's forward.

--multimodal runs the FULL stage-2 step instead of the LM-only one:
pixels -> SigLIP so400m (404M params) -> projector -> gather-splice ->
diffusion loss, with tower params + grads + Adam states resident —
what the reference's ZeRO-3 stage-2 actually holds
(mm_tunable_parts=...mm_vision_tower..., llava_arch.py:336-909).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python scripts/probes/_aot_memory.py [--remat whole_layer]
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

from lavida_mod_tpu.config import LaViDaConfig
from lavida_mod_tpu.models import llada as jl
from lavida_mod_tpu.parallel.mesh import make_mesh
from lavida_mod_tpu.parallel.sharding import param_specs
from lavida_mod_tpu.train.step import make_optimizer, make_train_step


def analyze(dp, fsdp, tp, remat, L=4096, B_global=32, dtype=jnp.bfloat16,
            attention_impl="dense", devices=None, ce_chunk=None,
            grad_accum=1, precision="bf16", multimodal=False,
            views_per_image=5):
    cfg = LaViDaConfig()  # full 8B llada geometry + so400m tower
    mesh = make_mesh(dp=dp, fsdp=fsdp, tp=tp, devices=devices)

    # precision="mixed" = the reference-faithful DeepSpeed bf16-engine
    # policy (zero3.json:10-12): f32 master params + f32 Adam moments +
    # f32 accumulation, bf16 compute.  Params/opt tree is then 12
    # bytes/param (+4 for acc_grads at ga>1) vs 6 (+2) for bf16-everything.
    param_dtype = jnp.float32 if precision == "mixed" else dtype
    compute_dtype = jnp.bfloat16 if precision == "mixed" else None
    if multimodal:
        from lavida_mod_tpu.models import multimodal as mm

        def init(k):
            return mm.init_params(cfg, k, dtype=param_dtype)
    else:
        def init(k):
            return jl.init_params(cfg.llada, k, param_dtype)
    p_shapes = jax.eval_shape(init, jax.random.PRNGKey(0))
    specs = param_specs(p_shapes)
    p_abs = jax.tree.map(
        lambda s, sp: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, sp)),
        p_shapes, specs)

    # grad_accum>1 adds the accumulator — a FULL params-shaped tree (f32
    # under mixed, bf16 under MultiSteps/bf16) resident across the whole
    # microstep, so the accumulation recipe must be AOT-verified, not
    # assumed
    opt = make_optimizer(lr=1e-5, total_steps=100, grad_accum=grad_accum,
                         accum_dtype=(jnp.float32 if precision == "bf16"
                                      and grad_accum > 1 else None))
    o_shapes = jax.eval_shape(opt.init, p_abs)

    D = cfg.llada.d_model
    batch_sh = NamedSharding(mesh, P(("dp", "fsdp"), None, None))
    lab_sh = NamedSharding(mesh, P(("dp", "fsdp"), None))
    key_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)

    if multimodal:
        from lavida_mod_tpu.train.step import make_multimodal_train_step

        # stage-2 anyres geometry: ~5 views/image (base + 2x2 tiles) of
        # 384^2 through so400m -> 729 patches -> 2x2 pool -> 196
        # tokens/view; text fills the rest of the 4096 row
        S = cfg.vision.siglip.image_size
        NV = B_global * views_per_image
        g = -(-cfg.vision.siglip.num_patches_per_side
              // cfg.vision.spatial_pool_stride)
        T_text = max(L - views_per_image * g * g - 8, 256)
        pix_sh = NamedSharding(mesh, P(("dp", "fsdp"), None, None, None))
        batch_abs = {
            "pixel_values": jax.ShapeDtypeStruct(
                (NV, 3, S, S), jnp.bfloat16, sharding=pix_sh),
            "text_ids": jax.ShapeDtypeStruct(
                (B_global, T_text), jnp.int32, sharding=lab_sh),
            "gather_idx": jax.ShapeDtypeStruct(
                (B_global, L), jnp.int32, sharding=lab_sh),
            "labels": jax.ShapeDtypeStruct(
                (B_global, L), jnp.int32, sharding=lab_sh),
        }
        step = make_multimodal_train_step(
            cfg, opt, prefix_lm=True, remat=remat, mesh=mesh,
            attention_impl=attention_impl, ce_chunk=ce_chunk,
            compute_dtype=compute_dtype)
    else:
        batch_abs = {
            "inputs_embeds": jax.ShapeDtypeStruct((B_global, L, D), dtype,
                                                  sharding=batch_sh),
            "labels": jax.ShapeDtypeStruct((B_global, L), jnp.int32,
                                           sharding=lab_sh),
        }
        step = make_train_step(cfg, opt, prefix_lm=True, remat=remat,
                               mesh=mesh, attention_impl=attention_impl,
                               ce_chunk=ce_chunk,
                               compute_dtype=compute_dtype)
    jitted = jax.jit(step, donate_argnums=(0, 1))
    lowered = jitted.lower(p_abs, o_shapes, batch_abs, key_abs)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    n = mesh.devices.size
    gb = 1 << 30

    def g(x):
        return x / gb

    print(f"mesh dp={dp} fsdp={fsdp} tp={tp} remat={remat} "
          f"B={B_global} L={L} attn={attention_impl} ce={ce_chunk} "
          f"ga={grad_accum} prec={precision} "
          f"{'MULTIMODAL(views=%d) ' % views_per_image if multimodal else ''}"
          f"backend={'tpu-topo' if devices is not None else 'cpu'}")
    print(f"  args   {g(ma.argument_size_in_bytes):7.2f} GiB  "
          f"(params+opt+batch at rest, per device)")
    print(f"  output {g(ma.output_size_in_bytes):7.2f} GiB")
    print(f"  temp   {g(ma.temp_size_in_bytes):7.2f} GiB  (activations/"
          f"workspace peak)")
    print(f"  alias  {g(ma.alias_size_in_bytes):7.2f} GiB  (donated)")
    live = (ma.argument_size_in_bytes + ma.temp_size_in_bytes
            + ma.output_size_in_bytes - ma.alias_size_in_bytes)
    print(f"  peak ~= args+temp+out-alias = {g(live):.2f} GiB per device "
          f"(v5e budget 15.75)")
    return ma


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--remat", default="whole_layer")
    ap.add_argument("--L", type=int, default=4096)
    ap.add_argument("--B", type=int, default=32)
    ap.add_argument("--configs", default="8,1;4,2")
    ap.add_argument("--attn", default="dense")
    ap.add_argument("--ce-chunk", type=int, default=None,
                    help="chunked cross-entropy head (train/loss.py): the "
                         "full f32 [2B, L, V] logits (~8.3 GB/chip at 8B "
                         "stage-2) never materialize")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="accumulation microsteps: verifies the stage-2 "
                         "effective-global-batch-128 recipe (B=16 x accum "
                         "8) fits WITH the accumulator tree resident "
                         "(f32 under --precision mixed or the bf16-mode "
                         "multi_steps_f32 wrapper)")
    ap.add_argument("--precision", default="bf16",
                    choices=["bf16", "mixed"],
                    help="'mixed' = the reference-faithful policy (f32 "
                         "masters + f32 Adam states + f32 accum, bf16 "
                         "compute); 'bf16' = everything bf16")
    ap.add_argument("--multimodal", action="store_true",
                    help="the FULL stage-2 step: pixels -> so400m tower -> "
                         "splice -> loss, tower params+grads+Adam states "
                         "resident (VERDICT r4 item 2c)")
    ap.add_argument("--views", type=int, default=5,
                    help="anyres views per image for --multimodal")
    ap.add_argument("--tpu-topo", action="store_true",
                    help="AOT-compile against a detached v5e topology "
                         "(real TPU memory numbers, no chips needed)")
    ap.add_argument("--topo", default="v5e:2x4",
                    help="topology name for --tpu-topo (v5e:2x4 = 8 chips, "
                         "v5e:4x4 = 16)")
    a = ap.parse_args()
    devices = None
    if a.tpu_topo:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name=a.topo)
        devices = list(topo.devices)
    for part in a.configs.split(";"):
        fsdp, dp = (int(x) for x in part.split(","))
        try:
            analyze(dp=dp, fsdp=fsdp, tp=1, remat=a.remat, L=a.L,
                    B_global=a.B, attention_impl=a.attn, devices=devices,
                    ce_chunk=a.ce_chunk, grad_accum=a.grad_accum,
                    precision=a.precision, multimodal=a.multimodal,
                    views_per_image=a.views)
        except Exception as e:
            print(f"fsdp={fsdp} dp={dp} FAILED: {str(e)[:300]}")
