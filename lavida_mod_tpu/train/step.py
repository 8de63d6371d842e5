"""The pjit training step: complementary-masking diffusion loss + optax.

Replaces HF Trainer + DeepSpeed ZeRO (reference llava/train/llava_trainer.py,
scripts/zero*.json): optimizer state inherits the parameter shardings (that
IS ZeRO under GSPMD), the step is one jitted function with donated
params/opt-state, and per-module LR groups reproduce `create_optimizer`'s
mm_projector_lr / mm_vision_tower_lr split (llava_trainer.py:362-439).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import LaViDaConfig
from .loss import diffusion_loss


def cast_floating(tree, dtype):
    """Cast every floating-point leaf to `dtype` (ints/bools untouched).

    NOTE: jnp's same-dtype astype is a no-copy identity — don't rely on
    this to defensively copy a tree you are about to donate."""
    def cast(x):
        dt = getattr(x, "dtype", None)
        if dt is not None and jnp.issubdtype(dt, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


def _batch_constraint(mesh, batch_axes):
    """Build the dim-0 sharding-constraint fn for diffusion_loss (pins the
    doubled batch to the data axes so GSPMD never reshards the mask
    selects — see diffusion_loss docstring)."""
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec

    axes = tuple(a for a in batch_axes if a in mesh.axis_names)

    def constrain(x):
        spec = PartitionSpec(axes, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return constrain


def label_params(params) -> Any:
    """Map each leaf to an LR-group label by top-level module
    (llava_trainer.py:404-437 semantics)."""
    def lab(path, _):
        top = str(path[0].key) if hasattr(path[0], "key") else str(path[0])
        if top == "projector":
            return "projector"
        if top == "siglip":
            return "vision_tower"
        return "base"

    return jax.tree_util.tree_map_with_path(lab, params)


def _adamw_builder(
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    warmup_steps: int = 0,
    total_steps: int = 10000,
    min_lr_ratio: float = 0.0,
    grad_clip: float = 1.0,
    schedule: str = "cosine_with_min_lr",
):
    def sched(base):
        if schedule == "constant":
            return base
        if warmup_steps <= 0:
            return optax.cosine_decay_schedule(
                base, max(total_steps, 1), alpha=min_lr_ratio
            )
        return optax.warmup_cosine_decay_schedule(
            0.0, base, warmup_steps, max(total_steps, 2),
            end_value=base * min_lr_ratio,
        )

    def adamw(base):
        return optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(sched(base), b1=b1, b2=b2,
                        weight_decay=weight_decay),
        )

    return adamw


class _F32AccumState(NamedTuple):
    mini_step: jax.Array     # int32 position inside the window
    acc_grads: Any           # f32 running MEAN of the microbatch grads
    inner_state: Any


def multi_steps_f32(inner: optax.GradientTransformation, k: int):
    """optax.MultiSteps semantics with an explicitly-f32 accumulator.

    MultiSteps' acc_grads is zeros_like(params), so with bf16 params the
    running mean accumulates in bf16 — a numerics divergence from the
    reference, whose DeepSpeed bf16 engine accumulates gradients in f32
    flat buffers (zero3.json:10-12 semantics).  This wrapper keeps the
    mean in f32 regardless of param dtype, casting back to the grad dtype
    only when handing the window mean to the inner optimizer.  (Under the
    default --precision mixed policy params are already f32 masters and
    plain MultiSteps is f32 end-to-end; this exists for bf16-param runs.)
    """

    def init(params):
        acc = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32)
            if jnp.issubdtype(p.dtype, jnp.floating) else jnp.zeros_like(p),
            params,
        )
        return _F32AccumState(jnp.zeros((), jnp.int32), acc,
                              inner.init(params))

    def update(grads, state, params=None):
        i = state.mini_step
        # incremental running mean: acc <- acc + (g - acc)/(i+1), in f32
        acc = jax.tree.map(
            lambda g, a: a + (g.astype(a.dtype) - a)
            / (i + 1).astype(a.dtype),
            grads, state.acc_grads,
        )

        def final(acc, inner_state):
            upd, new_inner = inner.update(
                jax.tree.map(lambda a, g: a.astype(g.dtype), acc, grads),
                inner_state, params,
            )
            return upd, new_inner, jax.tree.map(jnp.zeros_like, acc)

        def mid(acc, inner_state):
            return (jax.tree.map(jnp.zeros_like, grads), inner_state, acc)

        upd, inner_state, acc = jax.lax.cond(
            i == k - 1, final, mid, acc, state.inner_state
        )
        return upd, _F32AccumState((i + 1) % k, acc, inner_state)

    return optax.GradientTransformation(init, update)


def _with_grad_accum(opt: optax.GradientTransformation, grad_accum: int,
                     accum_dtype=None):
    """Gradient accumulation (reference --gradient_accumulation_steps 4 in
    every cluster launch script, e.g. scripts/train/exps/cluster/
    llada-hd-llada-s2.sh:55): optax.MultiSteps keeps a running MEAN of the
    microbatch grads and applies the inner optimizer every k-th call, so k
    equal microbatches step identically to one k-times-larger batch (the
    LR schedule counts optimizer steps, not microbatches — MultiSteps only
    advances the inner state on real updates).

    accum_dtype=jnp.float32 swaps in multi_steps_f32 so the running mean
    stays f32 even with bf16 params (DeepSpeed accumulates in f32;
    MultiSteps inherits the param dtype)."""
    if grad_accum <= 1:
        return opt
    if accum_dtype == jnp.float32:
        return multi_steps_f32(opt, grad_accum)
    return optax.MultiSteps(opt, every_k_schedule=grad_accum)


def make_optimizer(
    lr: float = 2e-5,
    projector_lr: Optional[float] = None,
    vision_tower_lr: Optional[float] = None,
    grad_accum: int = 1,
    accum_dtype=None,
    **kw,
) -> optax.GradientTransformation:
    adamw = _adamw_builder(**kw)
    transforms = {
        "base": adamw(lr),
        "projector": adamw(projector_lr or lr),
        "vision_tower": adamw(vision_tower_lr or lr),
    }
    return _with_grad_accum(
        optax.multi_transform(transforms, label_params), grad_accum,
        accum_dtype,
    )


def make_train_step(
    cfg: LaViDaConfig,
    optimizer: optax.GradientTransformation,
    *,
    prefix_lm: bool = True,
    policy: str = "uniform",
    policy_args: Optional[dict] = None,
    remat: bool = True,
    use_flash: bool = False,
    attention_impl: str = "dense",
    mesh=None,
    batch_axes: tuple = ("dp", "fsdp"),
    ce_chunk=None,
    compute_dtype=None,
):
    """Returns train_step(params, opt_state, batch, key) -> (params,
    opt_state, metrics).  `batch` = {"inputs_embeds": [B,L,D],
    "labels": [B,L]}.  Jit/pjit-ready; donate params+opt_state at call site
    via jax.jit(..., donate_argnums=(0,1)) or use `jit_train_step`.

    compute_dtype: the mixed-precision training policy.  Pass
    jnp.bfloat16 with f32 params to reproduce DeepSpeed's bf16 engine
    (reference scripts/zero3.json:10-12 — fp32 flat master weights +
    fp32 Adam moments, bf16 forward/backward): the forward sees a bf16
    cast of the f32 masters, the cast's VJP upcasts the bf16 cotangents
    to f32, and optax states (Adam mu/nu, MultiSteps acc_grads) init
    from the f32 masters.  None = compute in the param dtype as stored.

    Partial freezing (reference mm_tunable_parts, train.py:2059-2110) is the
    optimizer's job: pass a freeze mask to make_optimizer-style
    optax.multi_transform with `optax.set_to_zero()` for frozen groups.
    """

    def loss_fn(params, batch, key):
        if compute_dtype is not None:
            params = cast_floating(params, compute_dtype)
        lm = params["llada"] if "llada" in params else params
        return diffusion_loss(
            lm, cfg.llada, batch["inputs_embeds"], batch["labels"], key,
            prefix_lm=prefix_lm, policy=policy, policy_args=policy_args,
            remat=remat, use_flash=use_flash,
            attention_impl=attention_impl, mesh=mesh,
            batch_constraint=_batch_constraint(mesh, batch_axes),
            ce_chunk=ce_chunk,
        )

    def train_step(params, opt_state, batch, key):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    return train_step


def jit_train_step(train_step):
    return jax.jit(train_step, donate_argnums=(0, 1))


def make_multimodal_train_step(
    cfg: LaViDaConfig,
    optimizer: optax.GradientTransformation,
    *,
    prefix_lm: bool = True,
    policy: str = "uniform",
    policy_args: Optional[dict] = None,
    fim_id: Optional[int] = None,
    remat: bool = True,
    use_flash: bool = False,
    attention_impl: str = "dense",
    mesh=None,
    batch_axes: tuple = ("dp", "fsdp"),
    ce_chunk=None,
    compute_dtype=None,
):
    """End-to-end train step: pixels -> SigLIP -> projector -> pool ->
    gather-splice -> diffusion loss.  Gradients reach every module, so the
    reference's stage-1 (projector-only) and stage-2 (full model incl.
    vision tower at its own LR) both work — freezing is expressed in the
    optimizer (per-module labels + optax.set_to_zero).

    compute_dtype: mixed-precision policy — see make_train_step.  The
    bf16 cast covers the WHOLE param tree (tower + projector + LM), so
    stage-2's tower-at-2e-6 group also gets f32 masters, matching the
    reference where ZeRO-3 holds all trainable params in the fp32 flat
    buffer regardless of LR group (llava_trainer.py:362-439).

    `batch` = {"pixel_values" [N,C,S,S], "text_ids" [B,T_text],
    "gather_idx" [B,T], "labels" [B,T]} from
    multimodal.build_gather_plan + the collator.
    """
    from ..models.multimodal import multimodal_embeds

    def loss_fn(params, batch, key):
        if compute_dtype is not None:
            params = cast_floating(params, compute_dtype)
        embeds = multimodal_embeds(
            params, cfg, batch["pixel_values"], batch["text_ids"],
            batch["gather_idx"], remat=remat,
            mesh=mesh, batch_axes=batch_axes,
        )
        return diffusion_loss(
            params["llada"], cfg.llada, embeds, batch["labels"], key,
            prefix_lm=prefix_lm, policy=policy, policy_args=policy_args,
            fim_id=fim_id, remat=remat, use_flash=use_flash,
            attention_impl=attention_impl, mesh=mesh,
            batch_constraint=_batch_constraint(mesh, batch_axes),
            ce_chunk=ce_chunk,
        )

    def train_step(params, opt_state, batch, key):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    return train_step


def make_freeze_optimizer(
    tunable_parts: str,
    lr: float = 2e-5,
    projector_lr: Optional[float] = None,
    vision_tower_lr: Optional[float] = None,
    grad_accum: int = 1,
    accum_dtype=None,
    **kw,
) -> optax.GradientTransformation:
    """mm_tunable_parts semantics (reference train.py:2059-2110):
    comma-list over {mm_mlp_adapter, mm_vision_tower, mm_language_model}.
    Frozen groups get optax.set_to_zero()."""
    parts = set(tunable_parts.split(","))
    adamw = _adamw_builder(**kw)
    transforms = {
        "frozen": optax.set_to_zero(),
        "base": adamw(lr),
        "projector": adamw(projector_lr or lr),
        "vision_tower": adamw(vision_tower_lr or lr),
    }

    def label(params):
        def lab(path, _):
            top = str(path[0].key) if hasattr(path[0], "key") else str(path[0])
            if top in ("projector", "image_newline"):
                return "projector" if "mm_mlp_adapter" in parts else "frozen"
            if top == "siglip":
                return (
                    "vision_tower" if "mm_vision_tower" in parts else "frozen"
                )
            return "base" if "mm_language_model" in parts else "frozen"

        return jax.tree_util.tree_map_with_path(lab, params)

    return _with_grad_accum(
        optax.multi_transform(transforms, label), grad_accum, accum_dtype
    )
