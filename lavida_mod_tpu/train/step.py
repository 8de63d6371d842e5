"""The pjit training step: complementary-masking diffusion loss + optax.

Replaces HF Trainer + DeepSpeed ZeRO (reference llava/train/llava_trainer.py,
scripts/zero*.json): optimizer state inherits the parameter shardings (that
IS ZeRO under GSPMD), the step is one jitted function with donated
params/opt-state, and per-module LR groups reproduce `create_optimizer`'s
mm_projector_lr / mm_vision_tower_lr split (llava_trainer.py:362-439).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import LaViDaConfig
from .loss import diffusion_loss


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


def _with_grad_accum(opt: optax.GradientTransformation, grad_accum: int):
    """Gradient accumulation (reference --gradient_accumulation_steps 4 in
    every cluster launch script, e.g. scripts/train/exps/cluster/
    llada-hd-llada-s2.sh:55): optax.MultiSteps keeps a running MEAN of the
    microbatch grads and applies the inner optimizer every k-th call, so k
    equal microbatches step identically to one k-times-larger batch (the
    LR schedule counts optimizer steps, not microbatches — MultiSteps only
    advances the inner state on real updates)."""
    if grad_accum <= 1:
        return opt
    return optax.MultiSteps(opt, every_k_schedule=grad_accum)


def make_optimizer(
    lr: float = 2e-5,
    projector_lr: Optional[float] = None,
    vision_tower_lr: Optional[float] = None,
    grad_accum: int = 1,
    **kw,
) -> optax.GradientTransformation:
    adamw = _adamw_builder(**kw)
    transforms = {
        "base": adamw(lr),
        "projector": adamw(projector_lr or lr),
        "vision_tower": adamw(vision_tower_lr or lr),
    }
    return _with_grad_accum(
        optax.multi_transform(transforms, label_params), grad_accum
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
):
    """Returns train_step(params, opt_state, batch, key) -> (params,
    opt_state, metrics).  `batch` = {"inputs_embeds": [B,L,D],
    "labels": [B,L]}.  Jit/pjit-ready; donate params+opt_state at call site
    via jax.jit(..., donate_argnums=(0,1)) or use `jit_train_step`.

    Partial freezing (reference mm_tunable_parts, train.py:2059-2110) is the
    optimizer's job: pass a freeze mask to make_optimizer-style
    optax.multi_transform with `optax.set_to_zero()` for frozen groups.
    """

    def loss_fn(params, batch, key):
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
):
    """End-to-end train step: pixels -> SigLIP -> projector -> pool ->
    gather-splice -> diffusion loss.  Gradients reach every module, so the
    reference's stage-1 (projector-only) and stage-2 (full model incl.
    vision tower at its own LR) both work — freezing is expressed in the
    optimizer (per-module labels + optax.set_to_zero).

    `batch` = {"pixel_values" [N,C,S,S], "text_ids" [B,T_text],
    "gather_idx" [B,T], "labels" [B,T]} from
    multimodal.build_gather_plan + the collator.
    """
    from ..models.multimodal import multimodal_embeds

    def loss_fn(params, batch, key):
        embeds = multimodal_embeds(
            params, cfg, batch["pixel_values"], batch["text_ids"],
            batch["gather_idx"], remat=remat,
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
        optax.multi_transform(transforms, label), grad_accum
    )
