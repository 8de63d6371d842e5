"""DPO for the masked-diffusion LM.

The reference trains DPO through vendored trl (llava/train/train_dpo.py +
trl/, SURVEY.md §2.5) with AR sequence log-probs.  A diffusion LM has no
exact sequence log-prob; the accepted estimator (and the one the fork's
eval uses, llada/log_likelyhood.py) is the masked-CE ELBO proxy.  The DPO
objective becomes

  L = -log sigmoid( beta * [ (lp_c - lp_r) - (lp_c_ref - lp_r_ref) ] )

with lp_* the masked-CE estimates.  Variance reduction: the SAME mask
pattern and t are used for policy and reference on each pair, so the
difference cancels the mask-sampling noise to first order.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..config import LLaDAConfig
from ..models import llada as llada_model
from .loss import forward_process


def _masked_ce_logp(
    params, cfg: LLaDAConfig, embeds, labels, masked_indices, p_mask,
    prefix_lengths=None, remat=True,
):
    """Per-row negative weighted masked CE (an ELBO log-prob proxy):
    -(1/|answer|) * sum CE(masked)/p_mask (log_likelyhood.py:88-91
    weighting, normalized per answer length)."""
    sup_mask = labels != -100
    final = masked_indices & sup_mask
    mask_embed = llada_model.embed_tokens(
        params, jnp.array([cfg.mask_token_id])
    ).reshape(1, 1, -1).astype(embeds.dtype)
    x = jnp.where(final[..., None], mask_embed, embeds)
    logits, _ = llada_model.forward(
        params, cfg, x, prefix_lengths=prefix_lengths, remat=remat,
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.where(sup_mask, labels, 0)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    w = jnp.where(final, 1.0 / p_mask, 0.0)
    denom = jnp.maximum(sup_mask.sum(axis=-1), 1)
    return -(nll * w).sum(axis=-1) / denom        # [B] log-prob proxy


def dpo_loss(
    params,
    ref_params,
    cfg: LLaDAConfig,
    chosen_embeds: jax.Array,     # [B, L, D]
    chosen_labels: jax.Array,     # [B, L]
    rejected_embeds: jax.Array,
    rejected_labels: jax.Array,
    key: jax.Array,
    *,
    beta: float = 0.1,
    prefix_lm: bool = True,
    remat: bool = True,
):
    B, L, _ = chosen_embeds.shape
    kc, kr = jax.random.split(key)
    mc, pc = forward_process(kc, B, L)
    mr, pr = forward_process(kr, B, L)

    def pls(labels):
        if not prefix_lm:
            return None
        return jnp.argmax((labels != -100).astype(jnp.int32), axis=1)

    lp_c = _masked_ce_logp(params, cfg, chosen_embeds, chosen_labels,
                           mc, pc, pls(chosen_labels), remat)
    lp_r = _masked_ce_logp(params, cfg, rejected_embeds, rejected_labels,
                           mr, pr, pls(rejected_labels), remat)
    ref_c = jax.lax.stop_gradient(_masked_ce_logp(
        ref_params, cfg, chosen_embeds, chosen_labels, mc, pc,
        pls(chosen_labels), remat,
    ))
    ref_r = jax.lax.stop_gradient(_masked_ce_logp(
        ref_params, cfg, rejected_embeds, rejected_labels, mr, pr,
        pls(rejected_labels), remat,
    ))
    logits = beta * ((lp_c - lp_r) - (ref_c - ref_r))
    loss = -jax.nn.log_sigmoid(logits).mean()
    metrics = {
        "dpo_loss": loss,
        "reward_margin": (lp_c - lp_r - (ref_c - ref_r)).mean(),
        "reward_acc": (logits > 0).mean(),
        "logp_chosen": lp_c.mean(),
        "logp_rejected": lp_r.mean(),
    }
    return loss, metrics


def make_dpo_train_step(
    cfg: LLaDAConfig,
    optimizer: optax.GradientTransformation,
    ref_params,
    *,
    beta: float = 0.1,
    prefix_lm: bool = True,
    remat: bool = True,
):
    """batch = {"chosen_embeds","chosen_labels","rejected_embeds",
    "rejected_labels"}."""

    def loss_fn(params, batch, key):
        return dpo_loss(
            params, ref_params, cfg,
            batch["chosen_embeds"], batch["chosen_labels"],
            batch["rejected_embeds"], batch["rejected_labels"], key,
            beta=beta, prefix_lm=prefix_lm, remat=remat,
        )

    def step(params, opt_state, batch, key):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step
