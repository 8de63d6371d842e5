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


# ---------------------------------------------------------------------------
# trl-exact AR DPO (for the causal AR baselines)
#
# The reference trains DPO through its vendored trl
# (trl/trainer/dpo_trainer.py): sequence log-probs over shifted labels
# (get_batch_logps, :797-836), the four loss types with label smoothing
# (dpo_loss, :731-795), and the fork's dpo_alpha/gamma SFT mixing
# (get_batch_loss_metrics, :946-959).  This section reproduces those
# semantics exactly for AR models, giving the diffusion-ELBO variant
# above a parity anchor.
# ---------------------------------------------------------------------------

def ar_batch_logps(
    logits: jax.Array,      # [B, L, V]
    labels: jax.Array,      # [B, L], -100 = ignore
    *,
    average_log_prob: bool = False,
    label_pad_token_id: int = -100,
) -> jax.Array:
    """trl get_batch_logps (dpo_trainer.py:797-836): shift labels left /
    logits right, gather per-token log-probs, sum (or mean) over
    non-padded positions."""
    labels = labels[:, 1:]
    logits = logits[:, :-1, :]
    loss_mask = labels != label_pad_token_id
    tgt = jnp.where(loss_mask, labels, 0)
    logps = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per_tok = jnp.take_along_axis(logps, tgt[..., None], axis=-1)[..., 0]
    summed = (per_tok * loss_mask).sum(-1)
    if average_log_prob:
        return summed / jnp.maximum(loss_mask.sum(-1), 1)
    return summed


def ar_dpo_loss(
    policy_chosen_logps: jax.Array,
    policy_rejected_logps: jax.Array,
    reference_chosen_logps: jax.Array,
    reference_rejected_logps: jax.Array,
    *,
    beta: float = 0.1,
    label_smoothing: float = 0.0,
    loss_type: str = "sigmoid",
    reference_free: bool = False,
):
    """trl dpo_loss (dpo_trainer.py:731-795).  Returns (per-example
    losses, chosen_rewards, rejected_rewards)."""
    pi_logratios = policy_chosen_logps - policy_rejected_logps
    ref_logratios = jnp.where(
        reference_free, 0.0,
        reference_chosen_logps - reference_rejected_logps)
    logits = pi_logratios - ref_logratios
    if loss_type == "sigmoid":
        losses = (-jax.nn.log_sigmoid(beta * logits) * (1 - label_smoothing)
                  - jax.nn.log_sigmoid(-beta * logits) * label_smoothing)
    elif loss_type == "hinge":
        losses = jax.nn.relu(1 - beta * logits)
    elif loss_type == "ipo":
        losses = (logits - 1 / (2 * beta)) ** 2
    elif loss_type == "kto_pair":
        chosen_kl = jnp.clip(
            (policy_chosen_logps - reference_chosen_logps).mean(), 0, None)
        rejected_kl = jnp.clip(
            (policy_rejected_logps - reference_rejected_logps).mean(),
            0, None)
        chosen_lr = policy_chosen_logps - reference_chosen_logps
        rejected_lr = policy_rejected_logps - reference_rejected_logps
        losses = jnp.concatenate([
            1 - jax.nn.sigmoid(beta * (chosen_lr - rejected_kl)),
            1 - jax.nn.sigmoid(beta * (chosen_kl - rejected_lr)),
        ], axis=0)
    else:
        raise ValueError(f"Unknown loss type: {loss_type}")
    chosen_rewards = jax.lax.stop_gradient(
        beta * (policy_chosen_logps - reference_chosen_logps))
    rejected_rewards = jax.lax.stop_gradient(
        beta * (policy_rejected_logps - reference_rejected_logps))
    return losses, chosen_rewards, rejected_rewards


def ar_dpo_batch_loss(
    forward_fn,               # params, ids -> logits [B, L, V]
    params,
    ref_params,
    batch: dict,              # chosen_ids/chosen_labels/rejected_*  [B, L]
    *,
    beta: float = 0.1,
    dpo_alpha: float = 1.0,
    gamma: float = 0.0,
    loss_type: str = "sigmoid",
    label_smoothing: float = 0.0,
):
    """Full trl batch objective: dpo_alpha * DPO + gamma * SFT-CE on the
    chosen response (dpo_trainer.py:946-959)."""
    avg = loss_type == "ipo"  # trl passes average_log_prob for IPO (:877)

    def lp(p, ids, labels):
        logits = forward_fn(p, ids)
        return ar_batch_logps(logits, labels, average_log_prob=avg), logits

    pc, chosen_logits = lp(params, batch["chosen_ids"],
                           batch["chosen_labels"])
    pr, _ = lp(params, batch["rejected_ids"], batch["rejected_labels"])
    rc, _ = lp(ref_params, batch["chosen_ids"], batch["chosen_labels"])
    rr, _ = lp(ref_params, batch["rejected_ids"],
               batch["rejected_labels"])
    rc, rr = jax.lax.stop_gradient(rc), jax.lax.stop_gradient(rr)

    losses, chosen_rw, rejected_rw = ar_dpo_loss(
        pc, pr, rc, rr, beta=beta, label_smoothing=label_smoothing,
        loss_type=loss_type)

    # SFT CE over shifted chosen labels (get_sft_loss, :838-850)
    labels = batch["chosen_labels"][:, 1:]
    logits = chosen_logits[:, :-1].astype(jnp.float32)
    mask = labels != -100
    tgt = jnp.where(mask, labels, 0)
    logps = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logps, tgt[..., None], axis=-1)[..., 0]
    sft = (ce * mask).sum() / jnp.maximum(mask.sum(), 1)

    loss = dpo_alpha * losses.mean() + gamma * sft
    metrics = {
        "dpo_loss": losses.mean(),
        "sft_loss": sft,
        "rewards_chosen": chosen_rw.mean(),
        "rewards_rejected": rejected_rw.mean(),
        "reward_acc": (chosen_rw > rejected_rw).mean(),
        "reward_margin": (chosen_rw - rejected_rw).mean(),
    }
    return loss, metrics
