"""Monte-Carlo log-likelihood for multiple-choice evaluation.

Parity with reference llada/log_likelyhood.py:7-96 + the multimodal entry
llava_llada.py:300-325:

  - stratified mask-count sampling: one k ~ U{1..T}, then the batch rows get
    round(linspace(k, k+(b-1)·T/b, b)) wrapped to [1, T] masked positions
    (log_likelyhood.py:10-16) — a variance-reduction trick over iid
    sampling;
  - each row masks a random subset of exactly x_i answer positions
    (permutation comparison, :18-21);
  - loss = Σ CE(masked)/p_mask / batch_size, averaged over mc_num/batch
    rounds, negated (:88-96);
  - the multimodal prompt enters as precomputed prefix embeddings
    (llava_llada.py:300-325; answer truncated to 300 tokens there — the
    caller's responsibility here).

The per-round computation is one jitted function; rounds loop on host
(mc_num/batch_size iterations, each independent)."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LLaDAConfig
from ..models import llada as llada_model


@functools.partial(jax.jit, static_argnames=("cfg", "batch_size", "use_flash"))
def _mc_round(
    params,
    cfg: LLaDAConfig,
    prefix_embeds: jax.Array,   # [1, P, D]
    answer: jax.Array,          # [Ta]
    key: jax.Array,
    batch_size: int,
    use_flash: bool = False,
):
    P = prefix_embeds.shape[1]
    Ta = answer.shape[0]
    b = batch_size
    kk, kp = jax.random.split(key)

    # stratified mask counts (log_likelyhood.py:10-16)
    k = jax.random.randint(kk, (), 1, Ta + 1)
    x = jnp.round(
        jnp.linspace(k.astype(jnp.float32),
                     k.astype(jnp.float32) + (b - 1) * (Ta / b), b)
    ).astype(jnp.int32)
    x = ((x - 1) % Ta) + 1

    # per-row random subset of exactly x_i positions
    perm_keys = jax.random.split(kp, b)
    ranks = jax.vmap(lambda pk: jax.random.permutation(pk, Ta))(perm_keys)
    is_mask = ranks < x[:, None]                      # [b, Ta]

    ans = jnp.broadcast_to(answer[None], (b, Ta))
    mask_embed = llada_model.embed_tokens(
        params, jnp.array([cfg.mask_token_id])
    )[0]
    ans_embeds = llada_model.embed_tokens(params, ans)
    ans_embeds = jnp.where(is_mask[..., None], mask_embed, ans_embeds)
    embeds = jnp.concatenate(
        [jnp.broadcast_to(prefix_embeds, (b, P, prefix_embeds.shape[-1])),
         ans_embeds.astype(prefix_embeds.dtype)],
        axis=1,
    )
    logits, _ = llada_model.forward(
        params, cfg, embeds, use_flash=use_flash
    )
    logits = logits[:, P:]                            # answer positions
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, ans[..., None], axis=-1)[..., 0]
    p_mask = (x.astype(jnp.float32) / Ta)[:, None]
    loss = jnp.where(is_mask, nll / p_mask, 0.0).sum() / b
    return loss


def get_log_likelihood(
    params,
    cfg: LLaDAConfig,
    prefix_embeds: jax.Array,
    answer: jax.Array | np.ndarray,
    mc_num: int = 128,
    batch_size: int = 16,
    key: Optional[jax.Array] = None,
    use_flash: bool = False,
) -> float:
    """log p(answer | prefix) MC estimate (negative expected weighted CE)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    answer = jnp.asarray(answer)
    rounds = max(mc_num // batch_size, 1)
    total = 0.0
    for i in range(rounds):
        total += float(
            _mc_round(params, cfg, prefix_embeds, answer,
                      jax.random.fold_in(key, i), batch_size,
                      use_flash=use_flash)
        )
    return -total / rounds
