"""In-training evaluation hook.

The analogue of LLaVAEvalTrainer (reference llava/train/
llava_eval_trainer.py:202-529): every eval interval, run lmms-eval-style
lite tasks against the CURRENT training params and log the scores —
the continuous quality signal the reference streams to wandb
(--lmms_eval_generate_tasks, gen defaults max_new_tokens=16,
prefix_lm=True, llava_eval_trainer.py:371-375).
"""

from __future__ import annotations

from typing import Optional, Sequence

from ..config import LaViDaConfig
from ..eval.adapter import LavidaEvalModel
from ..eval.evaluator import evaluate, shard_docs
from ..eval.tasks import get_task
from ..models.lavida import LaViDa


DEFAULT_GEN_KWARGS = {"max_new_tokens": 16, "prefix_lm": True}


def run_in_training_eval(
    cfg: LaViDaConfig,
    params: dict,
    tokenizer,
    tasks: Sequence[str],
    data_paths: Optional[dict] = None,
    limit: Optional[int] = 32,
    conv_template: str = "llada",
    lm_family: str = "llada",
    gen_kwargs: Optional[dict] = None,
) -> dict:
    """Returns {task: {metric: value}} flattened for the metrics logger."""
    import jax

    model = LaViDa(cfg, params, lm_family=lm_family)
    adapter = LavidaEvalModel(model, tokenizer, conv_template=conv_template)
    distributed = jax.process_count() > 1
    flat = {}
    for name in tasks:
        task = get_task(name)
        # each process scores a strided shard; rows are gathered and (for
        # mme) pair-deduped before aggregation — the reference's
        # all_gather_object merge loop (llava_eval_trainer.py:232-292)
        docs = shard_docs(task.load_docs(
            (data_paths or {}).get(name), limit=limit
        ))
        out = evaluate(
            adapter, task, docs,
            gen_kwargs={**DEFAULT_GEN_KWARGS, **(gen_kwargs or {})},
            distributed=distributed,
        )
        for k, v in out["results"].items():
            if isinstance(v, (int, float)):
                flat[f"eval/{name}/{k}"] = float(v)
    return flat
