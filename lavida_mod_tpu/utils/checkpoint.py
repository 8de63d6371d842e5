"""Checkpoint save/restore via orbax.

Replaces the reference's DeepSpeed/HF-Trainer checkpoint machinery
(train.py:199-312, llava_trainer.py:441-469): sharded pytrees are written
gather-free (the ZeRO-3 "maybe_zero_3" dance disappears under GSPMD),
auto-resume picks the latest `checkpoint-*`, and projector-tuning stages can
save the adapter alone (mm_projector.bin analogue).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax


def _ckpt_dir(output_dir: str, step: int) -> str:
    return os.path.join(output_dir, f"checkpoint-{step}")


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Newest checkpoint-* dir (auto-resume, train.py:2163-2166)."""
    if not os.path.isdir(output_dir):
        return None
    best = None
    best_step = -1
    for name in os.listdir(output_dir):
        m = re.match(r"^checkpoint-(\d+)$", name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(output_dir, name)
    return best


def save_checkpoint(
    output_dir: str,
    step: int,
    params: Any,
    opt_state: Any = None,
    extra: Optional[dict] = None,
) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(_ckpt_dir(output_dir, step))
    ckptr = ocp.PyTreeCheckpointer()
    payload = {"params": params, "step": step}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if extra:
        payload["extra"] = extra
    ckptr.save(path, payload, force=True)
    return path


def restore_checkpoint(path: str, template: Optional[Any] = None) -> dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), item=template)
    return ckptr.restore(os.path.abspath(path))


def save_adapter_only(output_dir: str, step: int, params: dict) -> str:
    """Projector(+newline)-only save for stage-1 (llava_trainer.py:441-463
    mm_projector.bin analogue)."""
    sub = {
        "projector": params["projector"],
        "image_newline": params["image_newline"],
    }
    import orbax.checkpoint as ocp

    path = os.path.abspath(
        os.path.join(output_dir, f"checkpoint-{step}", "mm_projector")
    )
    ocp.PyTreeCheckpointer().save(path, sub, force=True)
    return path


def load_adapter_into(params: dict, adapter_path: str) -> dict:
    """Merge a saved adapter into a full params tree (builder.py:62-123
    base+projector load path)."""
    sub = restore_checkpoint(adapter_path)
    out = dict(params)
    out["projector"] = jax.tree.map(lambda x: x, sub["projector"])
    out["image_newline"] = sub["image_newline"]
    return out
