"""Checkpoint save/restore via orbax.

Replaces the reference's DeepSpeed/HF-Trainer checkpoint machinery
(train.py:199-312, llava_trainer.py:441-469): sharded pytrees are written
gather-free (the ZeRO-3 "maybe_zero_3" dance disappears under GSPMD),
auto-resume picks the latest `checkpoint-*`, and projector-tuning stages can
save the adapter alone (mm_projector.bin analogue).

Async saves (SURVEY §5): `save_checkpoint(..., async_save=True)` stages the
arrays (device->host copy) and returns; serialization runs on a background
thread, so the chips only stall for the staging copy, not the disk wall.
Orbax serializes successive async saves internally (a new save waits for
the previous commit) and commits atomically (tmp dir + rename), so a kill
mid-write never leaves a half checkpoint that `latest_checkpoint` could
resume from.  Call `wait_for_saves()` before process exit or before reading
a just-written checkpoint in the same process.  train.py uses async;
the synchronous default stays for tests and one-shot tools.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax

_ASYNC_CKPTR = None


def _async_ckptr():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_saves() -> None:
    """Block until every in-flight async save has committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


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
    async_save: bool = False,
) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(_ckpt_dir(output_dir, step))
    ckptr = _async_ckptr() if async_save else ocp.PyTreeCheckpointer()
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
