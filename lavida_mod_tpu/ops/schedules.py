"""Transfer-count schedules for masked-diffusion decoding.

Host-side (NumPy) on purpose: the per-step transfer counts depend only on the
initial number of masked tokens in a block — which is known before the denoise
loop starts — so we precompute the whole `[batch, steps]` table once and feed
it to the jitted scan as a plain array.  This removes every host↔device sync
the reference incurs inside its step loop.

Semantics replicate reference llava/model/language_model/llada/generate.py:
  - `num_transfer_tokens` (uniform): :22-40
  - `num_transfer_tokens_scheduled`: :42-95 including the clamp-to-1 and
    greedy delta-redistribution loop, and the final `flip(-1)`.
  - schedule curves: cosine :100-105, logit-normal (sigmoid_normal_cdf)
    :107-110, shift (logit_normal_schedule) :111-114.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from scipy.special import erf  # scipy ships with the baked-in stack


def cosine_curve(t: np.ndarray) -> np.ndarray:
    """[0,1] -> [0,1], increasing (generate.py:100-105)."""
    t = np.clip(t, 0.0, 1.0)
    return 1.0 - 0.5 * (1.0 + np.cos(np.pi * t))


def logit_normal_cdf_curve(t: np.ndarray) -> np.ndarray:
    """Phi(logit(t)) (generate.py:107-110). t in [0,1]; endpoints map to 0/1."""
    with np.errstate(divide="ignore"):
        logit = np.log(t / (1.0 - t))
    return 0.5 * (1.0 + erf(logit / np.sqrt(2.0)))


def shift_curve(t: np.ndarray, shift: float) -> np.ndarray:
    """shift*t / (1 + (shift-1)*t) (generate.py:111-114)."""
    return shift * t / (1.0 + (shift - 1.0) * t)


def num_transfer_tokens(mask_counts: np.ndarray, steps: int) -> np.ndarray:
    """Uniform split of each row's mask count over `steps` steps.

    mask_counts: [batch] int — masked-token count per row.
    Returns [batch, steps] int64; first `remainder` steps get one extra.
    """
    mask_counts = np.asarray(mask_counts, dtype=np.int64).reshape(-1)
    base = mask_counts // steps
    rem = mask_counts % steps
    out = np.tile(base[:, None], (1, steps))
    step_idx = np.arange(steps)[None, :]
    out = out + (step_idx < rem[:, None]).astype(np.int64)
    return out


def num_transfer_tokens_scheduled(
    mask_counts: np.ndarray,
    steps: int,
    schedule: Optional[str] = None,
    shift: float = 3.0,
) -> np.ndarray:
    """Scheduled per-step transfer counts.

    Returns [batch, steps'] int64 where steps' = min(steps, mask_counts[0])
    (the reference keys the step clamp off row 0, generate.py:56).  Each row
    sums to its mask count; entries are >= 1; the table is time-reversed
    (flip) exactly as the reference does, so index 0 is the first denoise
    step.
    """
    mask_counts = np.asarray(mask_counts, dtype=np.int64).reshape(-1)
    if schedule is None:
        return num_transfer_tokens(mask_counts, steps)

    steps = int(min(steps, mask_counts[0]))
    t = np.linspace(0.0, 1.0, steps + 1)
    if schedule == "logit_normal":
        sig = logit_normal_cdf_curve(t)
    elif schedule == "shift":
        sig = shift_curve(t, shift)
    elif schedule == "cosine":
        sig = cosine_curve(t)
    elif schedule == "linear":
        sig = t
    else:
        raise ValueError(f"unknown schedule: {schedule}")

    out = np.zeros((mask_counts.shape[0], steps), dtype=np.int64)
    for i, n in enumerate(mask_counts):
        if n < steps:
            # Degenerate row: fewer masked tokens than steps (possible only
            # when rows have unequal mask counts — the reference clamps steps
            # off row 0 only, generate.py:56, and would spin forever here).
            # Deterministic graceful fallback: commit one token per step for
            # the first n steps (post-flip), 0 for the rest.
            d = np.array([0] * (steps - int(n)) + [1] * int(n), dtype=np.int64)
            out[i] = d
            continue
        cum = (sig * n).astype(np.int64)
        # Pin the endpoints: the curve maps [0,1]->[0,1] so cum must run 0..n.
        # (torch-f32 vs f64 rounding can land the endpoint at n-1, which would
        # violate the reference's delta>=0 invariant, generate.py:80.)
        cum[0], cum[-1] = 0, n
        d = cum[1:] - cum[:-1]
        d = np.clip(d, 1, None)
        delta = int(d.sum() - n)
        assert delta >= 0
        j = 0
        while delta > 0:
            j = j % len(d)
            if d[j] == 1:
                j += 1
                continue
            d[j] -= 1
            delta -= 1
            j += 1
        assert d.sum() == n
        out[i] = d
    return out[:, ::-1].copy()


def resolve_steps(
    max_new_tokens: int,
    block_length: int,
    steps: Optional[int] = None,
    step_per_block: Optional[int] = None,
    step_ratio: Optional[float] = None,
) -> tuple[int, int]:
    """Resolve (num_blocks, steps_per_block) with the reference's precedence
    (generate.py:146-208): steps default to max_new_tokens, divided evenly
    over blocks; step_per_block overrides; step_ratio scales last."""
    gen_length = max_new_tokens
    assert gen_length % block_length == 0
    num_blocks = gen_length // block_length
    steps = max_new_tokens if steps is None else steps
    assert steps % num_blocks == 0 or step_per_block is not None
    steps = steps // num_blocks
    if step_per_block:
        assert step_ratio is None, "pass step_ratio or step_per_block, not both"
        steps = min(step_per_block, block_length)
    if step_ratio:
        steps = int(steps * step_ratio)
    return num_blocks, steps
