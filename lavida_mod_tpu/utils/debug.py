"""Numerical-safety utilities.

The reference guards against NaN/Inf in attention biases
(modeling_llada.py:168-176 ensure_finite_) and counts NaNs in debug mode
(generate.py:163-165).  These are the jit-safe equivalents; the train step
additionally exposes a nonfinite-grad count metric.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ensure_finite(x: jax.Array, neg_inf: float = -1e30) -> jax.Array:
    """Replace -inf/NaN with large-negative / zero (bias sanitization —
    SDPA-style kernels produce NaN rows from all -inf biases,
    modeling_llada.py:168-176)."""
    x = jnp.where(jnp.isneginf(x), neg_inf, x)
    return jnp.nan_to_num(x, nan=0.0, posinf=3e38, neginf=neg_inf)


def count_nonfinite(tree) -> jax.Array:
    """Total non-finite elements across a pytree (debug metric)."""
    leaves = [
        jnp.sum(~jnp.isfinite(l.astype(jnp.float32)))
        for l in jax.tree.leaves(tree)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
    ]
    return sum(leaves) if leaves else jnp.zeros((), jnp.int32)


def assert_all_finite(tree, name: str = "tree"):
    """Host-side check (tests / debugging, not for jit)."""
    n = int(count_nonfinite(tree))
    assert n == 0, f"{name} contains {n} non-finite values"
