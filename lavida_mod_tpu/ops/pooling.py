"""2D spatial token pooling (reference llava_arch.py:198-233 get_2dPool).

Operates on projected vision tokens [N, g*g, D].  Torch semantics preserved:
  - "average"/"max": kernel=stride (F.avg_pool2d(x, stride)) -> floor(g/s)
  - "bilinear": F.interpolate to ceil(g/s) with align_corners=False, which is
    jax.image.resize's half-pixel convention.
LaViDa's default is bilinear stride 2: 27x27=729 -> 14x14=196 per view.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_no_antialias(grid: jax.Array, go: int) -> jax.Array:
    """Torch F.interpolate(mode='bilinear', align_corners=False,
    antialias=False) semantics — jax.image.resize antialiases on downscale,
    torch does not, so we interpolate by explicit 2-tap gathers."""
    N, g, _, D = grid.shape
    grid = grid.astype(jnp.float32)
    scale = g / go
    src = jnp.maximum((jnp.arange(go, dtype=jnp.float32) + 0.5) * scale - 0.5, 0.0)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, g - 1)
    w1 = src - i0.astype(jnp.float32)
    w0 = 1.0 - w1
    rows = (
        grid[:, i0] * w0[None, :, None, None]
        + grid[:, i1] * w1[None, :, None, None]
    )
    return (
        rows[:, :, i0] * w0[None, None, :, None]
        + rows[:, :, i1] * w1[None, None, :, None]
    )


def pool_2d(x: jax.Array, mode: str = "bilinear", stride: int = 2) -> jax.Array:
    """x: [N, T, D] with T a perfect square. Returns [N, T', D]."""
    N, T, D = x.shape
    g = int(round(float(np.sqrt(T))))
    assert g * g == T, (g, T)
    grid = x.reshape(N, g, g, D)
    if mode == "average":
        go = g // stride
        t = grid[:, : go * stride, : go * stride].reshape(
            N, go, stride, go, stride, D
        )
        out = t.mean(axis=(2, 4))
    elif mode == "max":
        go = g // stride
        t = grid[:, : go * stride, : go * stride].reshape(
            N, go, stride, go, stride, D
        )
        out = t.max(axis=(2, 4))
    elif mode == "bilinear":
        go = math.ceil(g / stride)
        out = _bilinear_no_antialias(grid, go).astype(x.dtype)
    else:
        raise ValueError(f"Unexpected pool mode: {mode}")
    return out.reshape(N, -1, D)
