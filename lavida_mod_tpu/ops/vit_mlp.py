"""Fused ViT MLP half-block: LayerNorm -> fc1 -> gelu(tanh) -> fc2 -> +res
in ONE Pallas kernel.

The serving vision encode sits ~10 ms above its ~15 ms matmul roofline
(NOTES_ROUND5 decomposition: per-op VPU glue — norms/gelu/residuals each
cost an HBM round-trip of the [3645, D] activations between XLA fusions).
The MLP half of a SigLIP block is 60% of its FLOPs and carries three of
those passes (LN2, gelu, residual add).  This kernel keeps the activation
tile resident in VMEM across the whole chain and streams each weight
matrix exactly once:

  grid (m_tiles, f_tiles), f arbitrary/sequential:
    j == 0:       ln_x <- LayerNorm(x_tile)       (VMEM scratch)
    every j:      acc  += gelu(ln_x @ W1[:,j] + b1[j]) @ W2[j,:]
    j == last:    out  <- x_tile + acc + b2        (bf16, one write)

Weight traffic is the same as XLA's (W1+W2 once); activation traffic
drops from ~6 HBM passes (LN read+write, fc1 out, gelu out, fc2 out,
residual) to one read + one write.  Inference-only (the training path
keeps the differentiable XLA ops; reference counterpart
siglip_encoder.py:462-809 runs torch eager with the same op list).

A/B on the real chip drives the keep/kill decision — see
scripts/probes/_vit_mlp_ab.py and NOTES_ROUND6.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            out_ref, ln_s, acc_s, *, eps: float, n_f: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        ln = (xf - mu) * jax.lax.rsqrt(var + eps)
        ln_s[:] = (ln * g_ref[:].astype(jnp.float32)
                   + b_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
        acc_s[:] = jnp.zeros_like(acc_s)

    h = jnp.dot(ln_s[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h + b1_ref[:].astype(jnp.float32), approximate=True)
    acc_s[:] += jnp.dot(h.astype(x_ref.dtype), w2_ref[:],
                        preferred_element_type=jnp.float32)

    @pl.when(j == n_f - 1)
    def _():
        out_ref[:] = (x_ref[:].astype(jnp.float32) + acc_s[:]
                      + b2_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps",))
def fused_vit_mlp(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                  w1: jax.Array, b1: jax.Array, w2: jax.Array,
                  b2: jax.Array, *, eps: float = 1e-6) -> jax.Array:
    """x: [N, T, D] -> x + fc2(gelu(fc1(LN(x)))) with tanh-gelu.

    Shapes: w1 [D, F], w2 [F, D]; D must be lane-aligned (128|D — so400m's
    1152 is); T*N and F are padded internally."""
    N, T, D = x.shape
    M = N * T
    F = w1.shape[1]
    assert D % 128 == 0, D

    TILE_M = 512
    TILE_F = 512
    Mp = -(-M // TILE_M) * TILE_M
    Fp = -(-F // TILE_F) * TILE_F

    xf = x.reshape(M, D)
    if Mp != M:
        xf = jnp.pad(xf, ((0, Mp - M), (0, 0)))
    if Fp != F:
        # zero-padded fc1 columns: bias pad 0 -> gelu(0) = 0 -> zero
        # contribution through the zero-padded fc2 rows
        w1 = jnp.pad(w1, ((0, 0), (0, Fp - F)))
        b1 = jnp.pad(b1, (0, Fp - F))
        w2 = jnp.pad(w2, ((0, Fp - F), (0, 0)))

    n_m = Mp // TILE_M
    n_f = Fp // TILE_F

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, n_f=n_f),
        grid=(n_m, n_f),
        in_specs=[
            pl.BlockSpec((TILE_M, D), lambda i, j: (i, 0)),        # x
            pl.BlockSpec((1, D), lambda i, j: (0, 0)),             # gamma
            pl.BlockSpec((1, D), lambda i, j: (0, 0)),             # beta
            pl.BlockSpec((D, TILE_F), lambda i, j: (0, j)),        # w1
            pl.BlockSpec((1, TILE_F), lambda i, j: (0, j)),        # b1
            pl.BlockSpec((TILE_F, D), lambda i, j: (j, 0)),        # w2
            pl.BlockSpec((1, D), lambda i, j: (0, 0)),             # b2
        ],
        out_specs=pl.BlockSpec((TILE_M, D), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, D), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TILE_M, D), x.dtype),        # ln_x
            pltpu.VMEM((TILE_M, D), jnp.float32),    # accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(xf, gamma.reshape(1, D), beta.reshape(1, D), w1,
      b1.reshape(1, Fp), w2, b2.reshape(1, D))
    return out[:M].reshape(N, T, D)
