"""Pallas TPU kernel: fused row gather from an HBM table.

The splice step of every forward — training and the serving hot path — is
`table[gather_idx]`: pick T rows (vision tokens / newline / text embeds /
pad) out of a big HBM-resident table (models/multimodal.py
multimodal_embeds; the SHIRG top-K selection is the same primitive with the
indices produced by a top-k).  XLA lowers this to a generic dynamic-gather;
this kernel streams it instead: indices ride scalar prefetch (known before
the body runs, PrefetchScalarGridSpec) and choose each grid step's table
row via the BlockSpec index_map, so the pipeline DMAs exactly the rows
needed, double-buffered by the Pallas grid machinery.

Falls back to `table[idx]` off-TPU; `interpret=True` makes the kernel
CI-testable on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("interpret", "rows_per_block"))
def gather_rows(
    table: jax.Array,      # [N, D]
    idx: jax.Array,        # [T] int32
    interpret: bool = False,
    rows_per_block: int = 8,
) -> jax.Array:
    """table[idx] as a Pallas streamed gather: the table stays in HBM and
    each grid step issues `rows_per_block` row DMAs straight into the
    output's VMEM block (indices known ahead of the body via scalar
    prefetch, so the copies overlap the grid pipeline).  idx in [0, N)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, D = table.shape
    T = idx.shape[0]
    R = rows_per_block
    Tp = -(-T // R) * R
    idx_p = jnp.pad(idx.astype(jnp.int32), (0, Tp - T))
    # each row becomes its own aligned 2D tile [D/128, 128] so per-row DMA
    # slices satisfy the (sublane, lane) tiling constraints
    assert D % 128 == 0, D
    sub = D // 128
    table3 = table.reshape(N, sub, 128)

    def kernel(idx_ref, table_ref, out_ref, sems):
        i = pl.program_id(0)
        for j in range(R):
            pltpu.make_async_copy(
                table_ref.at[idx_ref[i * R + j]],
                out_ref.at[j],
                sems.at[j],
            ).start()
        for j in range(R):
            pltpu.make_async_copy(
                table_ref.at[idx_ref[i * R + j]],
                out_ref.at[j],
                sems.at[j],
            ).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Tp // R,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((R, sub, 128), lambda i, idx_ref: (i, 0, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((R,))],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Tp, sub, 128), table.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx_p, table3)
    return out.reshape(Tp, D)[:T]


@functools.lru_cache(maxsize=None)
def _gather_rows_ad_for(shape, dtype, interpret):
    """Build a custom-VJP gather for a static (table shape, dtype).

    pallas_call has no transpose rule, so differentiating through the raw
    kernel raises NotImplementedError — which would crash every multimodal
    training step on TPU (the splice gather sits between the embedding
    table and the LM).  The VJP of a gather is a scatter-add into a zero
    table (`.at[idx].add(g)`, duplicate indices accumulate, matching
    XLA-gather's gradient); idx is integral so its cotangent is float0.
    Shape/dtype are closed over statically (residuals must be JAX arrays).
    """
    import numpy as np

    @jax.custom_vjp
    def f(table, idx):
        return gather_rows(table, idx, interpret=interpret)

    def fwd(table, idx):
        return gather_rows(table, idx, interpret=interpret), idx

    def bwd(idx, g):
        dtable = (
            jnp.zeros(shape, jnp.promote_types(g.dtype, jnp.float32))
            .at[idx].add(g.astype(jnp.float32))
            .astype(dtype)
        )
        return dtable, np.zeros(idx.shape, dtype=jax.dtypes.float0)

    f.defvjp(fwd, bwd)
    return f


def gather_rows_ad(
    table: jax.Array, idx: jax.Array, interpret: bool = False
) -> jax.Array:
    """`gather_rows` that also works under jax.grad (see _gather_rows_ad_for)."""
    return _gather_rows_ad_for(table.shape, table.dtype, interpret)(table, idx)


def gather_rows_auto(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Pallas on TPU (1.8x XLA's dynamic-gather, measured on v5e for the
    splice shapes), plain XLA gather elsewhere or when the row width isn't
    lane-aligned.  Trace-safe: the backend decision is static.  Uses the
    custom-VJP wrapper so the same call works under jax.grad (training)."""
    if (
        jax.default_backend() == "tpu"
        and table.ndim == 2
        # the kernel views a row as [D//128, 128]; Mosaic's VMEM slice
        # needs the sublane dim (D//128) to be a multiple of 8 too —
        # 4096 (LLaDA) qualifies, 3584 (Dream/Qwen2) does not (measured:
        # tpu_compile_helper crash on the memref_slice)
        and table.shape[1] % 1024 == 0
        and idx.ndim == 1
    ):
        return gather_rows_ad(table, idx)
    return table[idx]
