"""Pallas row-gather kernel tests (interpret mode on CPU; the same kernel
is validated compiled on the real chip — 1.8x XLA's gather, see
NOTES_ROUND2.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lavida_mod_tpu.ops.pallas_gather import (
    gather_rows,
    gather_rows_ad,
    gather_rows_auto,
)


@pytest.mark.parametrize("T", [1, 7, 8, 17, 64])
def test_gather_rows_interpret(T):
    rng = np.random.default_rng(T)
    table = jnp.asarray(rng.standard_normal((50, 256)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 50, size=T).astype(np.int32))
    out = gather_rows(table, idx, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(table)[np.asarray(idx)]
    )


def test_gather_rows_bf16_interpret():
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.standard_normal((30, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    idx = jnp.asarray([0, 29, 3, 3, 15], dtype=jnp.int32)
    out = gather_rows(table, idx, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out, np.float32),
        np.asarray(table, np.float32)[np.asarray(idx)],
    )


def test_gather_rows_ad_grad_matches_xla():
    """The TPU splice gather must be differentiable (train/step.py runs
    jax.grad through multimodal_embeds); the custom VJP's scatter-add must
    equal XLA-gather's gradient, including duplicate indices."""
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((20, 128)).astype(np.float32))
    idx = jnp.asarray([3, 3, 0, 19, 7], dtype=jnp.int32)
    w = jnp.asarray(rng.standard_normal((5, 128)).astype(np.float32))

    def loss_pallas(t):
        return jnp.sum(gather_rows_ad(t, idx, True) * w)

    def loss_xla(t):
        return jnp.sum(t[idx] * w)

    g_pallas = jax.grad(loss_pallas)(table)
    g_xla = jax.grad(loss_xla)(table)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-6)
    # value path unchanged
    np.testing.assert_allclose(
        np.asarray(gather_rows_ad(table, idx, True)),
        np.asarray(table)[np.asarray(idx)],
    )


def test_gather_rows_ad_bf16_grad_dtype():
    table = jnp.ones((8, 128), jnp.bfloat16)
    idx = jnp.asarray([0, 1], dtype=jnp.int32)
    g = jax.grad(lambda t: jnp.sum(gather_rows_ad(t, idx, True).astype(jnp.float32)))(table)
    assert g.dtype == jnp.bfloat16
    assert g.shape == table.shape


def test_auto_falls_back_off_tpu():
    # CPU backend in tests -> must use the XLA path (and non-128 widths)
    table = jnp.ones((10, 60))
    idx = jnp.asarray([1, 2], dtype=jnp.int32)
    out = gather_rows_auto(table, idx)
    assert out.shape == (2, 60)
