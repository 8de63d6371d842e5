"""int4-packed matmul kernel tests (interpret mode; validated compiled on
the real chip — see ops/pallas_w4.py status note)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lavida_mod_tpu.ops.pallas_w4 import (
    pack_w4, split_even_odd, unpack_w4_reference, w4_matmul,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.integers(-8, 8, size=(16, 8)).astype(np.int32)
    packed = pack_w4(w)
    assert packed.shape == (8, 8) and packed.dtype == np.int8
    np.testing.assert_array_equal(unpack_w4_reference(packed), w)


def test_w4_matmul_interpret():
    rng = np.random.default_rng(1)
    K, N, T = 64, 256, 4
    w = rng.integers(-8, 8, size=(K, N)).astype(np.int32)
    scale = rng.uniform(0.5, 2.0, size=N).astype(np.float32)
    x = rng.standard_normal((T, K)).astype(np.float32)

    out = w4_matmul(
        split_even_odd(jnp.asarray(x).astype(jnp.bfloat16)),
        jnp.asarray(pack_w4(w)),
        jnp.asarray(scale),
        block_n=128,
        interpret=True,
    )
    ref = (x @ w.astype(np.float32)) * scale
    rel = np.abs(np.asarray(out, np.float32) - ref).max() / (
        np.abs(ref).max() + 1e-9
    )
    assert rel < 0.02, rel  # bf16 operand rounding


def test_split_even_odd():
    x = jnp.arange(12, dtype=jnp.float32).reshape(2, 6)
    s = np.asarray(split_even_odd(x))
    np.testing.assert_array_equal(s[0], np.asarray(x)[:, 0::2])
    np.testing.assert_array_equal(s[1], np.asarray(x)[:, 1::2])
