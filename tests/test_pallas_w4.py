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


def test_grouped_quantize_roundtrip_accuracy():
    from lavida_mod_tpu.ops.pallas_w4 import (
        dequant_w4_grouped, quantize_w4_grouped,
    )

    rng = np.random.default_rng(2)
    w = rng.standard_normal((256, 128)).astype(np.float32)
    packed, scales = quantize_w4_grouped(w, group=64)
    wd = dequant_w4_grouped(packed, scales, group=64)
    # int4-g64 symmetric: per-element error bounded by scale/2
    rel = np.abs(wd - w).max() / np.abs(w).max()
    assert rel < 0.12, rel
    # correlation stays high
    corr = np.corrcoef(w.ravel(), wd.ravel())[0, 1]
    assert corr > 0.99


def test_w4_matmul_grouped_interpret():
    from lavida_mod_tpu.ops.pallas_w4 import (
        dequant_w4_grouped, quantize_w4_grouped, w4_matmul_grouped,
    )

    rng = np.random.default_rng(3)
    K, N, T, group = 128, 256, 4, 64
    w = rng.standard_normal((K, N)).astype(np.float32)
    packed, scales = quantize_w4_grouped(w, group=group)
    x = rng.standard_normal((T, K)).astype(np.float32)
    out = w4_matmul_grouped(
        jnp.asarray(x).astype(jnp.bfloat16),
        jnp.asarray(packed), jnp.asarray(scales),
        group=group, block_n=128, interpret=True,
    )
    ref = x @ dequant_w4_grouped(packed, scales, group=group)
    rel = np.abs(np.asarray(out, np.float32) - ref).max() / (
        np.abs(ref).max() + 1e-9
    )
    assert rel < 0.03, rel  # bf16 rounding only


def test_int4_model_path_accuracy():
    """End-to-end int4-g128 model: logits close to f32, generation runs
    (CPU reference-dequant path; the TPU pallas path is numerically the
    same kernel validated on-chip)."""
    import jax

    from lavida_mod_tpu.config import GenerationConfig, tiny_llada_config
    from lavida_mod_tpu.generation import generate
    from lavida_mod_tpu.models import llada as jl

    cfg = tiny_llada_config(d_model=128, n_heads=4, n_kv_heads=4,
                            mlp_hidden_size=256)
    params = jl.init_params(cfg, jax.random.PRNGKey(0))
    p4 = jl.quantize_params(jl.unstack_blocks(params), bits=4, group=64)

    ids = jnp.asarray(np.arange(5, 21)[None])
    base, _ = jl.forward(params, cfg, jl.embed_tokens(params, ids))
    q4, _ = jl.forward(p4, cfg, jl.embed_tokens(p4, ids))
    rel = np.abs(np.asarray(q4) - np.asarray(base)).max() / (
        np.abs(np.asarray(base)).max() + 1e-9
    )
    # int4 noise band on a tiny random net (d_model=128, group=64 is an
    # extreme quantization ratio); the head is ALSO grouped-int4 now
    # (quantize_params bits=4 matches the bench serving layout), which
    # adds its own A8 stage on the logits.  Real-checkpoint quality is
    # gated by scripts/verify_checkpoint.py.
    assert rel < 0.25, rel

    out = generate(p4, cfg, jl.embed_tokens(p4, ids),
                   GenerationConfig(max_new_tokens=8, block_length=8))
    assert (np.asarray(out) != cfg.mask_token_id).all()


def test_w4a8_kernel_matches_cpu_fallback():
    """The interpret-mode Pallas W4A8 kernel and quant._linear_w4's CPU
    branch implement the same math (per-token A8, integer dot, grouped
    scales on the accumulator) — outputs must agree to bf16 rounding."""
    import jax
    import jax.numpy as jnp

    from lavida_mod_tpu.ops.pallas_w4 import (
        quantize_w4_grouped, w4_matmul_grouped,
    )
    from lavida_mod_tpu.ops.quant import _linear_w4

    rng = np.random.default_rng(9)
    K, N, T, group = 256, 256, 8, 128
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    packed, scales = quantize_w4_grouped(w, group=group)
    p = {"kernel_p4": jnp.asarray(packed), "scales4": jnp.asarray(scales)}
    x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    kern = np.asarray(
        w4_matmul_grouped(x, p["kernel_p4"], p["scales4"],
                          group=group, block_n=128, interpret=True),
        np.float32,
    )
    fallback = np.asarray(_linear_w4(x, p), np.float32)
    scale = np.abs(fallback).max() + 1e-9
    assert np.abs(kern - fallback).max() / scale < 0.02


def test_w4_matmul_grouped_nonpow2_k(interpret=True):
    """Dream-geometry K (18944 -> K2 = 2^8*37): block_k must pick a
    divisor of K2 (here 4736 -> K2=2368), not the 2048 default that broke
    the bench --dream path."""
    import numpy as np
    from lavida_mod_tpu.ops.pallas_w4 import (
        dequant_w4_grouped, quantize_w4_grouped, w4_matmul_grouped)

    rng = np.random.default_rng(0)
    T, K, N, group = 16, 4736, 256, 128
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.02
    packed, scales = quantize_w4_grouped(w, group=group)
    x = rng.standard_normal((T, K)).astype(np.float32) * 0.5
    out = np.asarray(w4_matmul_grouped(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(packed),
        jnp.asarray(scales), group=group, block_n=128, interpret=True))
    ref = x @ dequant_w4_grouped(packed, scales, group)
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.02, err


def test_quantize_params_int4_vocab_fallback():
    """Out-dims that miss the 512-column block (Dream's 151936 head) are
    zero-padded onto the int4 path and trimmed after the matmul; only an
    in-dim that breaks the scale grouping falls back to int8."""
    import numpy as np
    from lavida_mod_tpu.models.llada import quantize_params
    from lavida_mod_tpu.ops.quant import linear

    rng = np.random.default_rng(0)
    params = {"blocks": [{
        "a": {"kernel": jnp.asarray(
            rng.standard_normal((256, 512)), jnp.float32)},
        "odd_head": {"kernel": jnp.asarray(
            rng.standard_normal((256, 384)), jnp.float32)},
        "odd_in": {"kernel": jnp.asarray(
            rng.standard_normal((100, 512)), jnp.float32)},
    }]}
    q = quantize_params(params, bits=4)
    blk = q["blocks"][0]
    assert "kernel_p4" in blk["a"] and "scales4" in blk["a"]
    # odd OUT dim: padded int4 + trim metadata, output sliced to 384
    assert "kernel_p4" in blk["odd_head"]
    assert blk["odd_head"]["kernel_p4"].shape[1] == 512
    assert "__trim_384__" in blk["odd_head"]
    x = jnp.asarray(rng.standard_normal((4, 256)), jnp.float32)
    y = linear(x, blk["odd_head"])
    assert y.shape == (4, 384)
    def rel_err(name):
        yy = linear(x, blk[name]).astype(jnp.float32)
        rr = x @ params["blocks"][0][name]["kernel"]
        return float(jnp.max(jnp.abs(yy - rr)) / jnp.max(jnp.abs(rr)))

    # padding must add NOTHING beyond the inherent W4A8 noise at this
    # (small-K) geometry — compare against the aligned 512-out kernel
    assert rel_err("odd_head") < 1.5 * rel_err("a") + 1e-6
    # odd IN dim (breaks the group-128 scales): int8 fallback
    assert "kernel_q" in blk["odd_in"] and "scale" in blk["odd_in"]
    # jit with the quantized tree: trim is static structure, not a leaf
    import jax
    jy = jax.jit(lambda p, x: linear(x, p))(blk["odd_head"], x)
    assert jy.shape == (4, 384)


def test_quantize_linear4_padded_in_dim():
    """Big in-dims without a 2048-deep power-of-two k-block (Qwen2's
    18944 = 2^9*37) get zero-padded rows (pallas_w4.padded_in_dim);
    _linear_w4 zero-pads the activations to match, and the result is
    bit-identical to quantizing without the row pad (zero rows contribute
    exactly 0 in the integer dot)."""
    import numpy as np
    from lavida_mod_tpu.ops.pallas_w4 import padded_in_dim
    from lavida_mod_tpu.ops.quant import linear, quantize_linear4

    assert padded_in_dim(18944) == 20480
    assert padded_in_dim(12288) == 12288   # already 2048-blockable
    assert padded_in_dim(4304) == 4304     # small K stays
    assert padded_in_dim(11008) == 12288   # vicuna FFN

    rng = np.random.default_rng(7)
    K, N = 9472, 128                       # 2^8 * 37: pads to 12288
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    qp = quantize_linear4({"kernel": jnp.asarray(w)})
    assert qp["kernel_p4"].shape[0] == padded_in_dim(K) // 2

    from lavida_mod_tpu.ops.pallas_w4 import quantize_w4_grouped
    packed, scales = quantize_w4_grouped(w)   # unpadded twin
    q_ref = {"kernel_p4": jnp.asarray(packed),
             "scales4": jnp.asarray(scales)}

    x = jnp.asarray(rng.standard_normal((4, K)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(linear(x, qp)), np.asarray(linear(x, q_ref)))


def test_int4_layout_shapes_matches_real_quantizer():
    """ops/quant.int4_layout_shapes (the shape-level twin LaViDa.zero_init
    uses to build weight-free int4 serving layouts — quantize_linear4 is
    host-side numpy and cannot trace through eval_shape) must produce the
    exact pytree structure, shapes and dtypes of quantize_params(bits=4),
    including the odd-out-dim __trim__ metadata and the odd-in-dim int8
    fallback."""
    import jax

    from lavida_mod_tpu.config import tiny_llada_config
    from lavida_mod_tpu.models import llada as jl
    from lavida_mod_tpu.ops.quant import int4_layout_shapes

    # 128-divisible dims so the int4 path engages; vocab 500 exercises the
    # 512-pad + trim; weight_tying=False gives a top-level ff_out head
    cfg = tiny_llada_config(d_model=128, n_heads=4, n_kv_heads=4,
                            mlp_hidden_size=256, vocab_size=500,
                            weight_tying=False)
    params = jl.init_params(cfg, jax.random.PRNGKey(0))
    real = jl.quantize_params(jl.unstack_blocks(params), bits=4)

    shapes = jax.eval_shape(
        lambda k: jl.unstack_blocks(jl.init_params(cfg, k)),
        jax.random.PRNGKey(0))
    twin = int4_layout_shapes(shapes)

    real_td = jax.tree.structure(real)
    twin_td = jax.tree.structure(twin)
    assert real_td == twin_td, (real_td, twin_td)
    for rp, tp in zip(jax.tree.leaves(real), jax.tree.leaves(twin)):
        assert rp.shape == tp.shape, (rp.shape, tp.shape)
        assert rp.dtype == tp.dtype, (rp.dtype, tp.dtype)
