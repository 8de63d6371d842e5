"""Parity tests for the fused W4A8 decode-layer kernels (interpret mode).

Oracle = the exact unfused op chain these kernels replace
(ops/norms.rms_norm -> quant._linear_w4 CPU A8 math -> models/llada._act
swiglu -> residual add), so any divergence is a kernel bug, not a
tolerance choice.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lavida_mod_tpu.ops import quant
from lavida_mod_tpu.ops.norms import rms_norm
from lavida_mod_tpu.ops.pallas_w4 import quantize_w4_grouped
from lavida_mod_tpu.ops.w4_fused import (
    w4_ffn_fused,
    w4_matmul_res,
    w4_qkv_norm,
)

GROUP = 128


def _mk_w4(rng, K, N):
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    packed, scales = quantize_w4_grouped(w, group=GROUP)
    return {"kernel_p4": jnp.asarray(packed),
            "scales4": jnp.asarray(scales)}


def _lin(x, p):
    # CPU fallback of quant.linear mirrors the kernel's W4A8 math
    return quant._linear_w4(x, p)


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)


# kernel-vs-CPU-fallback band: 2% (test_pallas_w4.py:144 — bf16
# rounding differences between the in-kernel and CPU A8 paths); the
# fused FFN chains two such stages, so 3%.
TOL = 0.02
TOL_CHAIN = 0.03


def test_qkv_norm_matches_unfused():
    rng = np.random.default_rng(0)
    T, D, N = 32, 256, 384
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    nw = jnp.asarray(rng.standard_normal((D,)), jnp.bfloat16)
    p = _mk_w4(rng, D, N)

    got = w4_qkv_norm(x, nw, p["kernel_p4"], p["scales4"],
                      eps=1e-5, block_n=128, interpret=True)
    want = _lin(rms_norm(x, nw, 1e-5), p)
    assert _rel_err(got, want) < TOL


@pytest.mark.parametrize("K,N", [(256, 256), (384, 128)])
def test_matmul_res_matches_unfused(K, N):
    rng = np.random.default_rng(1)
    T = 32
    a = jnp.asarray(rng.standard_normal((T, K)), jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((T, N)), jnp.bfloat16)
    p = _mk_w4(rng, K, N)

    got = w4_matmul_res(a, res, p["kernel_p4"], p["scales4"],
                        block_n=128, interpret=True)
    want = res + _lin(a, p)
    assert _rel_err(got, want) < TOL


@pytest.mark.parametrize("D,H", [(256, 384), (512, 512)])
def test_ffn_fused_matches_unfused(D, H):
    rng = np.random.default_rng(2)
    T = 32
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    nw = jnp.asarray(1.0 + 0.1 * rng.standard_normal((D,)), jnp.bfloat16)
    up = _mk_w4(rng, D, 2 * H)       # fused [up|gate]
    dn = _mk_w4(rng, H, D)

    got = w4_ffn_fused(x, nw, up["kernel_p4"], up["scales4"],
                       dn["kernel_p4"], dn["scales4"],
                       eps=1e-5, block_n=128, interpret=True)

    h = rms_norm(x, nw, 1e-5)
    ug = _lin(h, up)
    xx, gate = jnp.split(ug, 2, axis=-1)
    inter = jax.nn.silu(gate) * xx
    want = x + _lin(inter, dn)
    assert _rel_err(got, want) < TOL_CHAIN


def test_ffn_fused_padded_down_k():
    """Down-matmul K rows zero-padded past the true intermediate width
    (ops/pallas_w4.padded_in_dim, e.g. Qwen2 18944 -> 20480): the kernel
    zero-fills the padded activation blocks, so the result matches the
    unpadded oracle exactly (zero rows contribute exactly 0)."""
    rng = np.random.default_rng(5)
    T, D, H, Hd = 32, 256, 384, 512
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    nw = jnp.asarray(1.0 + 0.1 * rng.standard_normal((D,)), jnp.bfloat16)
    up = _mk_w4(rng, D, 2 * H)
    w = rng.standard_normal((H, D)).astype(np.float32) * 0.05
    packed, scales = quantize_w4_grouped(
        np.pad(w, ((0, Hd - H), (0, 0))), group=GROUP)
    dn_pad = {"kernel_p4": jnp.asarray(packed),
              "scales4": jnp.asarray(scales)}
    dn_ref = _mk_w4(rng, H, D)
    dn_ref["kernel_p4"], dn_ref["scales4"] = (
        jnp.asarray(quantize_w4_grouped(w, group=GROUP)[0]),
        jnp.asarray(quantize_w4_grouped(w, group=GROUP)[1]),
    )

    got = w4_ffn_fused(x, nw, up["kernel_p4"], up["scales4"],
                       dn_pad["kernel_p4"], dn_pad["scales4"],
                       eps=1e-5, block_n=128, interpret=True)

    h = rms_norm(x, nw, 1e-5)
    ug = _lin(h, up)
    xx, gate = jnp.split(ug, 2, axis=-1)
    inter = jax.nn.silu(gate) * xx
    want = x + _lin(inter, dn_ref)       # unpadded oracle
    want_pad = x + _lin(inter, dn_pad)   # _linear_w4 pads activations
    np.testing.assert_allclose(np.asarray(want_pad, np.float32),
                               np.asarray(want, np.float32), atol=0)
    assert _rel_err(got, want) < TOL_CHAIN


def test_ffn_fused_matches_composed_kernels():
    """w4_ffn_fused vs [w4_qkv_norm -> swiglu -> w4_matmul_res]:
    identical math, one call vs three.  Bit-parity is NOT achievable —
    the f32 norm/amax reductions compile with different orders in
    different kernels, flipping A8 codes on rounding boundaries (+-1
    code = ~0.8% local error; measured 0.66% here) — so the contract is
    the quant noise band: an indexing bug (wrong scale row, swapped
    block) would produce 10-100x larger error."""
    rng = np.random.default_rng(4)
    T, D, H = 32, 512, 512
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    nw = jnp.asarray(1.0 + 0.1 * rng.standard_normal((D,)), jnp.bfloat16)
    up = _mk_w4(rng, D, 2 * H)
    dn = _mk_w4(rng, H, D)

    fused = w4_ffn_fused(x, nw, up["kernel_p4"], up["scales4"],
                         dn["kernel_p4"], dn["scales4"],
                         eps=1e-5, block_n=128, interpret=True)

    ug = w4_qkv_norm(x, nw, up["kernel_p4"], up["scales4"],
                     eps=1e-5, block_n=128, interpret=True)
    xx, gate = jnp.split(ug, 2, axis=-1)
    inter = (jax.nn.silu(gate) * xx).astype(jnp.bfloat16)
    composed = w4_matmul_res(inter, x, dn["kernel_p4"], dn["scales4"],
                             block_n=128, interpret=True)
    assert _rel_err(fused, composed) < TOL


def test_ffn_fused_error_vs_float_truth():
    """The fused path must not degrade quality: its error against the
    UNQUANTIZED float FFN stays in the same band as the unfused W4A8
    chain's error (quantization noise dominates both)."""
    rng = np.random.default_rng(5)
    T, D, H = 32, 256, 384
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    nw = jnp.asarray(1.0 + 0.1 * rng.standard_normal((D,)), jnp.bfloat16)
    w_up = rng.standard_normal((D, 2 * H)).astype(np.float32) * 0.05
    w_dn = rng.standard_normal((H, D)).astype(np.float32) * 0.05
    pu, su = quantize_w4_grouped(w_up, group=GROUP)
    pd, sd = quantize_w4_grouped(w_dn, group=GROUP)
    up = {"kernel_p4": jnp.asarray(pu), "scales4": jnp.asarray(su)}
    dn = {"kernel_p4": jnp.asarray(pd), "scales4": jnp.asarray(sd)}

    # float truth (no quantization anywhere)
    h = rms_norm(x, nw, 1e-5).astype(jnp.float32)
    ug = h @ w_up
    xx, gate = np.split(np.asarray(ug, np.float32), 2, axis=-1)
    inter = xx * (gate / (1 + np.exp(-gate)))
    truth = np.asarray(x, np.float32) + inter @ w_dn

    fused = w4_ffn_fused(x, nw, up["kernel_p4"], up["scales4"],
                         dn["kernel_p4"], dn["scales4"],
                         eps=1e-5, block_n=128, interpret=True)
    hq = rms_norm(x, nw, 1e-5)
    ugq = _lin(hq, up)
    xxq, gq = jnp.split(ugq, 2, axis=-1)
    unfused = x + _lin(jax.nn.silu(gq) * xxq, dn)

    e_fused = _rel_err(fused, truth)
    e_unfused = _rel_err(unfused, truth)
    assert e_fused < max(1.5 * e_unfused, 0.02), (e_fused, e_unfused)


def test_block_forward_fused_vs_unfused(monkeypatch):
    """End-to-end: llada.forward with the fused decode path
    (FORCE_FUSED_INTERPRET) matches the unfused int4 forward on a
    512-divisible sequential/swiglu config — the auto-engage plan
    (models/llada.py::_w4_fused_plan) picks the kernels and the logits
    stay inside the A8 code-flip band."""
    from lavida_mod_tpu.config import LLaDAConfig
    from lavida_mod_tpu.models import llada

    cfg = LLaDAConfig(
        d_model=512, n_heads=4, n_layers=2, mlp_hidden_size=1024,
        block_type="sequential", activation="swiglu",
        vocab_size=512, embedding_size=512, mask_token_id=3,
        max_sequence_length=128, rope_theta=10000.0,
    )
    key = jax.random.PRNGKey(0)
    p = llada.init_params(cfg, key, jnp.bfloat16)
    p = llada.quantize_params(llada.unstack_blocks(p), bits=4)
    # auto-plan must accept this geometry
    plan = llada._w4_fused_plan(cfg, p["blocks"][0], rows=32,
                                act_int8=False)
    assert plan is None  # cpu backend, not forced
    monkeypatch.setattr(llada, "FORCE_FUSED_INTERPRET", True)
    plan = llada._w4_fused_plan(cfg, p["blocks"][0], rows=32,
                                act_int8=False)
    assert plan is not None and plan["bn_ffn"] == 512

    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 512),
                            jnp.bfloat16) * 0.1
    fused, _ = llada.forward(p, cfg, emb)
    monkeypatch.setattr(llada, "FORCE_FUSED_INTERPRET", False)
    unfused, _ = llada.forward(p, cfg, emb)
    assert _rel_err(fused, unfused) < 0.05


def test_qkv_norm_t_blocked_matches_whole_t():
    """The 2-D (n, t) grid variant must equal the 1-D whole-T kernel."""
    rng = np.random.default_rng(8)
    T, D, N = 256, 256, 384
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    nw = jnp.asarray(1.0 + 0.1 * rng.standard_normal((D,)), jnp.bfloat16)
    p = _mk_w4(rng, D, N)
    whole = w4_qkv_norm(x, nw, p["kernel_p4"], p["scales4"],
                        eps=1e-5, block_n=128, interpret=True)
    blocked = w4_qkv_norm(x, nw, p["kernel_p4"], p["scales4"],
                          eps=1e-5, block_n=128, interpret=True,
                          block_t=128)
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(blocked))


def test_qkv_norm_bias_epilogue():
    """Qwen2-family QKV bias: added in the kernel epilogue after the
    row-scale, matching `linear(...)`'s `y + bias` order."""
    rng = np.random.default_rng(6)
    T, D, N = 16, 256, 384
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    nw = jnp.asarray(1.0 + 0.1 * rng.standard_normal((D,)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((N,)), jnp.bfloat16)
    p = _mk_w4(rng, D, N)

    got = w4_qkv_norm(x, nw, p["kernel_p4"], p["scales4"], bias=b,
                      eps=1e-5, block_n=128, interpret=True)
    want = _lin(rms_norm(x, nw, 1e-5), p) + b.astype(jnp.bfloat16)
    assert _rel_err(got, want) < TOL


def test_block_forward_fused_dream_geometry(monkeypatch):
    """Dream/Qwen2 shape class: GQA + QKV bias through to_fused_layout;
    the fused plan must engage (bias allowed on att_proj only) and match
    the unfused int4 forward."""
    from lavida_mod_tpu.config import LLaDAConfig
    from lavida_mod_tpu.models import llada

    cfg = LLaDAConfig(
        d_model=512, n_heads=4, n_kv_heads=2, n_layers=2,
        mlp_hidden_size=1536, block_type="llama", activation="silu",
        include_qkv_bias=True, vocab_size=512, embedding_size=512,
        mask_token_id=3, max_sequence_length=128, rope_theta=10000.0,
    )
    key = jax.random.PRNGKey(0)
    p = llada.init_params(cfg, key, jnp.bfloat16)
    rng = np.random.default_rng(7)
    for nm in ("q_proj", "k_proj", "v_proj"):
        b = p["blocks"][nm]["bias"]
        p["blocks"][nm]["bias"] = jnp.asarray(
            rng.standard_normal(b.shape) * 0.1, b.dtype)
    p = llada.unstack_blocks(p)
    p, fcfg = llada.to_fused_layout(p, cfg)
    p = llada.quantize_params(p, bits=4)
    monkeypatch.setattr(llada, "FORCE_FUSED_INTERPRET", True)
    plan = llada._w4_fused_plan(fcfg, p["blocks"][0], rows=32,
                                act_int8=False)
    assert plan is not None and "bias" in p["blocks"][0]["att_proj"]

    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 512),
                            jnp.bfloat16) * 0.1
    fused, _ = llada.forward(p, fcfg, emb)
    monkeypatch.setattr(llada, "FORCE_FUSED_INTERPRET", False)
    unfused, _ = llada.forward(p, fcfg, emb)
    assert _rel_err(fused, unfused) < 0.05


def test_fused_head_logits_parity(monkeypatch):
    """ln_f + int4 head fused via w4_qkv_norm matches the unfused
    apply_norm -> linear logits, including the __trim__ vocab pad
    (odd vocab -> 512-pad like Dream's 151936 head)."""
    from lavida_mod_tpu.config import LLaDAConfig
    from lavida_mod_tpu.models import llada

    cfg = LLaDAConfig(
        d_model=512, n_heads=4, n_layers=2, mlp_hidden_size=1024,
        block_type="sequential", activation="swiglu",
        vocab_size=500, embedding_size=500, mask_token_id=3,
        max_sequence_length=128, rope_theta=10000.0,
    )
    p = llada.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    p = llada.quantize_params(llada.unstack_blocks(p), bits=4)
    assert any(k.startswith("__trim_") for k in p["ff_out"])
    assert llada._w4_head_fusable(cfg, p, p["ff_out"], 32) is False  # cpu

    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 512),
                            jnp.bfloat16) * 0.1
    unfused, _ = llada.forward(p, cfg, emb)
    monkeypatch.setattr(llada, "FORCE_FUSED_INTERPRET", True)
    assert llada._w4_head_fusable(cfg, p, p["ff_out"], 32)
    fused, _ = llada.forward(p, cfg, emb)
    assert fused.shape == unfused.shape == (1, 32, 500)
    assert _rel_err(fused, unfused) < 0.05


def test_ffn_fused_llada_geometry_blocks():
    """Exercise the 8B block decomposition (D=4096, H=12288 scaled down
    by 8 keeps the same kd/bpk/gpb structure: kd>1, bpk>1, gpb>1)."""
    rng = np.random.default_rng(3)
    T, D, H = 16, 512, 1536
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    nw = jnp.ones((D,), jnp.bfloat16)
    up = _mk_w4(rng, D, 2 * H)
    dn = _mk_w4(rng, H, D)

    got = w4_ffn_fused(x, nw, up["kernel_p4"], up["scales4"],
                       dn["kernel_p4"], dn["scales4"],
                       eps=1e-5, block_n=256, interpret=True)
    h = rms_norm(x, nw, 1e-5)
    ug = _lin(h, up)
    xx, gate = jnp.split(ug, 2, axis=-1)
    want = x + _lin(jax.nn.silu(gate) * xx, dn)
    assert _rel_err(got, want) < TOL_CHAIN
