"""Parity: prefix_flash_attention (Pallas, interpret mode on CPU) vs the
dense make_bias + dense_attention path — forward and gradients, MHA and
GQA, padded and unpadded lengths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lavida_mod_tpu.ops import prefix_flash
from lavida_mod_tpu.ops.attention import dense_attention, make_bias


@pytest.fixture(autouse=True)
def _interpret():
    prefix_flash._INTERPRET[0] = True
    yield
    prefix_flash._INTERPRET[0] = False


def _dense_ref(q, k, v, plen, kv_valid):
    T, S = q.shape[1], k.shape[1]
    bias = make_bias(
        kv_valid=kv_valid, prefix_lengths=plen,
        q_positions=jnp.arange(T), kv_positions=jnp.arange(S))
    return dense_attention(q, k, v, bias=bias)


def _mk(B, T, Hq, Hkv, hd, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, T, Hq, hd), dtype)
    k = jax.random.normal(ks[1], (B, T, Hkv, hd), dtype)
    v = jax.random.normal(ks[2], (B, T, Hkv, hd), dtype)
    return q, k, v


@pytest.mark.parametrize("Hq,Hkv", [(4, 4), (4, 2)])
def test_forward_parity(Hq, Hkv):
    B, T, hd = 2, 256, 128
    q, k, v = _mk(B, T, Hq, Hkv, hd)
    plen = jnp.array([37, 190], jnp.int32)
    out = prefix_flash.prefix_flash_attention(
        q, k, v, plen, block_q=128, block_k=128)
    ref = _dense_ref(q, k, v, plen, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_forward_parity_padded_and_kvvalid():
    """T=200 (not a block multiple) with trailing padding rows marked
    invalid: kernel pads to 256 internally."""
    B, T, hd = 2, 200, 128
    q, k, v = _mk(B, T, 4, 4, hd, seed=1)
    valid = jnp.arange(T)[None, :] < jnp.array([[200], [150]])
    plen = jnp.array([0, 64], jnp.int32)
    out = prefix_flash.prefix_flash_attention(
        q, k, v, plen, valid, block_q=128, block_k=128)
    ref = _dense_ref(q, k, v, plen, valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("Hq,Hkv", [(2, 2), (4, 2)])
def test_grad_parity(Hq, Hkv):
    B, T, hd = 2, 128, 128
    q, k, v = _mk(B, T, Hq, Hkv, hd, seed=2)
    plen = jnp.array([16, 100], jnp.int32)
    valid = jnp.arange(T)[None, :] < jnp.array([[128], [110]])

    def f_ker(q, k, v):
        o = prefix_flash.prefix_flash_attention(
            q, k, v, plen, valid, block_q=128, block_k=128)
        return jnp.sum(o * jnp.cos(o))

    def f_ref(q, k, v):
        o = _dense_ref(q, k, v, plen, valid)
        return jnp.sum(o * jnp.cos(o))

    gk = jax.grad(f_ker, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=3e-4,
            err_msg=f"d{name}")


def test_diffusion_loss_grads_match_dense():
    """Full training objective (scan + remat + doubled batch): loss and
    parameter gradients with the kernel match the dense-bias path."""
    from lavida_mod_tpu.config import tiny_llada_config
    from lavida_mod_tpu.models import llada as L
    from lavida_mod_tpu.train.loss import diffusion_loss

    cfg = tiny_llada_config()
    params = L.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    B, T = 2, 128
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, 500)
    emb = L.embed_tokens(params, ids)
    labels = np.array(ids)
    labels[:, :40] = -100  # prompt region
    labels = jnp.asarray(labels)
    key = jax.random.PRNGKey(3)

    def loss_with(impl, p):
        loss, _ = diffusion_loss(p, cfg, emb, labels, key,
                                 prefix_lm=True, attention_impl=impl)
        return loss

    ld, gd = jax.value_and_grad(lambda p: loss_with("dense", p))(params)
    lk, gk = jax.value_and_grad(
        lambda p: loss_with("prefix_flash", p))(params)
    np.testing.assert_allclose(float(ld), float(lk), rtol=1e-5)
    flat_d = jax.tree.leaves(gd)
    flat_k = jax.tree.leaves(gk)
    for a, b in zip(flat_d, flat_k):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3)


def test_sharded_train_step_with_kernel_runs():
    """pjit train step on the 8-device CPU mesh with
    attention_impl='prefix_flash': the shard_map wrapper must partition
    the Mosaic call (GSPMD cannot) and the loss must match dense."""
    import jax.numpy as jnp
    from lavida_mod_tpu.config import LaViDaConfig, tiny_llada_config
    from lavida_mod_tpu.models import llada as L
    from lavida_mod_tpu.parallel.mesh import make_mesh
    from lavida_mod_tpu.parallel.sharding import shard_params
    from lavida_mod_tpu.train.step import (jit_train_step, make_optimizer,
                                           make_train_step)

    cfg = LaViDaConfig(llada=tiny_llada_config())
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    opt = make_optimizer(lr=1e-2, total_steps=10)

    losses = {}
    for impl in ("dense", "prefix_flash"):
        # fresh params per impl: the jitted step donates its inputs
        p = shard_params(
            L.init_params(cfg.llada, jax.random.PRNGKey(0)), mesh)
        st = opt.init(p)
        step = jit_train_step(make_train_step(
            cfg, opt, prefix_lm=True, remat=True, mesh=mesh,
            attention_impl=impl))
        ids = np.arange(3, 3 + 8 * 128).reshape(8, 128) % 400
        labels = np.array(ids)
        labels[:, :40] = -100
        batch = {
            "inputs_embeds": L.embed_tokens(p, jnp.asarray(ids)),
            "labels": jnp.asarray(labels),
        }
        _, _, metrics = step(p, st, batch, jax.random.PRNGKey(7))
        losses[impl] = float(metrics["loss"])
    np.testing.assert_allclose(losses["dense"], losses["prefix_flash"],
                               rtol=1e-4)


def test_multimodal_train_step_prefix_flash_matches_dense():
    """The path train.py's --attn-impl flag enables: the FULL multimodal
    train step (pixels -> tower -> splice -> diffusion loss) with
    attention_impl='prefix_flash' produces the same loss as dense."""
    from lavida_mod_tpu.config import (LaViDaConfig, VisionConfig,
                                       tiny_llada_config,
                                       tiny_siglip_config)
    from lavida_mod_tpu.models import multimodal as mm
    from lavida_mod_tpu.train.step import (jit_train_step, make_optimizer,
                                           make_multimodal_train_step)

    cfg = LaViDaConfig(
        llada=tiny_llada_config(),
        vision=VisionConfig(siglip=tiny_siglip_config(), mm_hidden_size=32,
                            grid_pinpoints=((56, 112), (112, 56),
                                            (112, 112))),
    )
    params0 = mm.init_params(cfg, jax.random.PRNGKey(0))
    opt = make_optimizer(lr=1e-3, total_steps=10)

    rng = np.random.default_rng(0)
    S = cfg.vision.siglip.image_size
    pix = jnp.asarray(rng.standard_normal((5, 3, S, S)), jnp.float32)
    ids = [list(range(3, 20)) + [-200] + list(range(5, 40))]
    # (64,64) at the tiny pinpoints -> 2x2 anyres grid = 4 tiles + base
    gather_idx, text_ids, valid, labels = mm.build_gather_plan(
        cfg, [np.asarray(ids[0])], [[5]], [[(64, 64)]],
        [np.asarray([-100] * 30 + list(range(7, 7 + len(ids[0]) - 30)))],
        pad_to=128,
    )
    batch = {
        "pixel_values": pix, "text_ids": jnp.asarray(text_ids),
        "gather_idx": jnp.asarray(gather_idx),
        "labels": jnp.asarray(labels),
    }

    losses = {}
    for impl in ("dense", "prefix_flash"):
        p = jax.tree.map(jnp.copy, params0)  # step donates its inputs
        st = opt.init(p)
        step = jit_train_step(make_multimodal_train_step(
            cfg, opt, prefix_lm=True, remat=True, attention_impl=impl))
        _, _, metrics = step(p, st, batch, jax.random.PRNGKey(7))
        losses[impl] = float(metrics["loss"])
    np.testing.assert_allclose(losses["dense"], losses["prefix_flash"],
                               rtol=1e-4)


def test_matches_model_forward_training_mask():
    """End-to-end: llada.forward(attention_impl='prefix_flash') ==
    default dense path on the tiny config with per-row prefix lengths."""
    from lavida_mod_tpu.config import tiny_llada_config
    from lavida_mod_tpu.models import llada as L

    cfg = tiny_llada_config()
    params = L.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    B, T = 2, 160
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, 500)
    emb = L.embed_tokens(params, ids)
    plen = jnp.array([13, 70], jnp.int32)
    logits_d, _ = L.forward(params, cfg, emb, prefix_lengths=plen)
    logits_k, _ = L.forward(params, cfg, emb, prefix_lengths=plen,
                            attention_impl="prefix_flash")
    np.testing.assert_allclose(np.asarray(logits_d), np.asarray(logits_k),
                               atol=2e-3, rtol=2e-3)
