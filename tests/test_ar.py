"""AR baseline tests: causal masking correctness and fused cached decode
vs a naive full-recompute oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lavida_mod_tpu.config import tiny_llada_config
from lavida_mod_tpu.generation.ar_sampler import ar_generate_fused
from lavida_mod_tpu.models import llada as jl


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_llada_config()
    params = jl.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_causal_mask_blocks_future(tiny):
    """Changing a future token must not change earlier logits under
    causal=True (and must change them under non-causal)."""
    cfg, params = tiny
    ids1 = jnp.asarray(np.arange(5, 15)[None])
    ids2 = ids1.at[0, -1].set(499)

    for causal, expect_same in ((True, True), (False, False)):
        l1, _ = jl.forward(params, cfg, jl.embed_tokens(params, ids1),
                           causal=causal)
        l2, _ = jl.forward(params, cfg, jl.embed_tokens(params, ids2),
                           causal=causal)
        same = np.allclose(np.asarray(l1[0, :5]), np.asarray(l2[0, :5]),
                           atol=1e-6)
        assert same == expect_same, (causal, same)


def test_ar_fused_matches_full_recompute(tiny):
    """Greedy fused decode (fixed-buffer cache) == naive loop that re-runs
    the full causal forward each step."""
    cfg, params = tiny
    prompt = np.arange(5, 15)[None]
    G = 8
    prefix = jl.embed_tokens(params, jnp.asarray(prompt))

    out = np.asarray(ar_generate_fused(
        params, cfg, prefix, jax.random.PRNGKey(0), G,
        eos_id=-1,  # never triggers
    ))

    # oracle: full recompute each step
    seq = list(prompt[0])
    gen = []
    for _ in range(G):
        ids = jnp.asarray(np.asarray(seq)[None])
        logits, _ = jl.forward(params, cfg, jl.embed_tokens(params, ids),
                               causal=True)
        nxt = int(jnp.argmax(logits[0, -1]))
        gen.append(nxt)
        seq.append(nxt)
    np.testing.assert_array_equal(out[0], np.asarray(gen))


def test_ar_eos_padding(tiny):
    """After eos is emitted, remaining positions are eos."""
    cfg, params = tiny
    prompt = np.arange(5, 15)[None]
    prefix = jl.embed_tokens(params, jnp.asarray(prompt))
    # pick eos = the token the model emits first so it stops immediately
    out0 = np.asarray(ar_generate_fused(
        params, cfg, prefix, jax.random.PRNGKey(0), 6, eos_id=-1))
    eos = int(out0[0, 0])
    out = np.asarray(ar_generate_fused(
        params, cfg, prefix, jax.random.PRNGKey(0), 6, eos_id=eos))
    assert (out[0] == eos).all()


def test_ar_temperature_sampling_runs(tiny):
    cfg, params = tiny
    prefix = jl.embed_tokens(params, jnp.asarray(np.arange(5, 15)[None]))
    out = ar_generate_fused(
        params, cfg, prefix, jax.random.PRNGKey(1), 8,
        temperature=1.0, top_k=50, eos_id=-1,
    )
    assert out.shape == (1, 8)
    assert int(out.max()) < cfg.vocab_size


def test_ar_fused_unrolled_params_match():
    """The unrolled (serving) layout's list cache must produce the same
    tokens as the stacked layout through ar_generate_fused."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lavida_mod_tpu.config import tiny_llada_config
    from lavida_mod_tpu.generation.ar_sampler import ar_generate_fused
    from lavida_mod_tpu.models import llada as jl

    cfg = tiny_llada_config().replace(block_type="llama")
    params = jl.init_params(cfg, jax.random.PRNGKey(3))
    prefix = jl.embed_tokens(params, jnp.arange(5, 13)[None])
    a = np.asarray(ar_generate_fused(
        params, cfg, prefix, jax.random.PRNGKey(0), max_new_tokens=12))
    params_u = jl.unstack_blocks(params)
    b = np.asarray(ar_generate_fused(
        params_u, cfg, prefix, jax.random.PRNGKey(0), max_new_tokens=12))
    np.testing.assert_array_equal(a, b)
