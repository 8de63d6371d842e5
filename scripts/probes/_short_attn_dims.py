"""Chip sanity: short_attention vs dense at the other towers' geometries.

CLIP-L 577x64, open_clip ViT-H 257x80, MLCD 1025x72 — validates the
one-shot kernel's non-128 head dims and CLS-token lengths on hardware
before vision_attention routes those towers through it.
"""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
assert jax.default_backend() != "cpu"

from lavida_mod_tpu.ops.attention import dense_attention, flash_attention

for (T, hd, H) in [(577, 64, 16), (257, 80, 16), (1025, 72, 16)]:
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, T, H, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, T, H, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, T, H, hd)), jnp.bfloat16)
    a = np.asarray(flash_attention(q, k, v, None, None), np.float32)
    b = np.asarray(dense_attention(q, k, v), np.float32)
    err = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
    print(f"T={T} hd={hd}: rel_err={err:.5f}", flush=True)
    assert err < 0.02, (T, hd, err)
print("OK", flush=True)
