"""Chip probe: SigLIP tower decomposition (measurement law v3).

The 5-view anyres encode measured 76.6 ms device (_vision_chain.py) vs a
~18 ms bf16 MXU roofline — this probe A/Bs the candidate fixes on the
tower in isolation:

  scan_dense    current model path: lax.scan over stacked layer weights,
                dense XLA attention (f32 [5,16,729,729] score tensors)
  unroll_dense  python-unrolled layers (static weight slices), dense attn
  scan_short    lax.scan + the one-shot Pallas kernel (hd=72 full-size)
  unroll_short  both

Usage: python _vision_decomp.py {scan_dense|unroll_dense|scan_short|unroll_short}
n-delta protocol: inner fori_loop with traced bound; marginal device time
per tower call = (t(hi)-t(lo))/(hi-lo).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

variant = sys.argv[1] if len(sys.argv) > 1 else "scan_dense"
assert jax.default_backend() != "cpu", jax.default_backend()
print("backend:", jax.default_backend(), "variant:", variant, flush=True)

from lavida_mod_tpu.config import SigLIPConfig
from lavida_mod_tpu.models import siglip
from lavida_mod_tpu.ops.attention import dense_attention, flash_attention
from lavida_mod_tpu.ops.norms import layer_norm

cfg = SigLIPConfig()
shapes = jax.eval_shape(
    lambda k: siglip.init_params(cfg, k, jnp.bfloat16), jax.random.PRNGKey(0))
params = jax.jit(
    lambda: jax.tree.map(lambda sh: jnp.zeros(sh.shape, sh.dtype), shapes)
)()

N, T, D = 5, 729, cfg.hidden_size
nh, hd = cfg.num_attention_heads, cfg.head_dim
eps = cfg.layer_norm_eps
L = cfg.n_layers_used
print(f"L={L} N={N} T={T} D={D} nh={nh} hd={hd}", flush=True)

attn = dense_attention if variant.endswith("dense") else \
    (lambda q, k, v: flash_attention(q, k, v, None, None))


def layer_fn(h, p_l):
    r = h
    z = layer_norm(h, p_l["ln1"]["weight"], p_l["ln1"]["bias"], eps)
    q = z @ p_l["q_proj"]["kernel"] + p_l["q_proj"]["bias"]
    k = z @ p_l["k_proj"]["kernel"] + p_l["k_proj"]["bias"]
    v = z @ p_l["v_proj"]["kernel"] + p_l["v_proj"]["bias"]
    att = attn(q.reshape(N, T, nh, hd), k.reshape(N, T, nh, hd),
               v.reshape(N, T, nh, hd)).reshape(N, T, -1)
    h = r + att @ p_l["out_proj"]["kernel"] + p_l["out_proj"]["bias"]
    r = h
    z = layer_norm(h, p_l["ln2"]["weight"], p_l["ln2"]["bias"], eps)
    z = jax.nn.gelu(z @ p_l["fc1"]["kernel"] + p_l["fc1"]["bias"],
                    approximate=True)
    h = r + z @ p_l["fc2"]["kernel"] + p_l["fc2"]["bias"]
    return h, None


@jax.jit
def tower(x, layers, n):
    def body(_, x):
        if variant.startswith("scan"):
            y, _ = jax.lax.scan(layer_fn, x, layers)
        else:
            y = x
            for li in range(L):
                y, _ = layer_fn(y, jax.tree.map(lambda a: a[li], layers))
        return y * (1.0 / (1.0 + jnp.float32(1e-6))).astype(x.dtype)

    return jax.lax.fori_loop(0, n, body, x)


layers = jax.tree.map(lambda a: a[:L], params["layers"])
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((N, T, D)), jnp.bfloat16)

t0 = time.perf_counter()
float(jnp.sum(tower(x, layers, 2)))
print("compile+first:", round(time.perf_counter() - t0, 1), flush=True)
float(jnp.sum(tower(x, layers, 2)))

times = {}
for n in (4, 12):
    t0 = time.perf_counter()
    float(jnp.sum(tower(x, layers, n)))
    times[n] = time.perf_counter() - t0
    print(f"n={n}: total {times[n]*1e3:.1f} ms", flush=True)
marg = (times[12] - times[4]) / 8
print(f"{variant} {L}-layer tower device time: {marg*1e3:.2f} ms",
      flush=True)
