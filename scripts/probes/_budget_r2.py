"""Step-count-delta budget of the W4A8 headline path (trustworthy on the
async tunnel: subtract runs differing only in step count)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np

from lavida_mod_tpu.config import GenerationConfig, LaViDaConfig
from lavida_mod_tpu.generation import diffusion
from lavida_mod_tpu.models import multimodal
from lavida_mod_tpu.models import llada as L

def build_int4(cfg):
    import jax as j
    def build(k):
        p = multimodal.init_params(cfg, k, jnp.bfloat16)
        p["llada"] = L.unstack_blocks(p["llada"])
        return p
    shapes = j.eval_shape(build, j.random.PRNGKey(0))
    def q4(d):
        if isinstance(d, list): return [q4(x) for x in d]
        if isinstance(d, dict):
            if "kernel" in d and len(d["kernel"].shape) == 2:
                K, N = d["kernel"].shape
                o = {"kernel_p4": jnp.zeros((K//2, N), jnp.int8),
                     "scales4": jnp.zeros((K//128, N), jnp.float32)}
                if "bias" in d: o["bias"] = jnp.zeros(d["bias"].shape, d["bias"].dtype)
                return o
            return {k: q4(v) for k, v in d.items()}
        return jnp.zeros(d.shape, d.dtype)
    return {k: (q4(v) if k == "llada" else jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), v)) for k, v in shapes.items()}

def main():
    cfg = LaViDaConfig()
    params = build_int4(cfg)
    rng = np.random.default_rng(0)
    ids = np.concatenate([rng.integers(3, 30000, size=8), [-200],
                          rng.integers(3, 30000, size=40)])

    def run(steps, gen_len=32, n=6):
        gen = GenerationConfig(max_new_tokens=gen_len, block_length=gen_len,
                               steps=None, step_per_block=steps,
                               prefix_lm=True, remasking="low_confidence")
        def one(i):
            views = jnp.full((5, 3, 384, 384), 0.001*i, jnp.bfloat16)
            feats = multimodal._encode_views_jit(params, cfg, views, False, True)
            block = multimodal.merge_anyres(feats, (640, 640), cfg.vision,
                                            params["image_newline"])
            prefix, _ = multimodal.splice_embeddings(params, cfg, ids, [block])
            out = diffusion.generate(params["llada"], cfg.llada, prefix[None],
                                     gen, use_flash_prefill=True)
            jax.block_until_ready(out)
            return out
        one(0)
        ts = []
        for i in range(1, n):
            t0 = time.perf_counter(); one(i); ts.append(time.perf_counter()-t0)
        return float(np.median(ts))

    t16 = run(16); t32 = run(32); t2 = run(2)
    step = (t32 - t16) / 16
    print(f"steps16 {t16*1e3:.1f} ms  steps32 {t32*1e3:.1f}  steps2 {t2*1e3:.1f}")
    print(f"per-step {step*1e3:.2f} ms -> 16 steps {16*step*1e3:.1f} ms")
    print(f"prefill+vision+fixed = steps2 - 2*step = {(t2-2*step)*1e3:.1f} ms")

if __name__ == "__main__":
    main()
