import time, numpy as np, jax, jax.numpy as jnp
from lavida_mod_tpu.ops.pallas_w4 import (
    quantize_w4_grouped, dequant_w4_grouped, w4_matmul_grouped)


def main():
    K, N, T, group = 4096, 12288, 32, 128
    rng = np.random.default_rng(0)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.02
    packed, scales = quantize_w4_grouped(w, group=group)
    x = rng.standard_normal((T, K)).astype(np.float32)
    x2 = jnp.asarray(x).astype(jnp.bfloat16)
    pj, sj = jnp.asarray(packed), jnp.asarray(scales)

    out = w4_matmul_grouped(x2, pj, sj, group=group)
    ref = x @ dequant_w4_grouped(packed, scales, group=group)
    rel = np.abs(np.asarray(out, np.float32) - ref).max() / np.abs(ref).max()
    print("chip grouped-w4 rel err:", rel)
    assert rel < 0.05

    w8 = jnp.asarray(rng.integers(-127, 127, size=(K, N), dtype=np.int8))
    sc8 = jnp.ones((N,), jnp.float32)
    @jax.jit
    def chain_g(x2, p, s, n):
        def body(i, x2):
            y = w4_matmul_grouped(x2, p, s, group=group)
            return x2 + y[:, :x2.shape[1]].astype(jnp.bfloat16) * 1e-9
        return jax.lax.fori_loop(0, n, body, x2).sum()
    @jax.jit
    def chain_8(x, w8, s, n):
        def body(i, x):
            y = (x @ w8.astype(jnp.bfloat16)) * s.astype(jnp.bfloat16)
            return x + y[:, :x.shape[1]] * 1e-9
        return jax.lax.fori_loop(0, n, body, x).sum()
    float(chain_g(x2, pj, sj, 10))
    t0=time.perf_counter(); float(chain_g(x2, pj, sj, 200)); print(f"grouped-w4: {(time.perf_counter()-t0)/200*1e3:.4f} ms/iter")
    xf = jnp.ones((T, K), jnp.bfloat16)
    float(chain_8(xf, w8, sc8, 10))
    t0=time.perf_counter(); float(chain_8(xf, w8, sc8, 200)); print(f"xla int8  : {(time.perf_counter()-t0)/200*1e3:.4f} ms/iter")



if __name__ == "__main__":
    main()
