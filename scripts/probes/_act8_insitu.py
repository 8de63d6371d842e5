"""Probe: linear_act_int8 vs weight-only linear at prefill shape, chained."""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from lavida_mod_tpu.ops.quant import linear, linear_act_int8


def main():
    T, K, N = 1056, 4096, 12288
    rng = np.random.default_rng(0)
    p = {"kernel_q": jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8)),
         "scale": jnp.asarray(rng.standard_normal(N).astype(np.float32) * 0.01)}
    xb = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32)).astype(jnp.bfloat16)

    def mk(fn):
        @jax.jit
        def chain(x, n):
            def body(i, carry):
                x, acc = carry
                y = fn(x, p)
                x = x + y[:, :K].astype(jnp.bfloat16) * 1e-9
                return x, acc + y[0, :8].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, (x, jnp.zeros((8,), jnp.float32)))[1]
        return chain

    n = 50
    for name, fn in [("weight-only int8", linear), ("act+weight int8 ", linear_act_int8)]:
        c = mk(fn)
        float(jnp.sum(c(xb, 3)))
        t0 = time.perf_counter(); float(jnp.sum(c(xb, n)))
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt*1e3:.3f} ms/call  {2*T*K*N/dt/1e12:.1f} TFLOPS-equiv")


if __name__ == "__main__":
    main()
