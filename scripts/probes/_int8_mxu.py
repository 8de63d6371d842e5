"""Probe: does s8xs8 dot_general hit the v5e int8 MXU (2x bf16 rate)?"""
import time, numpy as np, jax, jax.numpy as jnp


def main():
    T, K, N = 1056, 4096, 12288
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 127, (T, K), dtype=np.int8))
    w8 = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))
    xb = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def chain_s8(x, w, n):
        def body(i, acc):
            y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return acc + y[0, :8].astype(jnp.int32)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((8,), jnp.int32))

    @jax.jit
    def chain_bf(x, w, n):
        def body(i, acc):
            y = jnp.matmul(x, w.astype(jnp.bfloat16))
            return acc + y[0, :8].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((8,), jnp.float32))

    # NOTE: fori_loop body is loop-invariant -> XLA may hoist the matmul!
    # guard: make x depend on acc
    @jax.jit
    def chain_s8_dep(x, w, n):
        def body(i, carry):
            x, acc = carry
            y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            x = (x ^ y[:1, :K].astype(jnp.int8))
            return x, acc + y[0, :8]
        return jax.lax.fori_loop(0, n, body, (x, jnp.zeros((8,), jnp.int32)))[1]

    @jax.jit
    def chain_bf_dep(x, w, n):
        wb = w.astype(jnp.bfloat16)
        def body(i, carry):
            x, acc = carry
            y = jnp.matmul(x, wb, preferred_element_type=jnp.float32)
            x = x + y[:1, :K].astype(jnp.bfloat16) * 1e-9
            return x, acc + y[0, :8]
        return jax.lax.fori_loop(0, n, body, (x, jnp.zeros((8,), jnp.float32)))[1]

    n = 50
    for name, fn, args in [
        ("s8xs8->s32", chain_s8_dep, (x8, w8)),
        ("bf16xbf16 ", chain_bf_dep, (xb, w8)),
    ]:
        float(jnp.sum(fn(*args, 3)))  # warm
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args, n)))
        dt = (time.perf_counter() - t0) / n
        tflops = 2 * T * K * N / dt / 1e12
        print(f"{name}: {dt*1e3:.3f} ms/matmul  {tflops:.1f} T(FL)OPS")


if __name__ == "__main__":
    main()
