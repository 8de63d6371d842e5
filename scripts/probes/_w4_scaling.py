"""Probe: does int4 kernel time scale with data size or is it per-call?"""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 32


def run(K, N, block_n=512, block_k=2048, n=100):
    K2 = K // 2
    block_k = min(block_k, K2)
    nk = K2 // block_k
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.integers(-128, 127, (K2, N), dtype=np.int8))
    x2 = jnp.asarray(rng.standard_normal((2, T, K2)).astype(np.float32)).astype(jnp.bfloat16)

    def kernel(x_ref, p_ref, o_ref, acc_ref):
        ki = pl.program_id(1)
        @pl.when(ki == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
        p32 = p_ref[...].astype(jnp.int32)
        lo = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(p32, 28), 28).astype(jnp.bfloat16)
        hi = jax.lax.shift_right_arithmetic(p32, 4).astype(jnp.bfloat16)
        acc_ref[...] += jnp.dot(x_ref[0], lo, preferred_element_type=jnp.float32)
        acc_ref[...] += jnp.dot(x_ref[1], hi, preferred_element_type=jnp.float32)
        @pl.when(ki == nk - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

    def f(x2):
        return pl.pallas_call(
            kernel,
            grid=(N // block_n, nk),
            in_specs=[
                pl.BlockSpec((2, T, block_k), lambda i, k: (0, 0, k)),
                pl.BlockSpec((block_k, block_n), lambda i, k: (k, i)),
            ],
            out_specs=pl.BlockSpec((T, block_n), lambda i, k: (0, i)),
            out_shape=jax.ShapeDtypeStruct((T, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((T, block_n), jnp.float32)],
        )(x2, packed)
    fj = jax.jit(f)

    @jax.jit
    def chain(x2, n):
        def body(i, carry):
            x2, acc = carry
            y = fj(x2)
            x2 = x2 + y[None, :1, :1].astype(jnp.bfloat16) * 1e-9
            return x2, acc + y[0, :8].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, (x2, jnp.zeros(8, jnp.float32)))[1]
    float(jnp.sum(chain(x2, 3)))
    t0 = time.perf_counter(); float(jnp.sum(chain(x2, n)))
    dt = (time.perf_counter() - t0) / n
    print(f"K={K} N={N}: {dt*1e3:.3f} ms  {K2*N/dt/1e9:.0f} GB/s  ({K2*N/1e6:.1f} MB)")


def main():
    run(4096, 1536)
    run(4096, 6144)
    run(4096, 12288)
    run(4096, 24576)
    run(8192, 12288)


if __name__ == "__main__":
    main()
