"""Probe: block-contiguous (swizzled) weight layout for the int4 kernel DMA."""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, K, N = 32, 4096, 12288
K2 = K // 2


def main():
    rng = np.random.default_rng(0)
    packed = rng.integers(-128, 127, (K2, N), dtype=np.int8)
    x2 = jnp.asarray(rng.standard_normal((2, T, K2)).astype(np.float32)).astype(jnp.bfloat16)

    for block_n in (512, 1024):
        for block_k in (1024, 2048):
            nN, nk = N // block_n, K2 // block_k
            # swizzle: [K2, N] -> [nN*nk, block_k, block_n] block-major
            sw = packed.reshape(nk, block_k, nN, block_n).transpose(2, 0, 1, 3) \
                       .reshape(nN * nk, block_k, block_n)
            swj = jnp.asarray(sw)

            def kernel(x_ref, p_ref, o_ref, acc_ref):
                ki = pl.program_id(1)
                @pl.when(ki == 0)
                def _():
                    acc_ref[...] = jnp.zeros_like(acc_ref)
                p32 = p_ref[0].astype(jnp.int32)
                lo = jax.lax.shift_right_arithmetic(
                    jax.lax.shift_left(p32, 28), 28).astype(jnp.bfloat16)
                hi = jax.lax.shift_right_arithmetic(p32, 4).astype(jnp.bfloat16)
                acc_ref[...] += jnp.dot(x_ref[0], lo, preferred_element_type=jnp.float32)
                acc_ref[...] += jnp.dot(x_ref[1], hi, preferred_element_type=jnp.float32)
                @pl.when(ki == nk - 1)
                def _():
                    o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

            def f(x2, swj=swj, block_n=block_n, block_k=block_k, nk=nk):
                return pl.pallas_call(
                    kernel,
                    grid=(N // block_n, nk),
                    in_specs=[
                        pl.BlockSpec((2, T, block_k), lambda i, k: (0, 0, k)),
                        pl.BlockSpec((1, block_k, block_n),
                                     lambda i, k, nk=nk: (i * nk + k, 0, 0)),
                    ],
                    out_specs=pl.BlockSpec((T, block_n), lambda i, k: (0, i)),
                    out_shape=jax.ShapeDtypeStruct((T, N), jnp.bfloat16),
                    scratch_shapes=[pltpu.VMEM((T, block_n), jnp.float32)],
                )(x2, swj)
            fj = jax.jit(f)
            try:
                @jax.jit
                def chain(x2, n, fj=fj):
                    def body(i, carry):
                        x2, acc = carry
                        y = fj(x2)
                        x2 = x2 + y[None, :, :K2].astype(jnp.bfloat16) * 1e-9
                        return x2, acc + y[0, :8].astype(jnp.float32)
                    return jax.lax.fori_loop(0, n, body, (x2, jnp.zeros(8, jnp.float32)))[1]
                float(jnp.sum(chain(x2, 3)))
                n = 100
                t0 = time.perf_counter(); float(jnp.sum(chain(x2, n)))
                dt = (time.perf_counter() - t0) / n
                print(f"swizzled bn={block_n} bk={block_k}: {dt*1e3:.3f} ms  {K2*N/dt/1e9:.0f} GB/s")
            except Exception as e:
                print(block_n, block_k, "FAIL:", str(e)[:120])


if __name__ == "__main__":
    main()
