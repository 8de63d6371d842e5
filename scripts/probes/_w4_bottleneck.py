"""Probe: isolate the int4 kernel bottleneck (DMA vs VPU vs MXU vs grid)."""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, K, N = 32, 4096, 12288
K2 = K // 2


def bench(name, fn, *args, bytes_read):
    @jax.jit
    def chain(x, n):
        def body(i, carry):
            x, acc = carry
            y = fn(x, *args)
            x = x + y[:x.shape[0] if x.ndim==2 else 2, ...].astype(x.dtype).reshape(x.shape) * 0 + x*0 + x  # keep x
            return x, acc + y.reshape(-1)[:8].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, (x, jnp.zeros(8, jnp.float32)))[1]
    return chain


def main():
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.integers(-128, 127, (K2, N), dtype=np.int8))
    x2 = jnp.asarray(rng.standard_normal((2, T, K2)).astype(np.float32)).astype(jnp.bfloat16)

    def mk(kind, block_n=512, block_k=2048):
        nk = K2 // block_k
        def kernel(x_ref, p_ref, o_ref, acc_ref):
            ki = pl.program_id(1)
            @pl.when(ki == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)
            if kind == "dma_only":
                # touch one row so the load isn't dead
                acc_ref[0, :] += p_ref[0, :].astype(jnp.float32)
            elif kind == "dot_raw":
                w = p_ref[...].astype(jnp.bfloat16)
                acc_ref[...] += jnp.dot(x_ref[0], w[:, :],
                                        preferred_element_type=jnp.float32)
            elif kind == "dot_s8":
                # s8 x s8 dot straight on packed bytes (x int8 fake)
                acc_ref[...] += jax.lax.dot_general(
                    x_ref[0].astype(jnp.bfloat16), p_ref[...].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif kind == "unpack_only":
                p32 = p_ref[...].astype(jnp.int32)
                lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p32, 28), 28).astype(jnp.bfloat16)
                hi = jax.lax.shift_right_arithmetic(p32, 4).astype(jnp.bfloat16)
                acc_ref[0, :] += (lo[0, :] + hi[0, :]).astype(jnp.float32)
            elif kind == "full":
                p32 = p_ref[...].astype(jnp.int32)
                lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p32, 28), 28).astype(jnp.bfloat16)
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
        return jax.jit(f)

    for kind in ("dma_only", "unpack_only", "dot_raw", "full"):
        for bn, bk in ((512, 2048), (1024, 2048), (2048, 2048)):
            try:
                fn = mk(kind, bn, bk)
                @jax.jit
                def chain(x2, n, fn=fn):
                    def body(i, carry):
                        x2, acc = carry
                        y = fn(x2)
                        x2 = x2 + y[None, :, :K2].astype(jnp.bfloat16) * 1e-9
                        return x2, acc + y[0, :8].astype(jnp.float32)
                    return jax.lax.fori_loop(0, n, body, (x2, jnp.zeros(8, jnp.float32)))[1]
                float(jnp.sum(chain(x2, 3)))
                n = 100
                t0 = time.perf_counter(); float(jnp.sum(chain(x2, n)))
                dt = (time.perf_counter() - t0) / n
                print(f"{kind} bn={bn} bk={bk}: {dt*1e3:.3f} ms  {K2*N/dt/1e9:.0f} GB/s")
            except Exception as e:
                print(kind, bn, bk, "FAIL:", str(e)[:120])


if __name__ == "__main__":
    main()
