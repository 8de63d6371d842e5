"""Probe: clean per-call int4 kernel cost (8 calls/iter on 8 weight copies,
subtract the measured fori_loop floor)."""
import sys; sys.path.insert(0, "/root/repo")
import time, functools, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, K, N = 32, 4096, 12288
K2 = K // 2
NCOPIES = 8


def mk_kernel(block_n, block_k):
    nk = K2 // block_k

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

    def f(x2, packed):
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
    return f


def main():
    rng = np.random.default_rng(0)
    weights = [jnp.asarray(rng.integers(-128, 127, (K2, N), dtype=np.int8))
               for _ in range(NCOPIES)]
    x2 = jnp.asarray(rng.standard_normal((2, T, K2)).astype(np.float32)).astype(jnp.bfloat16)

    # floor
    @jax.jit
    def chain0(x2, n):
        def body(i, carry):
            x2, acc = carry
            y = x2 * jnp.bfloat16(1.0001)
            return y, acc + y[0, 0, :8].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, (x2, jnp.zeros(8, jnp.float32)))[1]
    float(jnp.sum(chain0(x2, 3)))
    t0 = time.perf_counter(); float(jnp.sum(chain0(x2, 100)))
    floor = (time.perf_counter() - t0) / 100
    print(f"loop floor: {floor*1e3:.3f} ms/iter")

    for bn, bk in ((512, 2048), (1024, 512), (1536, 2048), (3072, 2048),
                   (512, 1024), (2048, 1024)):
        try:
            f = mk_kernel(bn, bk)
            @jax.jit
            def chain(x2, n, f=f):
                def body(i, carry):
                    x2, acc = carry
                    s = jnp.zeros(8, jnp.float32)
                    for w in weights:
                        y = f(x2, w)
                        s += y[0, :8].astype(jnp.float32)
                    x2 = x2 + s[0].astype(jnp.bfloat16) * 1e-12
                    return x2, acc + s
                return jax.lax.fori_loop(0, n, body, (x2, jnp.zeros(8, jnp.float32)))[1]
            float(jnp.sum(chain(x2, 2)))
            n = 30
            t0 = time.perf_counter(); float(jnp.sum(chain(x2, n)))
            per_call = ((time.perf_counter() - t0) / n - floor) / NCOPIES
            print(f"bn={bn} bk={bk}: {per_call*1e3:.3f} ms/call  "
                  f"{K2*N/per_call/1e9:.0f} GB/s")
        except Exception as e:
            print(bn, bk, "FAIL:", str(e)[:120])


if __name__ == "__main__":
    main()
