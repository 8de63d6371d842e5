"""Probe: clean component breakdown of the bitcast int4 kernel."""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, K, N = 32, 4096, 12288
K2 = K // 2
NCOPIES = 8


def mk(kind, block_n=512, block_k=1024):
    nk = K2 // block_k

    def kernel(x_ref, p_ref, o_ref, acc_ref):
        ki = pl.program_id(1)
        @pl.when(ki == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
        if kind == "dma":
            acc_ref[0, :] += p_ref[0, :block_n].astype(jnp.float32)
        elif kind == "bitcast_sum":
            w = pltpu.bitcast(p_ref[...], jnp.int4).astype(jnp.bfloat16)
            acc_ref[0, :] += w[0, :].astype(jnp.float32)
        elif kind == "bitcast_dot":
            w = pltpu.bitcast(p_ref[...], jnp.int4).astype(jnp.bfloat16)
            acc_ref[...] += jnp.dot(x_ref[...], w,
                                    preferred_element_type=jnp.float32)
        elif kind == "bitcast_dot8":
            w = pltpu.bitcast(p_ref[...], jnp.int4).astype(jnp.int8)
            acc_ref[...] += jax.lax.dot_general(
                x_ref[...].astype(jnp.int8), w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        @pl.when(ki == nk - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

    def f(x, packed):
        return pl.pallas_call(
            kernel,
            grid=(N // block_n, nk),
            in_specs=[
                pl.BlockSpec((T, 2 * block_k), lambda i, k: (0, k)),
                pl.BlockSpec((block_k, block_n), lambda i, k: (k, i)),
            ],
            out_specs=pl.BlockSpec((T, block_n), lambda i, k: (0, i)),
            out_shape=jax.ShapeDtypeStruct((T, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((T, block_n), jnp.float32)],
        )(x, packed)
    return f


def main():
    rng = np.random.default_rng(0)
    weights = [jnp.asarray(rng.integers(-128, 127, (K2, N), dtype=np.int8))
               for _ in range(NCOPIES)]
    x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def chain0(x, n):
        def body(i, carry):
            x, acc = carry
            y = x * jnp.bfloat16(1.0001)
            return y, acc + y[0, :8].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, (x, jnp.zeros(8, jnp.float32)))[1]
    float(jnp.sum(chain0(x, 3)))
    t0 = time.perf_counter(); float(jnp.sum(chain0(x, 100)))
    floor = (time.perf_counter() - t0) / 100
    print(f"floor {floor*1e3:.3f} ms")

    for kind in ("dma", "bitcast_sum", "bitcast_dot", "bitcast_dot8"):
        for bn, bk in ((512, 1024),):
            try:
                f = mk(kind, bn, bk)
                @jax.jit
                def chain(x, n, f=f):
                    def body(i, carry):
                        x, acc = carry
                        s = jnp.zeros(8, jnp.float32)
                        for p in weights:
                            y = f(x, p)
                            s += y[0, :8].astype(jnp.float32)
                        x = x + s[0].astype(jnp.bfloat16) * 1e-12
                        return x, acc + s
                    return jax.lax.fori_loop(0, n, body, (x, jnp.zeros(8, jnp.float32)))[1]
                float(jnp.sum(chain(x, 2)))
                n = 30
                t0 = time.perf_counter(); float(jnp.sum(chain(x, n)))
                per_call = ((time.perf_counter() - t0) / n - floor) / NCOPIES
                print(f"{kind} bn={bn} bk={bk}: {per_call*1e3:.3f} ms "
                      f"{K2*N/per_call/1e9:.0f} GB/s")
            except Exception as e:
                print(kind, bn, bk, "FAIL:", str(e)[:100])


if __name__ == "__main__":
    main()
