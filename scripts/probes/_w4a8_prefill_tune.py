"""Probe: tune w4_matmul_grouped block sizes at PREFILL shape.

Current heuristic block_t=min(T,256) makes 5 t-blocks at T=1152 -> weight
bitcast+convert runs 5x. Sweep block_t/block_k/block_n; compare vs XLA
bf16 (the int8-weight dequant matmul the prefill otherwise uses).
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, K, N, group = 1152, 4096, 12288, 128
K2 = K // 2


def mk(block_t, block_n, block_k):
    """W4A8 grouped kernel parameterized; x pre-quantized outside."""
    nk = K2 // block_k
    g2 = group // 2
    gb = block_k // g2

    def kernel(x_ref, sx_ref, p_ref, s_ref, o_ref, acc_ref):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        w8 = pltpu.bitcast(p_ref[...], jnp.int4).astype(jnp.int8)
        xb = x_ref[...]
        acc = jnp.zeros_like(acc_ref)
        for g in range(gb):
            d = jax.lax.dot_general(
                xb[:, g * group:(g + 1) * group],
                w8[g * group:(g + 1) * group],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc += d.astype(jnp.float32) * s_ref[g][None, :]
        acc_ref[...] += acc

        @pl.when(ki == nk - 1)
        def _():
            o_ref[...] = (acc_ref[...] * sx_ref[...].astype(jnp.float32)
                          ).astype(jnp.bfloat16)

    @jax.jit
    def f(x8, sx, packed, scales):
        return pl.pallas_call(
            kernel,
            grid=(T // block_t, N // block_n, nk),
            in_specs=[
                pl.BlockSpec((block_t, 2 * block_k), lambda t, i, k: (t, k)),
                pl.BlockSpec((block_t, 1), lambda t, i, k: (t, 0)),
                pl.BlockSpec((block_k, block_n), lambda t, i, k: (k, i)),
                pl.BlockSpec((gb, block_n), lambda t, i, k: (k, i)),
            ],
            out_specs=pl.BlockSpec((block_t, block_n),
                                   lambda t, i, k: (t, i)),
            out_shape=jax.ShapeDtypeStruct((T, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((block_t, block_n), jnp.float32)],
        )(x8, sx, packed, scales)
    return f


def bench(fn, args, n=30):
    @jax.jit
    def chain(a0, rest, n):
        def body(i, carry):
            a0, acc = carry
            y = fn(a0, *rest)
            a0 = a0 ^ y[:T, :K].astype(jnp.int8)
            return a0, acc + y[0, :8].astype(jnp.float32)
        return jax.lax.fori_loop(
            0, n, body, (a0, jnp.zeros((8,), jnp.float32)))[1]
    float(jnp.sum(chain(args[0], args[1:], 2)))
    t0 = time.perf_counter()
    float(jnp.sum(chain(args[0], args[1:], n)))
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 127, (T, K), dtype=np.int8))
    sx = jnp.asarray(rng.random((T, 1), np.float32) * 0.01)
    packed = jnp.asarray(rng.integers(-128, 128, (K2, N)).astype(np.int8))
    scales = jnp.asarray(rng.random((K // group, N), np.float32) * 0.01)
    wb = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    flops = 2 * T * K * N

    xla_bf = lambda x, w: jnp.matmul(
        x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    dt = bench(
        lambda x, *r: (xla_bf(x.astype(jnp.bfloat16), r[0])
                       .astype(jnp.float32)).astype(jnp.bfloat16),
        (x8, wb))
    print(f"XLA bf16          : {dt*1e3:7.3f} ms {flops/dt/1e12:6.1f} TF")

    for bt in (128, 192, 288, 384, 576, 1152):
        for bn in (256, 512, 1024):
            for bk in (512, 1024, 2048):
                if T % bt or N % bn or K2 % bk:
                    continue
                vmem = (bt * 2 * bk + bk * bn + 4 * bt * bn * 2
                        + 2 * bt * bn)
                if vmem > 14 * 2**20:
                    continue
                try:
                    dt = bench(mk(bt, bn, bk), (x8, sx, packed, scales))
                    print(f"w4a8 t{bt:4d} n{bn:4d} k{bk:4d}: {dt*1e3:7.3f} ms "
                          f"{flops/dt/1e12:6.1f} TF", flush=True)
                except Exception as e:
                    print(f"w4a8 t{bt:4d} n{bn:4d} k{bk:4d}: FAIL "
                          f"{str(e).splitlines()[0][:70]}", flush=True)


if __name__ == "__main__":
    main()
