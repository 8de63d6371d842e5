"""Probe: Pallas W8A8 matmul at prefill shape vs XLA s8/bf16.

Sweep block sizes; report TOPS-equiv. Timing protocol: chained fori_loop
with data dependence (tunnel is async; amortize over n calls).
"""
import sys; sys.path.insert(0, "/root/repo")
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, K, N = 1152, 4096, 12288


def mk_w8a8(block_t, block_n, block_k, dimorder="tnk"):
    nk = K // block_k

    def kernel(x_ref, p_ref, o_ref, acc_ref):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jax.lax.dot_general(
            x_ref[...], p_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when(ki == nk - 1)
        def _():
            o_ref[...] = acc_ref[...]

    @jax.jit
    def f(x8, w8):
        return pl.pallas_call(
            kernel,
            grid=(T // block_t, N // block_n, nk),
            in_specs=[
                pl.BlockSpec((block_t, block_k), lambda t, i, k: (t, k)),
                pl.BlockSpec((block_k, block_n), lambda t, i, k: (k, i)),
            ],
            out_specs=pl.BlockSpec((block_t, block_n),
                                   lambda t, i, k: (t, i)),
            out_shape=jax.ShapeDtypeStruct((T, N), jnp.int32),
            scratch_shapes=[pltpu.VMEM((block_t, block_n), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(x8, w8)
    return f


def bench(fn, x, w, n=30):
    @jax.jit
    def chain(x, w, n):
        def body(i, carry):
            x, acc = carry
            y = fn(x, w)
            x = x ^ y[:T, :K].astype(jnp.int8)
            return x, acc + y[0, :8].astype(jnp.int32)
        return jax.lax.fori_loop(
            0, n, body, (x, jnp.zeros((8,), jnp.int32)))[1]
    float(jnp.sum(chain(x, w, 2)))
    t0 = time.perf_counter()
    float(jnp.sum(chain(x, w, n)))
    dt = (time.perf_counter() - t0) / n
    return dt


def main():
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 127, (T, K), dtype=np.int8))
    w8 = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))

    flops = 2 * T * K * N
    # XLA baselines
    xla = lambda x, w: jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    dt = bench(xla, x8, w8)
    print(f"XLA s8xs8       : {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TOPS")

    for bt in (256, 384, 576):
        for bn in (512, 768, 1024):
            for bk in (512, 1024, 2048):
                if T % bt or N % bn or K % bk:
                    continue
                # VMEM estimate: x + w + out + acc
                vmem = bt * bk + bk * bn + 2 * 4 * bt * bn
                if vmem > 12 * 2**20:
                    continue
                try:
                    f = mk_w8a8(bt, bn, bk)
                    dt = bench(f, x8, w8)
                    print(f"pallas t{bt} n{bn} k{bk}: {dt*1e3:7.3f} ms  "
                          f"{flops/dt/1e12:6.1f} TOPS", flush=True)
                except Exception as e:
                    print(f"pallas t{bt} n{bn} k{bk}: FAIL "
                          f"{str(e).splitlines()[0][:80]}", flush=True)


if __name__ == "__main__":
    main()
