"""Probe: int4 kernel unpack variants at decode shape [32,4096]x[4096,12288]."""
import sys; sys.path.insert(0, "/root/repo")
import time, functools, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def variant_b(x2, packed, scales, group=128, block_n=512, block_t=32):
    """block_k = one group; lo via AND (+rank-1 correction); scale on acc."""
    _, T, K2 = x2.shape
    N = packed.shape[1]
    g2 = group // 2
    nk = K2 // g2

    def kernel(x_ref, p_ref, s_ref, o_ref, acc_ref):
        ki = pl.program_id(2)
        @pl.when(ki == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
        p32 = p_ref[...].astype(jnp.int32)
        lo_u = jnp.bitwise_and(p32, 15).astype(jnp.bfloat16)
        hi = jax.lax.shift_right_arithmetic(p32, 4).astype(jnp.bfloat16)
        d0 = jnp.dot(x_ref[0], lo_u, preferred_element_type=jnp.float32)
        d1 = jnp.dot(x_ref[1], hi, preferred_element_type=jnp.float32)
        corr = jnp.sum(x_ref[0].astype(jnp.float32), axis=1)[:, None] * 8.0
        acc_ref[...] += (d0 - corr + d1) * s_ref[...]
        @pl.when(ki == nk - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid=(T // block_t, N // block_n, nk),
        in_specs=[
            pl.BlockSpec((2, block_t, g2), lambda t, i, k: (0, t, k)),
            pl.BlockSpec((g2, block_n), lambda t, i, k: (k, i)),
            pl.BlockSpec((1, block_n), lambda t, i, k: (k, i)),
        ],
        out_specs=pl.BlockSpec((block_t, block_n), lambda t, i, k: (t, i)),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((block_t, block_n), jnp.float32)],
    )(x2, packed, scales)


def variant_c(x2, packed, scales, group=128, block_n=512, block_t=32,
              block_k=1024):
    """big k-block; AND/shr unpack; bf16 scale fold on weights."""
    _, T, K2 = x2.shape
    N = packed.shape[1]
    g2 = group // 2
    nk = K2 // block_k
    gb = block_k // g2

    def kernel(x_ref, p_ref, s_ref, o_ref, acc_ref):
        ki = pl.program_id(2)
        @pl.when(ki == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
        p32 = p_ref[...].astype(jnp.int32)
        lo_u = jnp.bitwise_and(p32, 15).astype(jnp.bfloat16)
        hi = jax.lax.shift_right_arithmetic(p32, 4).astype(jnp.bfloat16)
        s_rows = jnp.repeat(s_ref[...], g2, axis=0).astype(jnp.bfloat16)
        lo_u = lo_u * s_rows
        hi = hi * s_rows
        d0 = jnp.dot(x_ref[0], lo_u, preferred_element_type=jnp.float32)
        d1 = jnp.dot(x_ref[1], hi, preferred_element_type=jnp.float32)
        # -8 offset correction for lo: -8 * sum_g(x_even_g * s_g) per n...
        # with scale folded on weights, the correction needs per-group sums:
        xs = jnp.sum(
            x_ref[0].astype(jnp.float32).reshape(block_t, gb, g2), axis=2
        )  # [bt, gb]
        corr = jnp.dot(xs.astype(jnp.bfloat16),
                       (s_ref[...] * 8.0).astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        acc_ref[...] += d0 + d1 - corr
        @pl.when(ki == nk - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid=(T // block_t, N // block_n, nk),
        in_specs=[
            pl.BlockSpec((2, block_t, block_k), lambda t, i, k: (0, t, k)),
            pl.BlockSpec((block_k, block_n), lambda t, i, k: (k, i)),
            pl.BlockSpec((gb, block_n), lambda t, i, k: (k, i)),
        ],
        out_specs=pl.BlockSpec((block_t, block_n), lambda t, i, k: (t, i)),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((block_t, block_n), jnp.float32)],
    )(x2, packed, scales)


def main():
    from lavida_mod_tpu.ops.pallas_w4 import (
        quantize_w4_grouped, dequant_w4_grouped, w4_matmul_grouped,
        split_even_odd)
    T, K, N, group = 32, 4096, 12288, 128
    rng = np.random.default_rng(0)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.02
    packed_np, scales_np = quantize_w4_grouped(w, group=group)
    packed, scales = jnp.asarray(packed_np), jnp.asarray(scales_np)
    x = rng.standard_normal((T, K)).astype(np.float32)
    x2 = split_even_odd(jnp.asarray(x).astype(jnp.bfloat16))
    ref = np.asarray(x) @ dequant_w4_grouped(packed_np, scales_np, group)

    fns = {
        "current": functools.partial(w4_matmul_grouped, group=group),
        "B(and+acc-scale)": jax.jit(variant_b),
        "C(and+bf16-scale)": jax.jit(variant_c),
    }
    for name, fn in fns.items():
        try:
            out = np.asarray(fn(x2, packed, scales), np.float32)
            rel = np.abs(out - ref).max() / np.abs(ref).max()
            @jax.jit
            def chain(x2, n, fn=fn):
                def body(i, carry):
                    x2, acc = carry
                    y = fn(x2, packed, scales)
                    x2 = x2 + y[None, :, :x2.shape[2]].astype(jnp.bfloat16) * 1e-9
                    return x2, acc + y[0, :8].astype(jnp.float32)
                return jax.lax.fori_loop(0, n, body, (x2, jnp.zeros(8, jnp.float32)))[1]
            float(jnp.sum(chain(x2, 3)))
            n = 100
            t0 = time.perf_counter(); float(jnp.sum(chain(x2, n)))
            dt = (time.perf_counter() - t0) / n
            gbps = K / 2 * N / dt / 1e9
            print(f"{name}: rel={rel:.4f}  {dt*1e3:.3f} ms  {gbps:.0f} GB/s packed-read")
        except Exception as e:
            print(name, "FAIL:", str(e)[:200])


if __name__ == "__main__":
    main()
