"""Probe: W4A8 kernel (s8 dot) vs V1 (bf16 dot) — same-run comparison."""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, K, N, group = 32, 4096, 12288, 128
K2 = K // 2
NCOPIES = 8


def mk_v1(block_n=512, block_k=1024):
    nk = K2 // block_k
    gb = block_k // (group // 2)

    def kernel(x_ref, p_ref, s_ref, o_ref, acc_ref):
        ki = pl.program_id(1)
        @pl.when(ki == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
        w = pltpu.bitcast(p_ref[...], jnp.int4).astype(jnp.bfloat16)
        s_rows = jnp.repeat(s_ref[...].astype(jnp.bfloat16), group, axis=0)
        acc_ref[...] += jnp.dot(x_ref[...], w * s_rows,
                                preferred_element_type=jnp.float32)
        @pl.when(ki == nk - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

    def f(x, packed, scales):
        return pl.pallas_call(
            kernel,
            grid=(N // block_n, nk),
            in_specs=[
                pl.BlockSpec((T, 2 * block_k), lambda i, k: (0, k)),
                pl.BlockSpec((block_k, block_n), lambda i, k: (k, i)),
                pl.BlockSpec((gb, block_n), lambda i, k: (k, i)),
            ],
            out_specs=pl.BlockSpec((T, block_n), lambda i, k: (0, i)),
            out_shape=jax.ShapeDtypeStruct((T, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((T, block_n), jnp.float32)],
        )(x, packed, scales)
    return f


def mk_w4a8(block_n=512, block_k=1024):
    """x pre-quantized int8 [T, K] with per-token scale sx [T,1] f32.
    In-kernel: int4->int8 convert, per-group s8 dots, f32 acc scale."""
    nk = K2 // block_k
    g2 = group // 2
    gb = block_k // g2

    def kernel(x_ref, sx_ref, p_ref, s_ref, o_ref, acc_ref):
        ki = pl.program_id(1)
        @pl.when(ki == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
        w8 = pltpu.bitcast(p_ref[...], jnp.int4).astype(jnp.int8)
        x = x_ref[...]
        acc = jnp.zeros_like(acc_ref)
        for g in range(gb):
            d = jax.lax.dot_general(
                x[:, g * group:(g + 1) * group],
                w8[g * group:(g + 1) * group],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc += d.astype(jnp.float32) * s_ref[g][None, :]
        acc_ref[...] += acc
        @pl.when(ki == nk - 1)
        def _():
            o_ref[...] = (acc_ref[...] * sx_ref[...]).astype(jnp.bfloat16)

    def f(x8, sx, packed, scales):
        return pl.pallas_call(
            kernel,
            grid=(N // block_n, nk),
            in_specs=[
                pl.BlockSpec((T, 2 * block_k), lambda i, k: (0, k)),
                pl.BlockSpec((T, 1), lambda i, k: (0, 0)),
                pl.BlockSpec((block_k, block_n), lambda i, k: (k, i)),
                pl.BlockSpec((gb, block_n), lambda i, k: (k, i)),
            ],
            out_specs=pl.BlockSpec((T, block_n), lambda i, k: (0, i)),
            out_shape=jax.ShapeDtypeStruct((T, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((T, block_n), jnp.float32)],
        )(x8, sx, packed, scales)
    return f


def main():
    from lavida_mod_tpu.ops.pallas_w4 import quantize_w4_grouped, dequant_w4_grouped
    rng = np.random.default_rng(0)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.02
    packed_np, scales_np = quantize_w4_grouped(w, group=group)
    weights = [(jnp.asarray(packed_np), jnp.asarray(scales_np)) for _ in range(NCOPIES)]
    x_np = rng.standard_normal((T, K)).astype(np.float32)
    x = jnp.asarray(x_np).astype(jnp.bfloat16)
    ref = x_np @ dequant_w4_grouped(packed_np, scales_np, group)
    # pre-quantized activations
    amax = np.abs(x_np).max(1, keepdims=True)
    sx = jnp.asarray((amax / 127.0).astype(np.float32))
    x8 = jnp.asarray(np.clip(np.round(x_np / (amax / 127.0)), -127, 127).astype(np.int8))

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

    f1 = mk_v1()
    out1 = np.asarray(jax.jit(f1)(x, *weights[0]), np.float32)
    print("v1 rel:", np.abs(out1 - ref).max() / np.abs(ref).max())
    f2 = mk_w4a8()
    out2 = np.asarray(jax.jit(f2)(x8, sx, *weights[0]), np.float32)
    print("w4a8 rel:", np.abs(out2 - ref).max() / np.abs(ref).max())

    @jax.jit
    def chain1(x, n):
        def body(i, carry):
            x, acc = carry
            s = jnp.zeros(8, jnp.float32)
            for p, sc in weights:
                y = f1(x, p, sc)
                s += y[0, :8].astype(jnp.float32)
            x = x + s[0].astype(jnp.bfloat16) * 1e-12
            return x, acc + s
        return jax.lax.fori_loop(0, n, body, (x, jnp.zeros(8, jnp.float32)))[1]

    @jax.jit
    def chain2(x8, n):
        def body(i, carry):
            x8, acc = carry
            s = jnp.zeros(8, jnp.float32)
            for p, sc in weights:
                y = f2(x8, sx, p, sc)
                s += y[0, :8].astype(jnp.float32)
            x8 = x8 + s[0].astype(jnp.int8) * 0
            return x8, acc + s
        return jax.lax.fori_loop(0, n, body, (x8, jnp.zeros(8, jnp.float32)))[1]

    for name, chain, arg in (("v1  ", chain1, x), ("w4a8", chain2, x8)):
        float(jnp.sum(chain(arg, 2)))
        n = 30
        t0 = time.perf_counter(); float(jnp.sum(chain(arg, n)))
        per_call = ((time.perf_counter() - t0) / n - floor) / NCOPIES
        print(f"{name}: {per_call*1e3:.3f} ms/call {K2*N/per_call/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
