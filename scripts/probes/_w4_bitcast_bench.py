"""Probe: bitcast-int4 kernel variants (clean 8-copy harness)."""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, K, N, group = 32, 4096, 12288, 128
K2 = K // 2
NCOPIES = 8


def mk_v1(block_n, block_k):
    """bitcast + convert + bf16 s_rows mult, one dot per k-block."""
    nk = K2 // block_k
    g2 = group // 2
    gb = block_k // g2

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


def mk_v2(block_n, block_k):
    """bitcast + convert; scale re-associated onto the acc per group."""
    nk = K2 // block_k
    g2 = group // 2
    gb = block_k // g2

    def kernel(x_ref, p_ref, s_ref, o_ref, acc_ref):
        ki = pl.program_id(1)
        @pl.when(ki == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
        w = pltpu.bitcast(p_ref[...], jnp.int4).astype(jnp.bfloat16)
        x = x_ref[...]
        acc = jnp.zeros_like(acc_ref)
        for g in range(gb):
            d = jnp.dot(x[:, g * group:(g + 1) * group],
                        w[g * group:(g + 1) * group],
                        preferred_element_type=jnp.float32)
            acc += d * s_ref[g][None, :]
        acc_ref[...] += acc
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


def main():
    from lavida_mod_tpu.ops.pallas_w4 import quantize_w4_grouped, dequant_w4_grouped
    rng = np.random.default_rng(0)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.02
    packed_np, scales_np = quantize_w4_grouped(w, group=group)
    weights = [(jnp.asarray(packed_np), jnp.asarray(scales_np))
               for _ in range(NCOPIES)]
    x_np = rng.standard_normal((T, K)).astype(np.float32)
    x = jnp.asarray(x_np).astype(jnp.bfloat16)
    ref = x_np @ dequant_w4_grouped(packed_np, scales_np, group)

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

    for name, mk, bn, bk in (
        ("v1", mk_v1, 512, 1024), ("v1", mk_v1, 512, 2048),
        ("v1", mk_v1, 1024, 1024),
        ("v2", mk_v2, 512, 1024), ("v2", mk_v2, 512, 2048),
        ("v2", mk_v2, 1024, 1024),
    ):
        try:
            f = mk(bn, bk)
            out = np.asarray(jax.jit(f)(x, *weights[0]), np.float32)
            rel = np.abs(out - ref).max() / np.abs(ref).max()
            @jax.jit
            def chain(x, n, f=f):
                def body(i, carry):
                    x, acc = carry
                    s = jnp.zeros(8, jnp.float32)
                    for p, sc in weights:
                        y = f(x, p, sc)
                        s += y[0, :8].astype(jnp.float32)
                    x = x + s[0].astype(jnp.bfloat16) * 1e-12
                    return x, acc + s
                return jax.lax.fori_loop(0, n, body, (x, jnp.zeros(8, jnp.float32)))[1]
            float(jnp.sum(chain(x, 2)))
            n = 30
            t0 = time.perf_counter(); float(jnp.sum(chain(x, n)))
            per_call = ((time.perf_counter() - t0) / n - floor) / NCOPIES
            print(f"{name} bn={bn} bk={bk}: rel={rel:.4f} "
                  f"{per_call*1e3:.3f} ms/call {K2*N/per_call/1e9:.0f} GB/s")
        except Exception as e:
            print(name, bn, bk, "FAIL:", str(e)[:150])


if __name__ == "__main__":
    main()
