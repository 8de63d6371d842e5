"""Idle-chip comparison at prefill shape [1152,4096]x[4096,12288]:
incumbent (int8-weight dequant -> bf16 matmul) vs XLA s8xs8 act8 vs
W4A8 pallas blocks. Chained+amortized."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
sys.argv = [sys.argv[0]]
from scripts.probes._w4a8_prefill_tune import mk, T, K, N, group, K2

def bench(fn, args, n=30, cast=None):
    @jax.jit
    def chain(a0, rest, n):
        def body(i, carry):
            a0, acc = carry
            y = fn(a0, *rest)
            if cast == "int8":
                a0 = a0 ^ y[:T, :K].astype(jnp.int8)
            else:
                a0 = a0 + y[:T, :K].astype(a0.dtype) * 1e-9
            return a0, acc + y[0, :8].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body,
                                 (a0, jnp.zeros((8,), jnp.float32)))[1]
    float(jnp.sum(chain(args[0], args[1:], 2)))
    t0 = time.perf_counter(); float(jnp.sum(chain(args[0], args[1:], n)))
    return (time.perf_counter() - t0) / n

def main():
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32)).astype(jnp.bfloat16)
    x8 = jnp.asarray(rng.integers(-127, 127, (T, K), dtype=np.int8))
    sx = jnp.asarray(rng.random((T, 1), np.float32) * 0.01)
    w8 = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))
    ws = jnp.asarray(rng.random((N,), np.float32) * 0.01)
    packed = jnp.asarray(rng.integers(-128, 128, (K2, N)).astype(np.int8))
    scales = jnp.asarray(rng.random((K // group, N), np.float32) * 0.01)
    flops = 2 * T * K * N

    # incumbent: int8 weight dequant -> bf16 matmul (ops/quant.linear)
    inc = lambda x, w, s: (jnp.matmul(x, w.astype(jnp.bfloat16)) * s.astype(jnp.bfloat16))
    dt = bench(inc, (xb, w8, ws))
    print(f"incumbent w8 dequant bf16: {dt*1e3:7.3f} ms {flops/dt/1e12:6.1f} TF")

    # act8: s8 x s8 -> int32, scale f32 (ops/quant.linear_act_int8 core)
    def act8(x8_, w, s):
        acc = jax.lax.dot_general(x8_, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * s).astype(jnp.bfloat16)
    dt = bench(act8, (x8, w8, ws), cast="int8")
    print(f"XLA s8xs8 + scale        : {dt*1e3:7.3f} ms {flops/dt/1e12:6.1f} TF")

    for bt, bn, bk in ((288, 512, 2048), (384, 1024, 2048), (576, 512, 2048),
                       (384, 512, 1024), (256, 512, 1024)):
        if T % bt or N % bn or K2 % bk:
            print(f"skip t{bt} n{bn} k{bk}"); continue
        dt = bench(mk(bt, bn, bk), (x8, sx, packed, scales), cast="int8")
        print(f"w4a8 t{bt} n{bn} k{bk}   : {dt*1e3:7.3f} ms {flops/dt/1e12:6.1f} TF")

if __name__ == "__main__":
    main()
