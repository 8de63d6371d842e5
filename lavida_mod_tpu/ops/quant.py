"""Weight-only int8 quantization for TPU serving.

Why: one v5e chip has 15.75G usable HBM; LaViDa's 8B LM is 15.45G in bf16 —
it cannot co-reside with its KV cache (measured: XLA OOM, bench notes).
Symmetric per-output-channel int8 halves weight memory AND decode latency:
the convert+scale fuses into the matmul's weight read (microbenched faster
than bf16 on v5e — the decode loop is weight-bandwidth-bound).

Layout: {"kernel_q": int8 [in, out], "scale": f32 [out]} replaces
{"kernel": bf16 [in, out]}.  `linear()` dispatches transparently so model
code is quantization-agnostic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_linear(p: dict, dtype=jnp.bfloat16) -> dict:
    """Quantize one linear-param dict (kernel [.., in, out] + optional
    bias).  Works on stacked [L, in, out] kernels too (per (L, out)
    channel scales)."""
    if "kernel" not in p:
        return p
    w = p["kernel"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)  # per-out-channel
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {"kernel_q": q, "scale": scale.squeeze(-2).astype(jnp.float32)}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantize_linear4(p: dict, group: int = 128) -> dict:
    """int4 grouped quantization of a single (unstacked) linear param dict:
    {"kernel_p4": int8 [in/2, out], "scales4": f32 [in/group, out]}.
    Serving-only layout (ops/pallas_w4.py kernel on TPU; reference dequant
    elsewhere)."""
    import numpy as np

    from .pallas_w4 import padded_in_dim, quantize_w4_grouped

    if "kernel" not in p:
        return p
    k = p["kernel"]
    assert k.ndim == 2, "int4-quantize unstacked (2D) kernels only"
    kn = np.asarray(k, np.float32)
    N = kn.shape[1]
    # pad the IN dim so big matmuls keep 2048-deep k-blocks (zero rows are
    # exact; _linear_w4 zero-pads the activations to match) — e.g. Qwen2's
    # 18944 FFN -> 20480, see pallas_w4.padded_in_dim
    Kp = padded_in_dim(kn.shape[0])
    if Kp != kn.shape[0]:
        kn = np.pad(kn, ((0, Kp - kn.shape[0]), (0, 0)))
    # pad the OUT dim to the kernel's 512-column block (e.g. Dream's
    # 151936-vocab head -> 152064): pad columns are zero weights, so
    # their logits are exactly 0 and "out_trim" slices them off after
    # the matmul — this keeps the big head on the int4 path instead of
    # falling back to int8 (2x the bandwidth-bound weight read).
    Np = -(-N // 512) * 512
    if Np != N:
        kn = np.pad(kn, ((0, 0), (0, Np - N)))
    packed, scales = quantize_w4_grouped(kn, group=group)
    out = {"kernel_p4": jnp.asarray(packed),
           "scales4": jnp.asarray(scales)}
    if Np != N:
        # static metadata: the trim width lives in the KEY (value is an
        # empty tuple, so it contributes no traced leaf — jit sees it as
        # pytree structure, keeping the slice width concrete)
        out[f"__trim_{N}__"] = ()
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def int4_layout_shapes(tree, group: int = 128):
    """Shape-level twin of quantize_params(bits=4) (models/llada.py): map a
    pytree of ShapeDtypeStructs whose linear dicts hold 2D "kernel"s to the
    W4A8 serving layout (kernel_p4/scales4/__trim_N__), with the same
    per-channel-int8 fallback for in-dims that break the scale grouping.
    For weight-free serving layouts (LaViDa.zero_init): quantize_linear4
    runs host-side numpy, so it cannot trace through jax.eval_shape.
    Parity with the real quantizer: tests/test_quant.py."""
    from .pallas_w4 import padded_in_dim

    def one(d):
        if isinstance(d, (list, tuple)):
            return type(d)(one(x) for x in d)
        if isinstance(d, dict):
            if "kernel" in d and len(d["kernel"].shape) == 2:
                K, N = d["kernel"].shape
                if K % group != 0:
                    out = {
                        "kernel_q": jax.ShapeDtypeStruct((K, N), jnp.int8),
                        "scale": jax.ShapeDtypeStruct((N,), jnp.float32),
                    }
                else:
                    Kp = padded_in_dim(K)
                    Np = -(-N // 512) * 512
                    out = {
                        "kernel_p4": jax.ShapeDtypeStruct(
                            (Kp // 2, Np), jnp.int8),
                        "scales4": jax.ShapeDtypeStruct(
                            (Kp // group, Np), jnp.float32),
                    }
                    if Np != N:
                        out[f"__trim_{N}__"] = ()
                if "bias" in d:
                    out["bias"] = jax.ShapeDtypeStruct(
                        d["bias"].shape, d["bias"].dtype)
                return out
            return {k: one(v) for k, v in d.items()}
        return d

    return one(tree)


def _linear_w4(x: jax.Array, p: dict, preferred=None) -> jax.Array:
    from .pallas_w4 import w4_matmul_grouped

    K2 = p["kernel_p4"].shape[0]
    group = (K2 * 2) // p["scales4"].shape[0]
    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    if x2d.shape[-1] != 2 * K2:
        # kernel rows were zero-padded for k-blocking (quantize_linear4);
        # zero activations in the pad region contribute exactly 0
        x2d = jnp.pad(x2d, ((0, 0), (0, 2 * K2 - x2d.shape[-1])))
    trim = next((int(key[7:-2]) for key in p
                 if key.startswith("__trim_")), None)
    if jax.default_backend() == "tpu":
        y = w4_matmul_grouped(
            x2d.astype(jnp.bfloat16),
            p["kernel_p4"], p["scales4"], group=group,
        )
        if trim is not None:
            y = y[:, :trim]
        y = y.astype(preferred) if preferred is not None else y.astype(x.dtype)
    else:
        # CPU fallback mirrors the kernel's W4A8 math (per-token int8
        # activations, integer dot, grouped scale on the accumulator) so
        # CPU tests exercise the same numerics as the chip.
        q = p["kernel_p4"].astype(jnp.int32)
        lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(q, 28), 28)
        hi = jax.lax.shift_right_arithmetic(q, 4)
        K = K2 * 2
        w = jnp.stack([lo, hi], axis=1).reshape(K, -1)  # int32 [K, N]
        xf = x2d.astype(jnp.float32)
        sx = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8
        ) / 127.0
        x8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int32)
        G = K // group
        acc = jnp.einsum(
            "tgk,gkn->tgn",
            x8.reshape(-1, G, group),
            w.reshape(G, group, -1),
        ).astype(jnp.float32)
        y = (jnp.einsum("tgn,gn->tn", acc, p["scales4"]) * sx).astype(
            jnp.bfloat16
        )
        if trim is not None:
            y = y[:, :trim]
        y = y.astype(preferred) if preferred is not None else y.astype(x.dtype)
    return y.reshape(lead + (y.shape[-1],))


def linear(x: jax.Array, p: dict, preferred=None) -> jax.Array:
    """x @ W (+ bias), W plain / int8 / int4-grouped.  `preferred` sets
    the accumulation/output dtype (e.g. f32 for the logit head).  When LoRA
    factors are attached (train/lora.py), adds (x @ A @ B) * (alpha/r)."""
    if "kernel_p4" in p:
        y = _linear_w4(x, p, preferred)
    elif "kernel_q" in p:
        w = p["kernel_q"].astype(x.dtype)
        y = jnp.matmul(x, w, preferred_element_type=preferred)
        y = y * p["scale"].astype(y.dtype)
    else:
        y = jnp.matmul(x, p["kernel"], preferred_element_type=preferred)
    if "lora_a" in p:
        delta = (x @ p["lora_a"].astype(x.dtype)) @ p["lora_b"].astype(x.dtype)
        y = y + delta.astype(y.dtype) * p["lora_scale"].astype(y.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def linear_out_dim(p: dict) -> int:
    k = p.get("kernel_q", p.get("kernel"))
    return k.shape[-1]


def linear_act_int8(x: jax.Array, p: dict, preferred=None) -> jax.Array:
    """Dynamic per-token int8 activation quant + int8 weights -> s8xs8
    MXU matmul (2x bf16 rate on v5e).  Opt-in prefill path: the compute-
    bound prefill doubles throughput; expect ~0.2-0.5% logit error from the
    activation quantization (weight-only stays the default).
    Falls back to `linear` when the weight isn't quantized.

    On TPU, kernel-friendly shapes route through the fused Pallas kernel
    (ops/pallas_w8.py): the int32 accumulator and the f32 sx*scale
    epilogue stay in VMEM instead of round-tripping ~150 MB/matmul of
    intermediates through HBM (32-layer prefill chain measured 77 ms XLA
    -> 51 ms fused, 287 TOPS)."""
    if "kernel_q" not in p:
        return linear(x, p, preferred)
    if jax.default_backend() == "tpu" and p["kernel_q"].ndim == 2:
        # kernel pads T, K and N itself (128-exact, zero-pad = exact):
        # SigLIP's fc1 (N=4304) and fc2 (K=4304) both ride it now
        from .pallas_w8 import linear_w8a8

        return linear_w8a8(x, p, preferred)
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(amax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, p["kernel_q"],
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * p["scale"]
    if "lora_a" in p:
        delta = (x @ p["lora_a"].astype(x.dtype)) @ p["lora_b"].astype(x.dtype)
        y = y + delta.astype(y.dtype) * p["lora_scale"].astype(y.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y if preferred is not None else y.astype(x.dtype)
