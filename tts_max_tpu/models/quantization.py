"""Weight-only int8 quantization for serving.

Decode on TPU is HBM-bandwidth-bound (BENCHMARKS.md): every step reads all
2.5 GB of bf16 weights. Per-output-channel symmetric int8 storage halves
that; weights dequantize on the fly in VMEM (XLA fuses the cast into the
matmul), activations stay bf16. This replaces the precision knob the
reference delegates to vLLM.

A quantized kernel is ``{"q": int8 [..., in, out], "scale": f32 [..., out]}``;
a quantized embedding is ``{"q": int8 [V, D], "scale": f32 [V]}`` (per-row),
whose row scales double as the output-channel scales of the tied LM head.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def _min_mse_scale(w32, amax, axis, qmax):
    """Clip search: abs-max scaling wastes the quantizer's levels on
    outliers; picking the min-MSE clip ratio per channel (or per group)
    costs nothing at runtime and measurably improves top-1 agreement."""
    best_err = None
    best_scale = jnp.maximum(amax / qmax, 1e-12)
    for ratio in (1.0, 0.9, 0.8, 0.7, 0.6):
        s = jnp.maximum(amax * ratio / qmax, 1e-12)
        deq = jnp.clip(jnp.round(w32 / s), -qmax, qmax) * s
        err = jnp.sum((deq - w32) ** 2, axis=axis, keepdims=True)
        if best_err is None:
            best_err, best_scale = err, s
        else:
            best_scale = jnp.where(err < best_err, s, best_scale)
            best_err = jnp.minimum(err, best_err)
    return best_scale


def _pack4(q: jnp.ndarray) -> jnp.ndarray:
    """int8-valued int4 levels [-7, 7] -> nibble-packed uint8 along the last
    axis (low nibble first; two's-complement)."""
    u = (q.astype(jnp.int8) & 0xF).astype(jnp.uint8)
    return u[..., 0::2] | (u[..., 1::2] << 4)


def quantize_tensor(
    w: jnp.ndarray, axis: int, bits: int = 8, group_size: int | None = None
) -> dict[str, jnp.ndarray]:
    """Symmetric int8/int4, reducing ONLY over ``axis`` (the contraction dim).

    Leading batch dims (e.g. the stacked-layer L of [L, in, out] kernels)
    keep their own scales so lax.scan can slice layer by layer.

    ``bits=4`` stores NIBBLE-PACKED uint8 (two two's-complement int4 values
    per byte, key "q4", adjacent pairs packed along the LAST axis of the
    tensor IN ITS NATURAL ORIENTATION): half the int8 HBM read — measured
    36% faster per decode-scan step at llama-1B geometry on a v5e. Packed
    bytes rather than resident jnp.int4 arrays because S4 arrays crossing a
    jit boundary hit a device_put layout recursion on the axon TPU platform
    (CLAUDE.md). Inside a many-step program, ``unpack_packed_params`` turns
    the bytes into a natural-layout S4 array via ONE bitcast+reshape (the
    pair axis bitcast appends is the last axis, which is why packing must be
    along it — any other arrangement needs an S4 transpose, and transposed
    S4 layouts poison every subsequent matmul). The tensor's last axis must
    be even.

    ``group_size`` (int4 kernels in natural [..., K, N] orientation only)
    switches to SUB-CHANNEL grouping: each ``group_size``-wide block of the
    contraction dim gets its own scale, stored as [..., K/group_size, N] —
    same ndim as the unpacked weight, which is how the compute helpers
    recognize the grouped form. Per-channel int4 is coarse (one outlier
    poisons a whole 2048-deep column); 128-wide groups recover near-int8
    top-1 agreement for a 1/64-of-int4-bytes scale overhead
    (tools/quant_quality.py measures both).
    """
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    qmax = 7.0 if bits == 4 else 127.0
    w32 = w.astype(jnp.float32)
    if group_size is not None:
        if bits != 4:
            raise ValueError("group_size is an int4 kernel option")
        if axis != w.ndim - 2:
            raise ValueError(
                "grouped quantization expects kernel orientation [..., K, N]"
            )
        K = w.shape[axis]
        if K % group_size:
            raise ValueError(f"K={K} not divisible by group_size={group_size}")
        if w.shape[-1] % 2:
            raise ValueError("int4 packing needs an even last axis")
        lead, N = w.shape[:-2], w.shape[-1]
        wg = w32.reshape(*lead, K // group_size, group_size, N)
        amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)
        scale = _min_mse_scale(wg, amax, -2, qmax)
        q = jnp.clip(jnp.round(wg / scale), -qmax, qmax)
        return {
            "q4": _pack4(q.reshape(*lead, K, N)),
            "scale": jnp.squeeze(scale, axis=-2).astype(jnp.float32),
        }
    amax = jnp.max(jnp.abs(w32), axis=axis, keepdims=True)
    scale = jnp.maximum(amax / qmax, 1e-12)
    if bits == 4:
        scale = _min_mse_scale(w32, amax, axis, qmax)
    q = jnp.clip(jnp.round(w32 / scale), -qmax, qmax)
    sq_scale = jnp.squeeze(scale, axis=axis).astype(jnp.float32)
    if bits == 8:
        return {"q": q.astype(jnp.int8), "scale": sq_scale}
    if w.shape[-1] % 2:
        raise ValueError("int4 packing needs an even last axis")
    return {"q4": _pack4(q), "scale": sq_scale}


def unpack_q4(q4: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Packed uint8 [..., K/2] -> values [..., K] in ``dtype`` via a bitcast
    to S4 (low nibble first)."""
    v = jax.lax.bitcast_convert_type(q4, jnp.int4)  # [..., K/2, 2]
    return v.reshape(*q4.shape[:-1], -1).astype(dtype)


def unpack_packed_params(tree: Any) -> Any:
    """Convert every nibble-packed leaf dict to an in-program S4 array dict
    ({"q": int4, "scale"}) the standard quantized compute paths consume.

    Call this AT THE TOP of a jitted many-step program (generate / a
    host-staged stage): the S4 copies materialize once in HBM and every
    decode step then reads int4-density weights — the measured +36% over
    int8. (Bitcast-per-matmul does NOT fuse on this toolchain, and resident
    S4 arrays cannot cross jit boundaries on the axon platform, so packed
    uint8 at rest + one in-program conversion is the only fast layout.)
    Idempotent for non-packed leaves.
    """

    def walk(p):
        if isinstance(p, dict):
            if "q4" in p:  # [.., X/2] packed-last -> natural S4 [.., X]
                v = jax.lax.bitcast_convert_type(p["q4"], jnp.int4)
                v = v.reshape(*p["q4"].shape[:-1], -1)
                # the barrier forces ONE materialized S4 buffer; without it
                # XLA re-derives from the packed bytes inside every loop
                # iteration (measured 2.31 vs 0.30 ms/step at 1B geometry)
                return {
                    "q": jax.lax.optimization_barrier(v),
                    "scale": p["scale"],
                }
            return {k: walk(v) for k, v in p.items()}
        if isinstance(p, list):
            return [walk(v) for v in p]
        return p

    return walk(tree)


def is_quantized(p) -> bool:
    return isinstance(p, dict) and "scale" in p and ("q" in p or "q4" in p)


def is_packed4(p) -> bool:
    return isinstance(p, dict) and "q4" in p


def is_grouped(p) -> bool:
    """Grouped int4 kernel: scale [..., G, N] has the same ndim as the
    unpacked weight [..., K, N] (per-channel scales have one fewer)."""
    if not (isinstance(p, dict) and "scale" in p):
        return False
    q = p.get("q4", p.get("q"))
    return q is not None and p["scale"].ndim == q.ndim


def dequantize(p: dict[str, jnp.ndarray], dtype=jnp.bfloat16) -> jnp.ndarray:
    scale = p["scale"]
    q = unpack_q4(p["q4"], jnp.float32) if "q4" in p else p["q"].astype(
        jnp.float32
    )
    if is_grouped(p):  # scale [..., G, N] over weight [..., K, N]
        G, (K, N) = scale.shape[-2], q.shape[-2:]
        qg = q.reshape(*q.shape[:-2], G, K // G, N)
        return (qg * scale[..., :, None, :]).reshape(q.shape).astype(dtype)
    # broadcast scale over the channel (last for kernels, first for embeddings)
    if q.shape[-1] == scale.shape[-1]:
        return (q * scale).astype(dtype)
    return (q * scale[..., None]).astype(dtype)


def quantize_llama_params(
    params: Any,
    bits: int = 8,
    embed_bits: int | None = None,
    group_size: int | None = None,
) -> Any:
    """Quantize every matmul kernel (per-out-channel) and the embedding
    (per-row). Norm scales/biases stay fp.

    ``embed_bits`` overrides ``bits`` for the embedding / LM head (default:
    int8 floor — logits precision drives sampling quality, and the windowed
    head read is already small relative to the layer stack, so int4-ing it
    buys little bandwidth for a real quality cost).

    ``group_size`` (int4 only) switches layer kernels to sub-channel
    grouped scales — near-int8 agreement at int4 bandwidth
    (tools/quant_quality.py). The embedding / LM head keep per-row/channel
    scales (they are int8 anyway by default).
    """
    eb = embed_bits if embed_bits is not None else max(bits, 8)

    def walk(tree, path=()):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if k == "kernel" and hasattr(v, "ndim") and v.ndim >= 2:
                    b = eb if path and path[-1] == "lm_head" else bits
                    gs = group_size if b == 4 else None
                    out[k] = quantize_tensor(
                        v, axis=v.ndim - 2, bits=b, group_size=gs
                    )
                elif k == "embedding":
                    out[k] = quantize_tensor(v, axis=1, bits=eb)  # per-row
                else:
                    out[k] = walk(v, path + (k,))
            return out
        if isinstance(tree, list):
            return [walk(v, path) for v in tree]
        return tree

    return walk(params)


def quantize_for_serving(params: Any, mode: str) -> Any:
    """Serving-CLI helper: ``mode`` in {"", "int8", "int4", "int4-gN"} →
    params quantized under one jit (the full-precision tree never lives next
    to the quantized one in HBM). "int4-g128" = 128-wide sub-channel groups
    (the quality-recommended int4 form)."""
    if not mode:
        return params
    import functools

    import jax

    group_size = None
    if mode.startswith("int4-g"):
        group_size = int(mode[len("int4-g"):])
        mode = "int4"
    bits = 4 if mode == "int4" else 8
    return jax.jit(
        functools.partial(
            quantize_llama_params, bits=bits, group_size=group_size
        )
    )(params)


# --- compute helpers used by the model code ---------------------------------


def matmul(x: jnp.ndarray, p, dtype=None) -> jnp.ndarray:
    """x @ kernel supporting plain arrays and quantized kernels ("q" int8/S4
    or "q4" packed bytes, both natural [K, N] orientation; per-out-channel
    scale [N] or sub-channel-grouped scale [G, N]).

    The grouped path contracts each K-group separately and applies the
    scales to the [..., G, N] partial sums — the weight read stays
    int4-density (a dequantize-into-the-matmul would tempt XLA into
    materializing a bf16 [K, N] copy per step), and the extra output-side
    FLOPs are negligible next to the matmul."""
    dtype = dtype or x.dtype
    if is_quantized(p):
        w = unpack_q4(p["q4"], dtype) if "q4" in p else p["q"].astype(dtype)
        scale = p["scale"]
        if scale.ndim == w.ndim:  # grouped: w [K, N], scale [G, N]
            if w.ndim != 2:
                raise ValueError(
                    "grouped matmul expects a per-layer [K, N] kernel"
                )
            K, N = w.shape
            G = scale.shape[-2]
            xg = x.reshape(*x.shape[:-1], G, K // G)
            yg = jnp.einsum("...gk,gkn->...gn", xg, w.reshape(G, K // G, N))
            return jnp.einsum("...gn,gn->...n", yg, scale.astype(dtype))
        y = x @ w
        return y * scale.astype(dtype)
    return x @ p.astype(dtype)


def embed_lookup(emb, tokens: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    if is_quantized(emb):
        if "q4" in emb:
            # gather packed rows, then unpack along the feature axis
            rows = unpack_q4(emb["q4"][tokens], dtype)
        else:
            rows = emb["q"][tokens].astype(dtype)
        return rows * emb["scale"][tokens][..., None].astype(dtype)
    return emb[tokens].astype(dtype)


def tied_logits(h: jnp.ndarray, emb) -> jnp.ndarray:
    """h @ embedding.T for plain or quantized embeddings (row scales become
    output-channel scales)."""
    if isinstance(emb, dict) and "q4" in emb:
        w = unpack_q4(emb["q4"], h.dtype)  # [V, D]
        logits = jnp.einsum("...d,vd->...v", h, w)
        return (logits * emb["scale"].astype(h.dtype)).astype(jnp.float32)
    if is_quantized(emb):
        logits = h @ emb["q"].astype(h.dtype).T
        return (logits * emb["scale"].astype(h.dtype)).astype(jnp.float32)
    return (h @ emb.astype(h.dtype).T).astype(jnp.float32)
