"""Attention ops — the TPU replacement for flash-attn 2 CUDA kernels
(reference modeling.py:15,37 hard-requires flash_attention_2).

Training path: ``jax.nn.dot_product_attention``, which lowers to the XLA/TPU
fused attention (cuDNN/TPU flash) when available, with a Pallas splash-style
kernel available behind ``implementation='pallas'`` (ops/pallas_attention.py).

Decode path: single-step attention against a padded KV cache with a length
mask (paged/ragged Pallas kernel in inference.engine for serving).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """[B, S, n_kv, D] -> [B, S, n_kv * n_rep, D] for GQA."""
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d)).reshape(
        b, s, h * n_rep, d
    )


def causal_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    implementation: str | None = None,
) -> jnp.ndarray:
    """Causal self-attention for training.

    q: [B, S, Hq, D]; k, v: [B, S, Hkv, D] (GQA broadcast handled internally).
    Returns [B, S, Hq, D]. Softmax in fp32.

    On TPU with long sequences the Pallas flash kernel is used (O(S) memory,
    MXU-tiled); otherwise XLA's fused attention.
    """
    n_rep = q.shape[2] // k.shape[2]
    if implementation == "tpu_flash":
        # JAX's bundled TPU flash kernel (fwd + Pallas dkv/dq backward).
        # MEASURED NEGATIVE at this model's shapes (round 5,
        # bench_logs/xprof_train_r5): at head_dim 64 / batch 2 the bwd
        # kernels alone cost 58% of the train step — 6088 tok/s vs 7470
        # for the default below, whose "naive" XLA backward XLA fuses
        # into MXU convolution fusions. Kept selectable for larger-head
        # configs where it may win.
        return _tpu_flash_causal(q, k, v, n_rep)
    if implementation == "pallas" or (
        implementation is None
        and q.shape[1] >= 1024
        and jax.default_backend() not in ("cpu",)
    ):
        from tts_max_tpu.ops.pallas_attention import flash_attention

        return flash_attention(q, k, v, causal=True)
    try:
        return jax.nn.dot_product_attention(
            q, k, v, is_causal=True, implementation=implementation
        )
    except (NotImplementedError, ValueError, TypeError):
        pass
    k = repeat_kv(k, n_rep)
    v = repeat_kv(v, n_rep)
    return _causal_attention_xla(q, k, v)


def _tpu_flash_causal(q, k, v, n_rep: int):
    """jax.experimental.pallas.ops.tpu.flash_attention with GQA broadcast:
    q [B, S, Hq, D] / k, v [B, S, Hkv, D] -> [B, S, Hq, D]. Differentiable
    end to end (the bundled kernel ships dq/dkv Pallas backward passes)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as tpu_flash,
    )

    k = repeat_kv(k, n_rep)
    v = repeat_kv(v, n_rep)
    # [B, S, H, D] -> [B, H, S, D]
    qh = q.transpose(0, 2, 1, 3)
    kh = k.transpose(0, 2, 1, 3)
    vh = v.transpose(0, 2, 1, 3)
    out = tpu_flash(
        qh, kh, vh, causal=True, sm_scale=q.shape[-1] ** -0.5
    )
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def _causal_attention_xla(q, k, v):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    s = q.shape[1]
    mask = jnp.tril(jnp.ones((s, s), dtype=bool))
    logits = jnp.where(mask[None, None], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def full_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Non-causal attention (Vocos backbone, reference decoder_modules.py:283)."""
    try:
        return jax.nn.dot_product_attention(q, k, v)
    except (NotImplementedError, ValueError, TypeError):
        scale = q.shape[-1] ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def decode_attention_bucketed(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    lengths: jnp.ndarray,
    bucket: int = 256,
) -> jnp.ndarray:
    """Decode attention reading only the smallest static cache PREFIX that
    covers max(lengths), chosen at runtime via lax.switch.

    A full-length KV reservation (e.g. 1856 for a 1792-token budget) makes
    naive decode attention read the whole padded cache every step — early
    in generation that is ~10x wasted HBM traffic. Each switch branch slices
    a static prefix (multiples of ``bucket``), so XLA compiles a handful of
    attention sizes and the loop pays only for the tokens that exist.

    MEASURED (v5e, 1B int8, batch 32, cache 1856): lax.switch dispatch costs
    more than the saved reads inside the decode while_loop (726 vs 1008
    tok/s), so the model keeps plain decode_attention; staged cache growth
    at the generate level is the better fix (future work). Kept for callers
    outside tight loops.
    """
    def _prefix(c, p):
        return jax.tree.map(lambda x: x[:, :p], c) if isinstance(c, dict) else c[:, :p]

    max_len = (k_cache["q"] if isinstance(k_cache, dict) else k_cache).shape[1]
    n_buckets = (max_len + bucket - 1) // bucket
    if n_buckets <= 1:
        return decode_attention(q, k_cache, v_cache, lengths)
    idx = jnp.clip((jnp.max(lengths) + bucket - 1) // bucket - 1, 0, n_buckets - 1)

    def branch(i):
        prefix = min((i + 1) * bucket, max_len)

        def fn(q, k_cache, v_cache, lengths):
            return decode_attention(
                q, _prefix(k_cache, prefix), _prefix(v_cache, prefix), lengths
            )

        return fn

    return jax.lax.switch(
        idx, [branch(i) for i in range(n_buckets)], q, k_cache, v_cache, lengths
    )


def decode_attention_prewrite(
    q: jnp.ndarray,
    k_cache,
    v_cache,
    lengths: jnp.ndarray,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
) -> jnp.ndarray:
    """Decode attention against the PRE-write cache + an explicit term for
    the new token.

    Mathematically equal to writing (k_new, v_new) at row ``lengths`` and
    attending with mask ``lengths + 1``: the cache contributes positions
    < lengths and the new token contributes one extra softmax column
    (computed from the fp k_new/v_new — with an int8 cache this is
    slightly MORE accurate than the post-write path, which attends to the
    just-quantized row). The point is dataflow: the cache scatter's output
    then feeds ONLY the next layer's carry, never an in-iteration read —
    the double-consumer pattern that makes XLA materialize a full cache
    copy per layer (round-4 probes: ~13.6 μs/slot ≈ 5x the raw KV read).

    q: [B, Hq, D]; k_new/v_new: [B, Hkv, D]; caches as decode_attention.
    """
    k_quant = isinstance(k_cache, dict)
    v_quant = isinstance(v_cache, dict)
    kq = k_cache["q"] if k_quant else k_cache
    vq = v_cache["q"] if v_quant else v_cache
    b, max_len, hkv, d = kq.shape
    hq = q.shape[1]
    n_rep = hq // hkv
    scale = d ** -0.5
    qg = q.reshape(b, hkv, n_rep, d)
    logits = jnp.einsum(
        "bgrd,bkgd->bgrk", qg, kq.astype(q.dtype)
    ).astype(jnp.float32) * scale
    if k_quant:
        logits = logits * jnp.moveaxis(k_cache["scale"], 1, 2)[:, :, None, :]
    pos = jnp.arange(max_len)[None, None, None, :]
    mask = pos < lengths[:, None, None, None]
    logits = jnp.where(mask, logits, -1e30)
    s_new = jnp.einsum(
        "bgrd,bgd->bgr", qg, k_new.astype(q.dtype)
    ).astype(jnp.float32) * scale
    logits = jnp.concatenate([logits, s_new[..., None]], axis=-1)
    probs = jax.nn.softmax(logits, axis=-1)
    p_cache, p_new = probs[..., :-1], probs[..., -1:]
    if v_quant:
        p_cache = p_cache * jnp.moveaxis(v_cache["scale"], 1, 2)[:, :, None, :]
    out = jnp.einsum(
        "bgrk,bkgd->bgrd", p_cache.astype(q.dtype), vq.astype(q.dtype)
    ) + p_new.astype(q.dtype) * v_new.astype(q.dtype)[:, :, None, :]
    return out.reshape(b, hq, d)


def decode_attention_delta(
    q: jnp.ndarray,
    k_cache,
    v_cache,
    base_lengths: jnp.ndarray,
    k_delta: jnp.ndarray,
    v_delta: jnp.ndarray,
    delta_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Decode attention over a READ-ONLY cache plus a small in-dispatch
    delta buffer of freshly written K/V rows.

    Round-4 probes showed the per-step cache scatter forcing XLA to copy
    the whole KV cache every decode step (~2x cache bytes: 12.2 vs 3.9
    ms/step at 768 slots without the write). The delta formulation keeps
    the big cache UNWRITTEN inside a K-step dispatch — positions
    >= base_lengths live in (k_delta, v_delta) [B, K, Hkv, D] with
    ``delta_mask`` [B, K] marking valid rows (including the current
    step's) — and the dispatch commits the delta once at the end
    (llama.commit_delta). One joint softmax over [T + K] columns, exactly
    the math of write-then-attend; with an int8 cache the delta rows are
    attended UNQUANTIZED (slightly more accurate than the old path, which
    read back the just-quantized row).

    q: [B, Hq, D]; caches as decode_attention; base_lengths: [B] valid
    CACHE entries (frozen for the dispatch).
    """
    k_quant = isinstance(k_cache, dict)
    v_quant = isinstance(v_cache, dict)
    kq = k_cache["q"] if k_quant else k_cache
    vq = v_cache["q"] if v_quant else v_cache
    b, max_len, hkv, d = kq.shape
    hq = q.shape[1]
    n_rep = hq // hkv
    scale = d ** -0.5
    qg = q.reshape(b, hkv, n_rep, d)
    logits = jnp.einsum(
        "bgrd,bkgd->bgrk", qg, kq.astype(q.dtype)
    ).astype(jnp.float32) * scale
    if k_quant:
        logits = logits * jnp.moveaxis(k_cache["scale"], 1, 2)[:, :, None, :]
    pos = jnp.arange(max_len)[None, None, None, :]
    mask = pos < base_lengths[:, None, None, None]
    logits = jnp.where(mask, logits, -1e30)
    s_del = jnp.einsum(
        "bgrd,bkgd->bgrk", qg, k_delta.astype(q.dtype)
    ).astype(jnp.float32) * scale
    s_del = jnp.where(delta_mask[:, None, None, :], s_del, -1e30)
    logits = jnp.concatenate([logits, s_del], axis=-1)
    probs = jax.nn.softmax(logits, axis=-1)
    p_cache, p_del = probs[..., :max_len], probs[..., max_len:]
    if v_quant:
        p_cache = p_cache * jnp.moveaxis(v_cache["scale"], 1, 2)[:, :, None, :]
    out = jnp.einsum(
        "bgrk,bkgd->bgrd", p_cache.astype(q.dtype), vq.astype(q.dtype)
    ) + jnp.einsum(
        "bgrk,bkgd->bgrd", p_del.astype(q.dtype), v_delta.astype(q.dtype)
    )
    return out.reshape(b, hq, d)


def decode_attention_dense(
    q: jnp.ndarray,
    k_cache,
    v_cache,
    lengths: jnp.ndarray,
) -> jnp.ndarray:
    """MXU-shaped decode attention: block-diagonal queries, one dense
    [Hq, Hkv*D] x [Hkv*D, T] matmul pair per sequence — pure XLA.

    The grouped einsum form below lowers to per-(batch, kv-head)
    [n_rep, D] x [D, T] matmuls — <1% MXU utilization at GQA decode shapes,
    which round-4 probes showed costing ~5x the raw KV bytes (13.6 μs/slot
    at 1B B=64). Here each query head's D-slice sits in its kv-head's
    column block of a [Hq, Hkv*D] matrix, so ONE dense product per
    sequence computes all per-head scores (off-head terms multiply zeros;
    ~Hkv x redundant FLOPs but MXU-shaped, ~0.4 ms of MXU time per step at
    1B serving shapes), and a second dense product applies the
    probabilities to V; the epilogue extracts each head's diagonal block.
    Same trick as ops/paged_attention.paged_decode_attention_dense, but
    with no Pallas custom call there is no operand materialization — this
    composes with the layer scan for free. Numerics identical to
    :func:`decode_attention` (parity-tested).
    """
    k_quant = isinstance(k_cache, dict)
    v_quant = isinstance(v_cache, dict)
    kq = k_cache["q"] if k_quant else k_cache
    vq = v_cache["q"] if v_quant else v_cache
    b, max_len, hkv, d = kq.shape
    hq = q.shape[1]
    n_rep = hq // hkv
    flat = hkv * d
    qg = q.reshape(b, hkv, n_rep, d).astype(jnp.float32) * (d**-0.5)
    eye = jnp.eye(hkv, dtype=jnp.float32)
    qbd = (qg[:, :, :, None, :] * eye[:, None, :, None]).reshape(b, hq, flat)
    kf = kq.reshape(b, max_len, flat)
    # [B, Hq, flat] @ [B, T, flat]^T -> [B, Hq, T] in one batched matmul
    logits = jax.lax.dot_general(
        qbd.astype(q.dtype), kf.astype(q.dtype),
        (((2,), (2,)), ((0,), (0,))),
    ).astype(jnp.float32)
    if k_quant:
        # per-(token, head) K scales: column t of head h's rows
        ks = jnp.moveaxis(k_cache["scale"], 1, 2)  # [B, Hkv, T]
        logits = logits * jnp.repeat(ks, n_rep, axis=1)
    pos = jnp.arange(max_len)[None, None, :]
    logits = jnp.where(pos < lengths[:, None, None], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    if v_quant:
        vs = jnp.moveaxis(v_cache["scale"], 1, 2)
        probs = probs * jnp.repeat(vs, n_rep, axis=1)
    probs = probs.astype(q.dtype)
    vf = vq.reshape(b, max_len, flat).astype(q.dtype)
    # [B, Hq, T] @ [B, T, flat] -> [B, Hq, flat]
    full = jax.lax.dot_general(
        probs, vf, (((2,), (1,)), ((0,), (0,)))
    )
    # extract each head's diagonal [n_rep, D] block
    out = jnp.einsum(
        "bhrkd,hk->bhrd",
        full.reshape(b, hkv, n_rep, hkv, d),
        eye.astype(full.dtype),
    )
    return out.reshape(b, hq, d)


@functools.partial(jax.jit, static_argnames=())
def decode_attention(
    q: jnp.ndarray,
    k_cache,
    v_cache,
    lengths: jnp.ndarray,
) -> jnp.ndarray:
    """One-token decode attention against a padded KV cache.

    q: [B, Hq, D] (the new token's query)
    k_cache/v_cache: [B, max_len, Hkv, D] — positions >= lengths are garbage.
    Either may instead be a quantized cache ``{"q": int8 [B, max_len, Hkv, D],
    "scale": f32 [B, max_len, Hkv]}`` (per-token-per-head symmetric int8);
    the int8 payload is what streams from HBM — half the bytes of bf16 — and
    the scales fold into the attention logits / probabilities, so accuracy
    loss is negligible (per-token scales absorb RoPE magnitude variation).
    lengths: [B] number of valid cache entries (including the new token).
    Returns [B, Hq, D].

    ``TTS_MAX_DENSE_DECODE_ATTN=1`` routes through
    :func:`decode_attention_dense` (MXU-shaped block-diagonal matmuls).
    """
    import os

    if os.environ.get("TTS_MAX_DENSE_DECODE_ATTN", "0") == "1":
        return decode_attention_dense(q, k_cache, v_cache, lengths)
    k_quant = isinstance(k_cache, dict)
    v_quant = isinstance(v_cache, dict)
    kq = k_cache["q"] if k_quant else k_cache
    vq = v_cache["q"] if v_quant else v_cache
    b, max_len, hkv, d = kq.shape
    hq = q.shape[1]
    n_rep = hq // hkv
    scale = d ** -0.5
    # [B, max_len, Hkv, n_rep] logits via einsum on grouped heads
    qg = q.reshape(b, hkv, n_rep, d)
    logits = jnp.einsum(
        "bgrd,bkgd->bgrk", qg, kq.astype(q.dtype)
    ).astype(jnp.float32) * scale
    if k_quant:
        # fold per-(token, head) K scales into the logits: [B,k,g] -> [B,g,1,k]
        logits = logits * jnp.moveaxis(k_cache["scale"], 1, 2)[:, :, None, :]
    pos = jnp.arange(max_len)[None, None, None, :]
    mask = pos < lengths[:, None, None, None]
    logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    if v_quant:
        # fold per-(token, head) V scales into the probabilities (fp32)
        probs = probs * jnp.moveaxis(v_cache["scale"], 1, 2)[:, :, None, :]
    probs = probs.astype(q.dtype)
    out = jnp.einsum("bgrk,bkgd->bgrd", probs, vq.astype(q.dtype))
    return out.reshape(b, hq, d)


def window_attention(
    q: jnp.ndarray,
    k_cache,
    v_cache,
    lengths: jnp.ndarray,
) -> jnp.ndarray:
    """W-token window attention against a padded KV cache (chunked decode).

    Scores a short window of new tokens (speculative-decode verify pass or
    chunked prefill) in ONE pass over the cache — the cache and weights are
    read once per W tokens instead of once per token, which is the whole
    speedup of speculative decoding on a bandwidth-bound chip.

    q: [B, W, Hq, D] — queries for the window (window position i sits at
    absolute position lengths[b] + i, and its K/V must already be written to
    the cache at that row). k_cache/v_cache: [B, max_len, Hkv, D] or the
    int8 dict form (decode_attention docstring). lengths: [B] valid cache
    entries BEFORE the window. Returns [B, W, Hq, D].
    """
    k_quant = isinstance(k_cache, dict)
    v_quant = isinstance(v_cache, dict)
    kq = k_cache["q"] if k_quant else k_cache
    vq = v_cache["q"] if v_quant else v_cache
    b, max_len, hkv, d = kq.shape
    w, hq = q.shape[1], q.shape[2]
    n_rep = hq // hkv
    scale = d**-0.5
    qg = q.reshape(b, w, hkv, n_rep, d)
    logits = jnp.einsum(
        "bwgrd,bkgd->bgrwk", qg, kq.astype(q.dtype)
    ).astype(jnp.float32) * scale
    if k_quant:
        logits = logits * jnp.moveaxis(k_cache["scale"], 1, 2)[:, :, None, None, :]
    # query at window offset i may attend cache rows <= lengths + i
    pos = jnp.arange(max_len)[None, None, None, None, :]
    limit = (lengths[:, None] + jnp.arange(w)[None, :])[:, None, None, :, None]
    logits = jnp.where(pos <= limit, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    if v_quant:
        probs = probs * jnp.moveaxis(v_cache["scale"], 1, 2)[:, :, None, None, :]
    probs = probs.astype(q.dtype)
    out = jnp.einsum("bgrwk,bkgd->bwgrd", probs, vq.astype(q.dtype))
    return out.reshape(b, w, hq, d)
