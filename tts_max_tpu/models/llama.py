"""Llama-architecture SpeechLM — functional JAX, scan-over-layers, GSPMD-ready.

TPU-native counterpart of the reference's HF ``AutoModelForCausalLM`` wrapper
(/root/reference/tts/core/modeling.py:15-55): same architecture family
(Llama 3.2 1B / 3.1 8B) with the vocabulary resized to the fixed 193856-token
speech vocab, but built as a pure-functional pytree model:

- parameters are stacked over layers (leading L dim) and traversed with
  ``lax.scan`` — O(1) compile time in depth, remat-friendly;
- compute in bf16 with fp32 params / fp32 softmax+norms;
- sharding is annotation-only (see parallel/sharding.py) — no FSDP wrappers.

Weight import from HF safetensors lives in models/hf_import.py.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tts_max_tpu.core.constants import FIXED_VOCAB_SIZE
from tts_max_tpu.ops.attention import (
    causal_attention,
    decode_attention,
    decode_attention_bucketed,
)
from tts_max_tpu.ops.norms import rms_norm
from tts_max_tpu.models.quantization import (
    embed_lookup,
    is_quantized,
    matmul,
    tied_logits,
)
from tts_max_tpu.ops.rope import apply_rope, rope_table

Params = Any  # nested dict pytree


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = FIXED_VOCAB_SIZE
    dim: int = 2048
    n_layers: int = 16
    n_heads: int = 32
    n_kv_heads: int = 8
    head_dim: int = 64
    ffn_dim: int = 8192
    norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    use_llama3_rope_scaling: bool = True
    max_seq_len: int = 2048
    tie_embeddings: bool = True
    dtype: Any = jnp.bfloat16  # compute dtype
    remat: bool = False
    # None = full-layer recompute (min memory); "dots" = save matmul outputs
    # and recompute only the cheap elementwise/softmax ops in backward
    # (jax.checkpoint_policies.dots_saveable) — more memory, fewer FLOPs.
    remat_policy: str | None = None

    @property
    def q_dim(self) -> int:
        return self.n_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.n_kv_heads * self.head_dim


def tiny_config(vocab_size: int = 512, max_seq_len: int = 256) -> LlamaConfig:
    """Small config for tests/CI (CPU-friendly)."""
    return LlamaConfig(
        vocab_size=vocab_size,
        dim=64,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,
        head_dim=16,
        ffn_dim=128,
        rope_theta=10000.0,
        use_llama3_rope_scaling=False,
        max_seq_len=max_seq_len,
        tie_embeddings=True,
    )


def llama32_1b_config(**over) -> LlamaConfig:
    """Llama-3.2-1B-Instruct geometry (reference sft.json model_name)."""
    return replace(
        LlamaConfig(
            vocab_size=FIXED_VOCAB_SIZE,
            dim=2048,
            n_layers=16,
            n_heads=32,
            n_kv_heads=8,
            head_dim=64,
            ffn_dim=8192,
            rope_theta=500000.0,
            use_llama3_rope_scaling=True,
            tie_embeddings=True,
        ),
        **over,
    )


def llama31_8b_config(**over) -> LlamaConfig:
    """Llama-3.1-8B-Instruct geometry (reference tokenization.py:7)."""
    return replace(
        LlamaConfig(
            vocab_size=FIXED_VOCAB_SIZE,
            dim=4096,
            n_layers=32,
            n_heads=32,
            n_kv_heads=8,
            head_dim=128,
            ffn_dim=14336,
            rope_theta=500000.0,
            use_llama3_rope_scaling=True,
            tie_embeddings=False,
        ),
        **over,
    )


ARCHITECTURES = {
    "llama-tiny": tiny_config,
    "llama-1b": llama32_1b_config,
    "llama-3.2-1b": llama32_1b_config,
    "llama-8b": llama31_8b_config,
    "llama-3.1-8b": llama31_8b_config,
}


def config_for_architecture(name: str, **over) -> LlamaConfig:
    if name not in ARCHITECTURES:
        raise ValueError(f"unknown architecture {name!r}; have {sorted(ARCHITECTURES)}")
    return ARCHITECTURES[name](**over)


# --- init -------------------------------------------------------------------


def init_params(rng: jax.Array, cfg: LlamaConfig, dtype=jnp.float32) -> Params:
    k_embed, k_layers, k_head = jax.random.split(rng, 3)

    def dense(key, shape, in_dim):
        return (jax.random.normal(key, shape) * (in_dim ** -0.5)).astype(dtype)

    L = cfg.n_layers
    lk = jax.random.split(k_layers, 7)
    layers = {
        "attn_norm": {"scale": jnp.ones((L, cfg.dim), dtype)},
        "mlp_norm": {"scale": jnp.ones((L, cfg.dim), dtype)},
        "attn": {
            "wq": {"kernel": dense(lk[0], (L, cfg.dim, cfg.q_dim), cfg.dim)},
            "wk": {"kernel": dense(lk[1], (L, cfg.dim, cfg.kv_dim), cfg.dim)},
            "wv": {"kernel": dense(lk[2], (L, cfg.dim, cfg.kv_dim), cfg.dim)},
            "wo": {"kernel": dense(lk[3], (L, cfg.q_dim, cfg.dim), cfg.q_dim)},
        },
        "mlp": {
            "w_gate": {"kernel": dense(lk[4], (L, cfg.dim, cfg.ffn_dim), cfg.dim)},
            "w_up": {"kernel": dense(lk[5], (L, cfg.dim, cfg.ffn_dim), cfg.dim)},
            "w_down": {"kernel": dense(lk[6], (L, cfg.ffn_dim, cfg.dim), cfg.ffn_dim)},
        },
    }
    params = {
        "embed": {
            "embedding": (
                jax.random.normal(k_embed, (cfg.vocab_size, cfg.dim)) * 0.02
            ).astype(dtype)
        },
        "layers": layers,
        "norm": {"scale": jnp.ones((cfg.dim,), dtype)},
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = {
            "kernel": dense(k_head, (cfg.dim, cfg.vocab_size), cfg.dim)
        }
    return params


def param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


# --- forward ----------------------------------------------------------------


def _attn_block(h, lp, cos, sin, cfg: LlamaConfig):
    b, s, _ = h.shape
    x = rms_norm(h, lp["attn_norm"]["scale"], cfg.norm_eps)
    q = (matmul(x, lp["attn"]["wq"]["kernel"])).reshape(
        b, s, cfg.n_heads, cfg.head_dim
    )
    k = (matmul(x, lp["attn"]["wk"]["kernel"])).reshape(
        b, s, cfg.n_kv_heads, cfg.head_dim
    )
    v = (matmul(x, lp["attn"]["wv"]["kernel"])).reshape(
        b, s, cfg.n_kv_heads, cfg.head_dim
    )
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    o = causal_attention(q, k, v)
    o = matmul(o.reshape(b, s, cfg.q_dim), lp["attn"]["wo"]["kernel"])
    return h + o, k, v


def _mlp_block(h, lp, cfg: LlamaConfig):
    x = rms_norm(h, lp["mlp_norm"]["scale"], cfg.norm_eps)
    gate = matmul(x, lp["mlp"]["w_gate"]["kernel"])
    up = matmul(x, lp["mlp"]["w_up"]["kernel"])
    return h + matmul(jax.nn.silu(gate) * up, lp["mlp"]["w_down"]["kernel"])


def _decoder_layer(h, lp, cos, sin, cfg: LlamaConfig):
    h, _, _ = _attn_block(h, lp, cos, sin, cfg)
    return _mlp_block(h, lp, cfg)


def _logits(h, params, cfg: LlamaConfig, logits_head=None):
    h = rms_norm(h, params["norm"]["scale"], cfg.norm_eps)
    if logits_head is not None:
        if cfg.tie_embeddings:
            return tied_logits(h, logits_head)
        return matmul(h, logits_head).astype(jnp.float32)
    if cfg.tie_embeddings:
        return tied_logits(h, params["embed"]["embedding"])
    return matmul(h, params["lm_head"]["kernel"]).astype(jnp.float32)


def slice_logits_head(params: Params, cfg: LlamaConfig, lo: int, size: int):
    """Output-head rows [lo, lo+size) for window-constrained decode.

    During speech generation only the speech-token block (+ the structural
    markers right after it — SpeechVocab.generation_window) is a legal
    output, so the LM head only needs those rows: at the 193856-token vocab
    this cuts the per-step head read (and the [B, V] logits/penalty-count
    traffic) ~3x on the bandwidth-bound decode. Returns the head in the form
    ``_logits(..., logits_head=...)`` expects: embedding-row form when tied,
    kernel-column form otherwise (plain or ``{"q", "scale"}`` quantized).
    """
    if cfg.tie_embeddings:
        emb = params["embed"]["embedding"]
        if is_quantized(emb):
            # vocab rows are never the packed axis, so slicing axis 0 works
            # for int8 ("q") and nibble-packed int4 ("q4") alike
            return {
                k: jax.lax.slice_in_dim(v, lo, lo + size, axis=0)
                for k, v in emb.items()
            }
        return jax.lax.slice_in_dim(emb, lo, lo + size, axis=0)
    k = params["lm_head"]["kernel"]
    if is_quantized(k):
        out = {}
        for key, v in k.items():
            a, b = lo, lo + size
            if key == "q4":  # [D, V/2]: vocab pairs packed along last axis
                if lo % 2 or size % 2:
                    raise ValueError(
                        "int4 lm_head window bounds must be even"
                    )
                a, b = lo // 2, (lo + size) // 2
            out[key] = jax.lax.slice_in_dim(v, a, b, axis=v.ndim - 1)
        return out
    return jax.lax.slice_in_dim(k, lo, lo + size, axis=k.ndim - 1)


def forward_hidden(
    params: Params, cfg: LlamaConfig, tokens: jnp.ndarray
) -> jnp.ndarray:
    """Causal forward through the layer stack only: tokens [B, S] -> PRE-norm
    hidden states [B, S, D]. Callers apply ``_logits`` (which owns the final
    rms_norm + head) — or, for training, a chunked loss that never
    materializes the full [B, S, vocab] logits (train_step.py)."""
    cos, sin = rope_table(
        cfg.head_dim, tokens.shape[1], cfg.rope_theta, cfg.use_llama3_rope_scaling
    )
    h = embed_lookup(params["embed"]["embedding"], tokens, cfg.dtype)

    def layer_fn(carry, lp):
        return _decoder_layer(carry, lp, cos, sin, cfg), None

    if cfg.remat:
        policy = (
            jax.checkpoint_policies.dots_saveable
            if cfg.remat_policy == "dots" else None
        )
        layer_fn = jax.checkpoint(layer_fn, prevent_cse=False, policy=policy)
    h, _ = jax.lax.scan(layer_fn, h, params["layers"])
    return h


def forward(params: Params, cfg: LlamaConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """Full-sequence causal forward: tokens [B, S] -> logits [B, S, V] (fp32)."""
    return _logits(forward_hidden(params, cfg, tokens), params, cfg)


# --- KV-cached generation ---------------------------------------------------


def init_kv_cache(
    cfg: LlamaConfig, batch: int, max_len: int, dtype=None, *, quantized: bool = False
):
    """Padded KV cache. ``quantized=True`` stores int8 payloads with
    per-(layer, slot, token, head) fp32 scales — half the HBM read of bf16
    per decode step, which dominates step time at serving context lengths
    (the decode loop is bandwidth-bound, BENCHMARKS.md)."""
    dtype = dtype or cfg.dtype
    shape = (cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim)
    if quantized:
        # k and v MUST be independent arrays: a shallow dict copy would make
        # them share buffers, and the engine's donated decode dispatch then
        # dies with "attempt to donate the same buffer twice" on a
        # freshly-initialized (never-prefilled) cache
        def entry():
            return {
                "q": jnp.zeros(shape, jnp.int8),
                "scale": jnp.zeros(shape[:-1], jnp.float32),
            }

        return {"k": entry(), "v": entry()}
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def cache_is_quantized(cache) -> bool:
    return isinstance(cache["k"], dict)


def cache_max_len(cache) -> int:
    return (cache["k"]["q"] if cache_is_quantized(cache) else cache["k"]).shape[2]


def _quantize_kv(x: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """Per-(…, head) symmetric int8 over the feature dim."""
    from tts_max_tpu.models.quantization import quantize_tensor

    return quantize_tensor(x, axis=x.ndim - 1)


def grow_cache(cache, new_len: int):
    """Zero-pad the token axis (axis 2 for every leaf) to ``new_len``.

    For staged-cache generation: decode early tokens against a small cache,
    growing it only when occupancy requires."""
    old_len = cache_max_len(cache)
    if new_len < old_len:
        raise ValueError(f"cannot shrink cache {old_len} -> {new_len}")
    if new_len == old_len:
        return cache
    pad = new_len - old_len

    def leaf(x):
        widths = [(0, 0)] * x.ndim
        widths[2] = (0, pad)
        return jnp.pad(x, widths)

    return jax.tree.map(leaf, cache)


def update_cache_slice(cache, small, layer0: int, slot, pos0: int):
    """Scatter a small cache block (same structure) into the pool at
    (layer0, slot, pos0) — the engine's per-slot prefill write."""

    def leaf(big, little):
        start = (layer0, slot, pos0) + (0,) * (big.ndim - 3)
        return jax.lax.dynamic_update_slice(big, little.astype(big.dtype), start)

    return jax.tree.map(leaf, cache, small)


def init_paged_kv_cache(
    cfg: LlamaConfig,
    num_blocks: int,
    block_size: int,
    dtype=None,
    *,
    quantized: bool = False,
):
    """Block-pool KV cache for paged serving (vLLM-style): leaves
    [L, num_blocks, block_size, Hkv, D]; sequences own ordered block-id lists
    (the engine's block table) instead of contiguous max_len reservations."""
    dtype = dtype or cfg.dtype
    shape = (cfg.n_layers, num_blocks, block_size, cfg.n_kv_heads, cfg.head_dim)
    if quantized:
        # independent k/v arrays — see init_kv_cache (donation aliasing)
        def entry():
            return {
                "q": jnp.zeros(shape, jnp.int8),
                "scale": jnp.zeros(shape[:-1], jnp.float32),
            }

        return {"k": entry(), "v": entry()}
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def paged_block_size(cache) -> int:
    return (cache["k"]["q"] if cache_is_quantized(cache) else cache["k"]).shape[2]


def gather_blocks_to_cache(pool, block_ids):
    """Gather ordered pool blocks into a contiguous batch-1 cache
    [L, 1, len(block_ids)*block_size, ...] — the inverse of
    :func:`scatter_prefill_to_blocks`. Used by prefix-cached admission to
    rebuild the shared-prefix KV context for a suffix prefill."""

    def leaf(big):
        g = big[:, block_ids]  # [L, m, bs, ...]
        return g.reshape(g.shape[0], 1, -1, *g.shape[3:])

    return jax.tree.map(leaf, pool)


def scatter_suffix_to_blocks(pool, small, block_ids, start: int):
    """Scatter the region [start, start + len(block_ids)*bs) of a contiguous
    batch-1 cache (leaves [L, 1, S, ...]) into pool blocks ``block_ids``.
    ``start`` must be block-aligned."""

    def leaf(big, little):
        bs = big.shape[2]
        lit = little[:, 0, start : start + block_ids.shape[0] * bs]
        resh = lit.reshape(
            lit.shape[0], block_ids.shape[0], bs, *lit.shape[2:]
        )
        return big.at[:, block_ids].set(resh.astype(big.dtype))

    return jax.tree.map(leaf, pool, small)


def scatter_prefill_to_blocks(pool, small, block_ids):
    """Scatter a contiguous batch-1 prefill cache (leaves [L, 1, S, ...])
    into pool blocks ``block_ids`` ([S // block_size] int32)."""

    def leaf(big, little):
        bs = big.shape[2]
        lit = little[:, 0]  # [L, S, ...]
        p = lit.shape[1] // bs
        resh = lit.reshape(lit.shape[0], p, bs, *lit.shape[2:])
        return big.at[:, block_ids].set(resh.astype(big.dtype))

    return jax.tree.map(leaf, pool, small)


def prefill(
    params: Params,
    cfg: LlamaConfig,
    tokens: jnp.ndarray,
    lengths: jnp.ndarray,
    cache,
    logits_head=None,
):
    """Process right-padded prompts [B, S]; fill cache[:, :, :S]; return
    (last-real-token logits [B, V], cache). With ``logits_head`` (a
    slice_logits_head result) logits cover only that window [B, size].

    Padded key/value slots within [real_len, S) are later overwritten by
    decode_step (which writes at index ``lengths``), so they are never
    attended to.
    """
    b, s = tokens.shape
    cos, sin = rope_table(
        cfg.head_dim, s, cfg.rope_theta, cfg.use_llama3_rope_scaling
    )
    h = embed_lookup(params["embed"]["embedding"], tokens, cfg.dtype)

    def layer_fn(carry, lp):
        h, = carry
        h, k, v = _attn_block(h, lp, cos, sin, cfg)
        h = _mlp_block(h, lp, cfg)
        return (h,), (k, v)

    (h,), (ks, vs) = jax.lax.scan(layer_fn, (h,), params["layers"])
    if cache_is_quantized(cache):
        small = {"k": _quantize_kv(ks), "v": _quantize_kv(vs)}
    else:
        small = {"k": ks, "v": vs}
    cache = update_cache_slice(cache, small, 0, 0, 0)
    # gather the last real hidden state BEFORE the head matmul: the [B, S, V]
    # logits tensor (6.3 GB fp32 at B=128, S=64) is never materialized
    h_last = jnp.take_along_axis(h, (lengths - 1)[:, None, None], axis=1)
    last = _logits(h_last, params, cfg, logits_head)[:, 0]
    return last, cache


def decode_step(
    params: Params,
    cfg: LlamaConfig,
    cache,
    tokens: jnp.ndarray,
    lengths: jnp.ndarray,
    logits_head=None,
    *,
    unroll: bool = False,
    flash: bool | None = None,
    skip_write: bool = False,
    prewrite: bool | None = None,
):
    """One AR decode step.

    ``skip_write=True`` is an ABLATION ONLY: the new token's K/V rows are
    not written (attention output is wrong for them), isolating the cache
    scatter's cost from the attention read.

    ``prewrite``: attend against the PRE-write cache plus an explicit
    new-token softmax column (ops/attention.decode_attention_prewrite —
    mathematically the post-write attention), so the K/V scatter's output
    feeds only the carry and XLA can update the cache in place instead of
    copying it per layer. None = the TTS_MAX_PREWRITE_ATTN env var.

    tokens: [B] new token ids; lengths: [B] valid cache entries BEFORE this
    token (also its position index). Returns (logits [B, V], new cache);
    caller increments lengths. ``logits_head`` (slice_logits_head) restricts
    logits to a vocab window [B, size].

    ``unroll=True`` replaces the lax.scan over layers with a Python loop:
    each layer's cache slice/scatter then uses a STATIC layer index, which
    XLA can fuse/alias instead of potentially materializing a per-layer
    copy of the [B, T, Hkv, D] cache slice (the scan's dynamic layer index
    defeats that). MEASURED round 4: identical to the scan at 1B serving
    shapes — XLA fuses the dynamic slice fine; kept for ablations.

    ``flash``: use the Pallas flash decode-attention kernel
    (ops/pallas_decode.flash_decode_attention — stacked-cache form, online
    softmax in VMEM) instead of the XLA attention, whose HBM-materialized
    fp32 scores make decode cost scale ~5x the raw KV bytes with cache
    length (probe_decode_variants, round 4). None = the
    TTS_MAX_FLASH_DECODE env var ("1"/"0"), default off pending on-chip
    verification.
    """
    import os

    if flash is None:
        flash = os.environ.get("TTS_MAX_FLASH_DECODE", "0") == "1"
    if prewrite is None:
        prewrite = os.environ.get("TTS_MAX_PREWRITE_ATTN", "0") == "1"
    b = tokens.shape[0]
    cos, sin = rope_table(
        cfg.head_dim, cache_max_len(cache), cfg.rope_theta, cfg.use_llama3_rope_scaling
    )
    h = embed_lookup(params["embed"]["embedding"], tokens, cfg.dtype)  # [B, D]
    pos_cos = jnp.take(cos, lengths, axis=0)[:, None, :]  # [B, 1, hd/2]
    pos_sin = jnp.take(sin, lengths, axis=0)[:, None, :]
    batch_idx = jnp.arange(b)

    def rope1(x):  # x: [B, H, D] single position
        xf = x.astype(jnp.float32)
        half = xf.shape[-1] // 2
        x1, x2 = xf[..., :half], xf[..., half:]
        out = jnp.concatenate(
            [x1 * pos_cos - x2 * pos_sin, x2 * pos_cos + x1 * pos_sin], axis=-1
        )
        return out.astype(x.dtype)

    def layer_body(h, k_all, v_all, lp, layer):
        # The FULL stacked cache rides the carry (not scan xs/ys): the new
        # token's row is scattered in place and only the current layer is
        # sliced for attention. With cache as xs/ys every step would COPY
        # the whole cache (read xs + write ys) on top of the attention read
        # — 3x the HBM traffic of this formulation. ``layer`` may be a
        # traced scalar (scan) or a Python int (unrolled).
        x = rms_norm(h, lp["attn_norm"]["scale"], cfg.norm_eps)
        q = (matmul(x, lp["attn"]["wq"]["kernel"])).reshape(
            b, cfg.n_heads, cfg.head_dim
        )
        k = (matmul(x, lp["attn"]["wk"]["kernel"])).reshape(
            b, cfg.n_kv_heads, cfg.head_dim
        )
        v = (matmul(x, lp["attn"]["wv"]["kernel"])).reshape(
            b, cfg.n_kv_heads, cfg.head_dim
        )
        q, k = rope1(q), rope1(k)

        def write(cache_entry, x):
            if isinstance(cache_entry, dict):  # int8 KV: quantize on write
                xq = _quantize_kv(x)
                return {
                    "q": cache_entry["q"]
                    .at[layer, batch_idx, lengths]
                    .set(xq["q"]),
                    "scale": cache_entry["scale"]
                    .at[layer, batch_idx, lengths]
                    .set(xq["scale"]),
                }
            return cache_entry.at[layer, batch_idx, lengths].set(
                x.astype(cache_entry.dtype)
            )

        def layer_slice(cache_entry):
            take = lambda c: jax.lax.dynamic_index_in_dim(
                c, layer, 0, keepdims=False
            )
            if isinstance(cache_entry, dict):
                return {"q": take(cache_entry["q"]),
                        "scale": take(cache_entry["scale"])}
            return take(cache_entry)

        if prewrite and not skip_write:
            from tts_max_tpu.ops.attention import decode_attention_prewrite

            o = decode_attention_prewrite(
                q, layer_slice(k_all), layer_slice(v_all), lengths, k, v
            ).astype(h.dtype)
            k_all = write(k_all, k)
            v_all = write(v_all, v)
        else:
            if not skip_write:
                k_all = write(k_all, k)
                v_all = write(v_all, v)
            if flash:
                from tts_max_tpu.ops.pallas_decode import (
                    flash_decode_attention,
                )

                # stacked + cache-aliased form: the kernel scalar-prefetches
                # the layer index and the carry threads through the custom
                # call as in/out-aliased operands (still copied by this
                # platform's XLA — kept for ablations)
                o, k_all, v_all = flash_decode_attention(
                    q, k_all, v_all, lengths + 1, layer=layer,
                    alias_caches=True,
                )
                o = o.astype(h.dtype)
            else:
                o = decode_attention(
                    q, layer_slice(k_all), layer_slice(v_all), lengths + 1
                ).astype(h.dtype)
        h = h + matmul(o.reshape(b, cfg.q_dim), lp["attn"]["wo"]["kernel"])
        h = _mlp_block(h[:, None, :], lp, cfg)[:, 0]
        return h, k_all, v_all

    if unroll:
        ks, vs = cache["k"], cache["v"]
        for i in range(cfg.n_layers):
            lp = jax.tree.map(lambda x: x[i], params["layers"])
            h, ks, vs = layer_body(h, ks, vs, lp, i)
    else:
        def layer_fn(carry, scanned):
            lp, layer = scanned
            return layer_body(*carry, lp, layer), None

        (h, ks, vs), _ = jax.lax.scan(
            layer_fn,
            (h, cache["k"], cache["v"]),
            (params["layers"], jnp.arange(cfg.n_layers)),
        )
    logits = _logits(h[:, None, :], params, cfg, logits_head)[:, 0]
    return logits, {"k": ks, "v": vs}


def init_delta(cfg: LlamaConfig, batch: int, k: int, dtype=None):
    """In-dispatch K/V delta buffer: {"k","v"} [L, B, K, Hkv, D] (always
    full-precision — quantization happens at commit_delta)."""
    dtype = dtype or cfg.dtype
    shape = (cfg.n_layers, batch, k, cfg.n_kv_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def decode_step_delta(
    params: Params,
    cfg: LlamaConfig,
    read_cache,
    delta,
    tokens: jnp.ndarray,
    lengths: jnp.ndarray,
    base_lengths: jnp.ndarray,
    delta_mask: jnp.ndarray,
    step_j,
    logits_head=None,
):
    """One AR decode step in DELTA form: the big cache is never written —
    the new token's K/V land in row ``step_j`` of the small delta buffer
    and attention runs jointly over cache[:base_lengths] + masked delta
    (ops/attention.decode_attention_delta). Returns (logits, new delta).

    Why: the conventional write-then-attend step makes XLA copy the whole
    scan-carried cache every step (round-4 ablation: the scatter cost
    2.5x the attention read at 768 slots). Here the dispatch's K-step scan
    carries only the [L, B, K, Hkv, D] delta; ``commit_delta`` scatters it
    into the cache ONCE per dispatch.

    lengths: [B] absolute position of the new token (rope); delta_mask:
    [B, K] valid delta rows INCLUDING this step's row.
    """
    from tts_max_tpu.ops.attention import decode_attention_delta

    b = tokens.shape[0]
    cos, sin = rope_table(
        cfg.head_dim, cache_max_len(read_cache), cfg.rope_theta,
        cfg.use_llama3_rope_scaling,
    )
    h = embed_lookup(params["embed"]["embedding"], tokens, cfg.dtype)
    pos_cos = jnp.take(cos, lengths, axis=0)[:, None, :]
    pos_sin = jnp.take(sin, lengths, axis=0)[:, None, :]

    def rope1(x):
        xf = x.astype(jnp.float32)
        half = xf.shape[-1] // 2
        x1, x2 = xf[..., :half], xf[..., half:]
        out = jnp.concatenate(
            [x1 * pos_cos - x2 * pos_sin, x2 * pos_cos + x1 * pos_sin],
            axis=-1,
        )
        return out.astype(x.dtype)

    def layer_body(h, dk, dv, lp, layer):
        x = rms_norm(h, lp["attn_norm"]["scale"], cfg.norm_eps)
        q = matmul(x, lp["attn"]["wq"]["kernel"]).reshape(
            b, cfg.n_heads, cfg.head_dim
        )
        k = matmul(x, lp["attn"]["wk"]["kernel"]).reshape(
            b, cfg.n_kv_heads, cfg.head_dim
        )
        v = matmul(x, lp["attn"]["wv"]["kernel"]).reshape(
            b, cfg.n_kv_heads, cfg.head_dim
        )
        q, k = rope1(q), rope1(k)
        dk = dk.at[layer, :, step_j].set(k.astype(dk.dtype))
        dv = dv.at[layer, :, step_j].set(v.astype(dv.dtype))

        def sl(c):
            take = lambda x_: jax.lax.dynamic_index_in_dim(
                x_, layer, 0, keepdims=False
            )
            if isinstance(c, dict):
                return {"q": take(c["q"]), "scale": take(c["scale"])}
            return take(c)

        o = decode_attention_delta(
            q, sl(read_cache["k"]), sl(read_cache["v"]), base_lengths,
            jax.lax.dynamic_index_in_dim(dk, layer, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(dv, layer, 0, keepdims=False),
            delta_mask,
        ).astype(h.dtype)
        h = h + matmul(o.reshape(b, cfg.q_dim), lp["attn"]["wo"]["kernel"])
        h = _mlp_block(h[:, None, :], lp, cfg)[:, 0]
        return h, dk, dv

    def layer_fn(carry, scanned):
        lp, layer = scanned
        return layer_body(*carry, lp, layer), None

    (h, dk, dv), _ = jax.lax.scan(
        layer_fn,
        (h, delta["k"], delta["v"]),
        (params["layers"], jnp.arange(cfg.n_layers)),
    )
    logits = _logits(h[:, None, :], params, cfg, logits_head)[:, 0]
    return logits, {"k": dk, "v": dv}


def commit_delta(cache, delta, base_lengths: jnp.ndarray):
    """Scatter a dispatch's delta rows into the cache: delta row j of slot
    b lands at position base_lengths[b] + j (clamped to the cache length —
    rows past a slot's final length belong to finished/idle slots whose
    region is dead until re-prefill, so the clamped garbage is harmless;
    active slots' rows are all valid by the stage-margin invariant).
    Quantizes per-row when the cache is int8."""
    kk = delta["k"].shape[2]
    t = cache_max_len(cache)
    b = base_lengths.shape[0]
    pos = jnp.clip(
        base_lengths[:, None] + jnp.arange(kk)[None, :], 0, t - 1
    )  # [B, K]
    rows = jnp.arange(b)[:, None]

    def leaf(big, little):
        # big [L, B, T, ...]; little [L, B, K, ...]
        if isinstance(big, dict):
            lq = _quantize_kv(little)
            return {
                "q": big["q"].at[:, rows, pos].set(lq["q"]),
                "scale": big["scale"].at[:, rows, pos].set(lq["scale"]),
            }
        return big.at[:, rows, pos].set(little.astype(big.dtype))

    return {
        "k": leaf(cache["k"], delta["k"]),
        "v": leaf(cache["v"], delta["v"]),
    }


def gather_paged_read_cache(cache, table):
    """Materialize a paged pool's per-slot span as a contiguous READ-ONLY
    cache: pool leaves [L, N, bs, ...] + block table [B, W] -> [L, B, W*bs,
    ...]. One fused gather per K-step dispatch turns paged delta-KV decode
    into exactly the contiguous delta path (decode_step_delta) — the round-4
    fix for the paged engine's per-step pool copy: per-layer gathers inside
    the decode scan re-read the table every step, while this dispatch-level
    gather costs ~2 stage-sized copies amortized over K steps. Shared
    prefix-cache blocks are duplicated per referencing row (reads only)."""

    def leaf(x):
        g = jnp.take(x, table, axis=1)  # [L, B, W, bs, ...]
        return g.reshape(
            x.shape[0], table.shape[0], table.shape[1] * x.shape[2],
            *x.shape[3:]
        )

    def entry(e):
        if isinstance(e, dict):
            return {"q": leaf(e["q"]), "scale": leaf(e["scale"])}
        return leaf(e)

    return {"k": entry(cache["k"]), "v": entry(cache["v"])}


def commit_delta_paged(cache, delta, base_lengths: jnp.ndarray,
                       table: jnp.ndarray):
    """Scatter a dispatch's delta rows into a paged pool through the block
    table: delta row j of slot b lands at block ``table[b, (base+j)//bs]``
    offset ``(base+j) % bs``. Same dead-row invariants as the per-step paged
    write (engine _guard_lengths): active slots stay inside the stage-sliced
    table by the dispatch margin; rows past a finished slot's allocation
    route through table entry 0 = the reserved sink block, and the clamped
    table edge only ever lands in the slot's own dead generated region
    (prefix-cache hashes cover full PROMPT blocks only, which commits can
    never reach: positions are >= prompt_len). Quantizes per-row when the
    pool is int8."""
    bs = paged_block_size(cache)
    kk = delta["k"].shape[2]
    w = table.shape[1]
    pos = base_lengths[:, None] + jnp.arange(kk)[None, :]  # [B, K]
    blk = jnp.take_along_axis(
        table, jnp.clip(pos // bs, 0, w - 1), axis=1
    )  # [B, K]
    offs = pos % bs

    def leaf(big, little):
        # big [L, N, bs, ...]; little [L, B, K, ...]
        if isinstance(big, dict):
            lq = _quantize_kv(little)
            return {
                "q": big["q"].at[:, blk, offs].set(lq["q"]),
                "scale": big["scale"].at[:, blk, offs].set(lq["scale"]),
            }
        return big.at[:, blk, offs].set(little.astype(big.dtype))

    return {
        "k": leaf(cache["k"], delta["k"]),
        "v": leaf(cache["v"], delta["v"]),
    }


def decode_window(
    params: Params,
    cfg: LlamaConfig,
    cache,
    tokens: jnp.ndarray,
    lengths: jnp.ndarray,
    logits_head=None,
):
    """Chunked decode: process a W-token window in ONE forward.

    tokens: [B, W] at absolute positions lengths..lengths+W-1; their K/V are
    written into the cache and each window position attends the cache up to
    and including itself. Returns (logits [B, W, V] fp32, new cache).

    This is the speculative-decode verify pass (and a chunked-prefill
    primitive): weights and cache are read once per W tokens instead of once
    per token — the entire win on a bandwidth-bound decode chip.
    """
    from tts_max_tpu.ops.attention import window_attention

    b, w = tokens.shape
    cos, sin = rope_table(
        cfg.head_dim, cache_max_len(cache), cfg.rope_theta,
        cfg.use_llama3_rope_scaling,
    )
    h = embed_lookup(params["embed"]["embedding"], tokens, cfg.dtype)  # [B,W,D]
    pos = lengths[:, None] + jnp.arange(w)[None, :]  # [B, W]
    pos_cos = jnp.take(cos, pos, axis=0)[:, :, None, :]  # [B, W, 1, hd/2]
    pos_sin = jnp.take(sin, pos, axis=0)[:, :, None, :]
    batch_rows = jnp.arange(b)[:, None]

    def rope_w(x):  # x: [B, W, H, D]
        xf = x.astype(jnp.float32)
        half = xf.shape[-1] // 2
        x1, x2 = xf[..., :half], xf[..., half:]
        out = jnp.concatenate(
            [x1 * pos_cos - x2 * pos_sin, x2 * pos_cos + x1 * pos_sin], axis=-1
        )
        return out.astype(x.dtype)

    def layer_fn(carry, scanned):
        h, k_all, v_all = carry
        lp, layer = scanned
        x = rms_norm(h, lp["attn_norm"]["scale"], cfg.norm_eps)
        q = matmul(x, lp["attn"]["wq"]["kernel"]).reshape(
            b, w, cfg.n_heads, cfg.head_dim
        )
        k = matmul(x, lp["attn"]["wk"]["kernel"]).reshape(
            b, w, cfg.n_kv_heads, cfg.head_dim
        )
        v = matmul(x, lp["attn"]["wv"]["kernel"]).reshape(
            b, w, cfg.n_kv_heads, cfg.head_dim
        )
        q, k = rope_w(q), rope_w(k)

        def write(cache_entry, x):
            if isinstance(cache_entry, dict):
                xq = _quantize_kv(x)
                return {
                    "q": cache_entry["q"].at[layer, batch_rows, pos].set(xq["q"]),
                    "scale": cache_entry["scale"]
                    .at[layer, batch_rows, pos]
                    .set(xq["scale"]),
                }
            return cache_entry.at[layer, batch_rows, pos].set(
                x.astype(cache_entry.dtype)
            )

        def layer_slice(cache_entry):
            take = lambda c: jax.lax.dynamic_index_in_dim(
                c, layer, 0, keepdims=False
            )
            if isinstance(cache_entry, dict):
                return {"q": take(cache_entry["q"]),
                        "scale": take(cache_entry["scale"])}
            return take(cache_entry)

        k_all = write(k_all, k)
        v_all = write(v_all, v)
        o = window_attention(
            q, layer_slice(k_all), layer_slice(v_all), lengths
        ).astype(h.dtype)
        h = h + matmul(o.reshape(b, w, cfg.q_dim), lp["attn"]["wo"]["kernel"])
        h = _mlp_block(h, lp, cfg)
        return (h, k_all, v_all), None

    (h, ks, vs), _ = jax.lax.scan(
        layer_fn,
        (h, cache["k"], cache["v"]),
        (params["layers"], jnp.arange(cfg.n_layers)),
    )
    logits = _logits(h, params, cfg, logits_head)
    return logits, {"k": ks, "v": vs}


def decode_step_paged(
    params: Params,
    cfg: LlamaConfig,
    cache,
    tokens: jnp.ndarray,
    lengths: jnp.ndarray,
    table: jnp.ndarray,
    *,
    use_pallas: bool | None = None,
    logits_head=None,
):
    """One AR decode step against a paged (block-pool) cache.

    Mirrors :func:`decode_step` but the new token's K/V rows are scattered
    into ``table[b, lengths[b] // block_size]`` and attention reads KV
    through the block table (ops/paged_attention.py). table: [B, P] int32
    (unallocated entries must be valid ids, e.g. 0 — masked by lengths).
    """
    import os

    from tts_max_tpu.ops import paged_attention as pattn

    variant = os.environ.get("TTS_MAX_PAGED_ATTN", "")
    if use_pallas is False and variant not in ("", "xla"):
        # an explicit use_pallas=False (the TP-mesh engine path: Pallas
        # kernels do not SPMD-partition) must win over the env-var override
        variant = "xla"
    if not variant:
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        # dense block-diagonal kernel: per-head flash matmuls ([n_rep, d] x
        # [d, bs]) are <1% MXU utilization and cost 20-32 ms/step at 1B
        # batch-64 serving shapes in both the grid and manual-DMA variants;
        # the dense variant computes MXU-shaped [hq, flat] products per
        # multi-page group. NOTE: dense2 (stacked pool + scalar-prefetched
        # layer) measured CATASTROPHICALLY slow in the layer scan even with
        # in/out aliasing — this platform's XLA materializes a copy of the
        # full stacked pool per layer for the custom call (178-508 ms/step,
        # round 4) — so the sliced dense kernel stays the TPU default.
        variant = "dense" if use_pallas else "xla"
    attn_fn = {
        "dense": pattn.paged_decode_attention_dense,
        "dense2": None,  # stacked: handled inline in layer_fn
        "dma": pattn.paged_decode_attention_dma,
        "grid": pattn.paged_decode_attention,
        "xla": pattn.paged_decode_attention_xla,
    }[variant]
    b = tokens.shape[0]
    bs = paged_block_size(cache)
    max_pos = table.shape[1] * bs
    cos, sin = rope_table(
        cfg.head_dim, max_pos, cfg.rope_theta, cfg.use_llama3_rope_scaling
    )
    h = embed_lookup(params["embed"]["embedding"], tokens, cfg.dtype)  # [B, D]
    pos_cos = jnp.take(cos, lengths, axis=0)[:, None, :]
    pos_sin = jnp.take(sin, lengths, axis=0)[:, None, :]
    blk = jnp.take_along_axis(table, (lengths // bs)[:, None], axis=1)[:, 0]
    offs = lengths % bs

    def rope1(x):
        xf = x.astype(jnp.float32)
        half = xf.shape[-1] // 2
        x1, x2 = xf[..., :half], xf[..., half:]
        out = jnp.concatenate(
            [x1 * pos_cos - x2 * pos_sin, x2 * pos_cos + x1 * pos_sin], axis=-1
        )
        return out.astype(x.dtype)

    def layer_fn(carry, scanned):
        # full pool rides the carry (in-place scatter), as in decode_step
        h, k_all, v_all = carry
        lp, layer = scanned
        x = rms_norm(h, lp["attn_norm"]["scale"], cfg.norm_eps)
        q = (matmul(x, lp["attn"]["wq"]["kernel"])).reshape(
            b, cfg.n_heads, cfg.head_dim
        )
        k = (matmul(x, lp["attn"]["wk"]["kernel"])).reshape(
            b, cfg.n_kv_heads, cfg.head_dim
        )
        v = (matmul(x, lp["attn"]["wv"]["kernel"])).reshape(
            b, cfg.n_kv_heads, cfg.head_dim
        )
        q, k = rope1(q), rope1(k)

        def write(cache_entry, x):
            if isinstance(cache_entry, dict):
                xq = _quantize_kv(x)
                return {
                    "q": cache_entry["q"].at[layer, blk, offs].set(xq["q"]),
                    "scale": cache_entry["scale"]
                    .at[layer, blk, offs]
                    .set(xq["scale"]),
                }
            return cache_entry.at[layer, blk, offs].set(
                x.astype(cache_entry.dtype)
            )

        def layer_slice(cache_entry):
            take = lambda c: jax.lax.dynamic_index_in_dim(
                c, layer, 0, keepdims=False
            )
            if isinstance(cache_entry, dict):
                return {"q": take(cache_entry["q"]),
                        "scale": take(cache_entry["scale"])}
            return take(cache_entry)

        k_all = write(k_all, k)
        v_all = write(v_all, v)
        if variant == "dense2":
            o, k_all, v_all = pattn.paged_decode_attention_dense(
                q, k_all, v_all, table, lengths + 1, layer=layer,
                alias_caches=True,
            )
            o = o.astype(h.dtype)
        else:
            o = attn_fn(
                q, layer_slice(k_all), layer_slice(v_all), table, lengths + 1
            ).astype(h.dtype)
        h = h + matmul(o.reshape(b, cfg.q_dim), lp["attn"]["wo"]["kernel"])
        h = _mlp_block(h[:, None, :], lp, cfg)[:, 0]
        return (h, k_all, v_all), None

    (h, ks, vs), _ = jax.lax.scan(
        layer_fn,
        (h, cache["k"], cache["v"]),
        (params["layers"], jnp.arange(cfg.n_layers)),
    )
    logits = _logits(h[:, None, :], params, cfg, logits_head)[:, 0]
    return logits, {"k": ks, "v": vs}
