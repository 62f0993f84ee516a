"""On-device token sampling with the reference sampler surface
(/root/reference/tts/inference/inferencing.py:15-40): temperature, top-k,
top-p, repetition penalty (HF convention), frequency penalty (vLLM/OpenAI
convention). Everything is static-shape and jit-safe; token-count state rides
in a [B, V] buffer updated per step.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplingParams:
    """Defaults mirror reference InferenceSettings (inferencing.py:15-40)."""

    temperature: float = 0.8
    top_k: int = 50
    top_p: float = 1.0
    repetition_penalty: float = 1.1
    frequency_penalty: float = 0.3
    max_new_tokens: int = 1792


_OVERRIDE_KEYS = ("temperature", "top_k", "top_p", "repetition_penalty",
                  "frequency_penalty")


def sampling_from_overrides(
    overrides: dict, default: SamplingParams
) -> SamplingParams | None:
    """Per-request SamplingParams from a dict of optional overrides (the
    serving CLIs' JSONL/JSON request surface). None when nothing overrides."""
    if not any(k in overrides for k in _OVERRIDE_KEYS):
        return None
    return SamplingParams(**{
        **{k: getattr(default, k) for k in _OVERRIDE_KEYS},
        **{k: overrides[k] for k in _OVERRIDE_KEYS if k in overrides},
    })


def apply_repetition_penalty(
    logits: jnp.ndarray, token_counts: jnp.ndarray, penalty: float
) -> jnp.ndarray:
    """HF-style repetition penalty: for any token already seen (count > 0),
    positive logits are divided by ``penalty`` and negative multiplied."""
    if penalty == 1.0:
        return logits
    seen = token_counts > 0
    scaled = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, scaled, logits)


def apply_frequency_penalty(
    logits: jnp.ndarray, gen_counts: jnp.ndarray, penalty: float
) -> jnp.ndarray:
    """OpenAI/vLLM-style: logits -= penalty * count(token in generation)."""
    if penalty == 0.0:
        return logits
    return logits - penalty * gen_counts.astype(logits.dtype)


def top_k_mask(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the k largest logits per row, -inf elsewhere. k<=0 disables.

    Uses an exact two-stage reduction for large vocabularies: a direct
    ``lax.top_k`` over the 193856-token speech vocab costs ~2 ms/decode-step
    on a v5e; grouping the vocab into 128-wide tiles, taking the top-k tiles
    by max, and running top_k over those k·128 candidates is exact (any
    global top-k element's tile max ranks in the top-k tile maxes) and ~10x
    cheaper.
    """
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = _kth_value(logits, k)
    return jnp.where(logits < kth, -jnp.inf, logits)


_GROUP = 128


def _kth_value(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-th largest value per row [..., 1]."""
    return _top_values(logits, k)[..., -1:]


def top_p_mask(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering: keep the smallest set of tokens with cumulative
    probability >= p (the top token always survives)."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # number of tokens to keep per row: first index where cum >= p, inclusive
    keep_sorted = cum - probs < p
    # threshold = smallest logit kept
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < thresh, -jnp.inf, logits)


def adjusted_logits(
    logits: jnp.ndarray,
    params: SamplingParams,
    token_counts: jnp.ndarray | None = None,
    gen_counts: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Penalty/temperature/top-k/top-p-adjusted fp32 logits, ready for
    ``jax.random.categorical`` (greedy callers argmax them instead)."""
    logits = logits.astype(jnp.float32)
    if token_counts is not None:
        logits = apply_repetition_penalty(
            logits, token_counts, params.repetition_penalty
        )
    if gen_counts is not None:
        logits = apply_frequency_penalty(logits, gen_counts, params.frequency_penalty)
    if params.temperature <= 0.0:
        return logits
    logits = logits / params.temperature
    logits = top_k_mask(logits, params.top_k)
    return top_p_mask(logits, params.top_p)


def sample_token(
    rng: jax.Array,
    logits: jnp.ndarray,
    params: SamplingParams,
    token_counts: jnp.ndarray | None = None,
    gen_counts: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Sample next token ids [B] from logits [B, V] with all penalties.

    ``token_counts``: counts over prompt+generation (repetition penalty).
    ``gen_counts``: counts over generation only (frequency penalty).
    """
    logits = adjusted_logits(logits, params, token_counts, gen_counts)
    if params.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1)
    return jax.random.categorical(rng, logits, axis=-1)


def sampling_distribution(
    logits: jnp.ndarray,
    params: SamplingParams,
    token_counts: jnp.ndarray | None = None,
    gen_counts: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """The exact [B, V] probability distribution ``sample_token`` draws from
    (one-hot argmax when temperature <= 0) — the p/q of speculative
    decoding's accept/reject arithmetic."""
    al = adjusted_logits(logits, params, token_counts, gen_counts)
    if params.temperature <= 0.0:
        return jax.nn.one_hot(
            jnp.argmax(al, axis=-1), al.shape[-1], dtype=jnp.float32
        )
    return jax.nn.softmax(al, axis=-1)


def update_counts(counts: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
    """counts: [B, V] += one-hot(tokens [B]) — scatter-add, static shape."""
    b = counts.shape[0]
    return counts.at[jnp.arange(b), tokens].add(1)


# --- per-row (batched) sampling params --------------------------------------
# vLLM-style per-request sampling: every row of the batch carries its own
# temperature / top-k / top-p / penalties (the reference delegates this to
# vLLM's per-request SamplingParams; the engine stores one row per slot).


@dataclass(frozen=True)
class BatchedSamplingParams:
    """[B]-shaped device arrays, one row per sequence. ``max_top_k`` is the
    STATIC bound for the top-k reduction (per-row k clamps to it)."""

    temperature: jnp.ndarray  # [B] f32; <= 0 means greedy for that row
    top_k: jnp.ndarray  # [B] i32; <= 0 disables
    top_p: jnp.ndarray  # [B] f32; >= 1 disables
    repetition_penalty: jnp.ndarray  # [B] f32; 1.0 disables
    frequency_penalty: jnp.ndarray  # [B] f32; 0.0 disables
    max_top_k: int = 64
    # STATIC: whether any row uses nucleus filtering. When False the [B, V]
    # sort is compiled out entirely (flipping it re-jits the decode step —
    # once per engine lifetime, on the first top_p request).
    use_top_p: bool = False

    @staticmethod
    def broadcast(sp: SamplingParams, batch: int, max_top_k: int | None = None):
        full = lambda v, dt: jnp.full((batch,), v, dtype=dt)
        return BatchedSamplingParams(
            temperature=full(sp.temperature, jnp.float32),
            top_k=full(sp.top_k, jnp.int32),
            top_p=full(sp.top_p, jnp.float32),
            repetition_penalty=full(sp.repetition_penalty, jnp.float32),
            frequency_penalty=full(sp.frequency_penalty, jnp.float32),
            max_top_k=max_top_k or max(sp.top_k, 1),
            use_top_p=sp.top_p < 1.0,
        )

    def set_row(self, i: int, sp: SamplingParams):
        """Functionally replace row ``i`` (host-side slot admission)."""
        return BatchedSamplingParams(
            temperature=self.temperature.at[i].set(sp.temperature),
            top_k=self.top_k.at[i].set(sp.top_k),
            top_p=self.top_p.at[i].set(sp.top_p),
            repetition_penalty=self.repetition_penalty.at[i].set(
                sp.repetition_penalty
            ),
            frequency_penalty=self.frequency_penalty.at[i].set(
                sp.frequency_penalty
            ),
            max_top_k=self.max_top_k,
            use_top_p=self.use_top_p or sp.top_p < 1.0,
        )


jax.tree_util.register_dataclass(
    BatchedSamplingParams,
    data_fields=[
        "temperature", "top_k", "top_p", "repetition_penalty",
        "frequency_penalty",
    ],
    meta_fields=["max_top_k", "use_top_p"],
)


def _top_values(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact k largest values per row, sorted desc [..., k] — two-stage over
    large vocabularies (see top_k_mask)."""
    v = logits.shape[-1]
    k = min(k, v)
    num_groups = (v + _GROUP - 1) // _GROUP
    if k > _GROUP or k > num_groups or v <= 4 * _GROUP:
        return jax.lax.top_k(logits, k)[0]
    pad = (-v) % _GROUP
    if pad:
        logits = jnp.pad(logits, [(0, 0)] * (logits.ndim - 1) + [(0, pad)],
                         constant_values=-jnp.inf)
    g = logits.reshape(*logits.shape[:-1], -1, _GROUP)
    group_max = jnp.max(g, axis=-1)
    _, top_groups = jax.lax.top_k(group_max, k)
    candidates = jnp.take_along_axis(g, top_groups[..., None], axis=-2)
    candidates = candidates.reshape(*logits.shape[:-1], k * _GROUP)
    return jax.lax.top_k(candidates, k)[0]


def top_k_mask_rowwise(
    logits: jnp.ndarray, k: jnp.ndarray, max_top_k: int
) -> jnp.ndarray:
    """Per-row top-k: row b keeps its k[b] largest logits (k[b] <= 0
    disables; k[b] clamps to the static ``max_top_k``)."""
    max_top_k = min(max_top_k, logits.shape[-1])
    kk = jnp.clip(k, 1, max_top_k)
    vals = _top_values(logits, max_top_k)
    kth = jnp.take_along_axis(vals, (kk - 1)[:, None], axis=-1)  # [B, 1]
    masked = jnp.where(logits < kth, -jnp.inf, logits)
    return jnp.where((k > 0)[:, None], masked, logits)


def top_p_mask_rowwise(logits: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = cum - probs < p[:, None]
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    masked = jnp.where(logits < thresh, -jnp.inf, logits)
    return jnp.where((p < 1.0)[:, None], masked, logits)


def adjusted_logits_batched(
    logits: jnp.ndarray,
    bsp: BatchedSamplingParams,
    token_counts: jnp.ndarray | None = None,
    gen_counts: jnp.ndarray | None = None,
) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    if token_counts is not None:
        pen = bsp.repetition_penalty[:, None]
        seen = token_counts > 0
        scaled = jnp.where(logits > 0, logits / pen, logits * pen)
        logits = jnp.where(seen, scaled, logits)
    if gen_counts is not None:
        logits = logits - bsp.frequency_penalty[:, None] * gen_counts.astype(
            logits.dtype
        )
    t = jnp.maximum(bsp.temperature, 1e-6)[:, None]
    scaled = logits / t
    scaled = top_k_mask_rowwise(scaled, bsp.top_k, bsp.max_top_k)
    if bsp.use_top_p:  # static: the [B, V] sort compiles out when unused
        scaled = top_p_mask_rowwise(scaled, bsp.top_p)
    return jnp.where((bsp.temperature <= 0.0)[:, None], logits, scaled)


def sample_token_batched(
    rngs: jax.Array,
    logits: jnp.ndarray,
    bsp: BatchedSamplingParams,
    token_counts: jnp.ndarray | None = None,
    gen_counts: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-row parameterized sampling with PER-ROW keys ``rngs`` [B, 2]:
    greedy rows (temperature <= 0) take argmax of the penalty-adjusted
    logits; the rest sample via the gumbel trick (categorical ==
    argmax(logits + gumbel)), so each row's random stream is independent of
    the rest of the batch (continuous-batching slot isolation)."""
    al = adjusted_logits_batched(logits, bsp, token_counts, gen_counts)
    noise = jax.vmap(lambda k: jax.random.gumbel(k, (al.shape[-1],), al.dtype))(
        rngs
    )
    return jnp.where(
        bsp.temperature <= 0.0,
        jnp.argmax(al, axis=-1),
        jnp.argmax(al + noise, axis=-1),
    )


def counts_from_tokens(tokens: jnp.ndarray, mask: jnp.ndarray, vocab: int) -> jnp.ndarray:
    """Build [B, V] counts from a [B, S] token matrix with validity mask."""
    b, s = tokens.shape
    counts = jnp.zeros((b, vocab), dtype=jnp.int32)
    return counts.at[
        jnp.repeat(jnp.arange(b), s), tokens.reshape(-1)
    ].add(mask.reshape(-1).astype(jnp.int32))


def counts_from_tokens_windowed(
    tokens: jnp.ndarray, mask: jnp.ndarray, window: tuple[int, int]
) -> jnp.ndarray:
    """[B, size] counts in vocab-window space: global ids outside
    [lo, lo+size) are dropped (they can never be re-generated under a
    window-constrained sampler, so penalties ignore them exactly)."""
    lo, size = window
    w = tokens - lo
    m = mask & (w >= 0) & (w < size)
    return counts_from_tokens(jnp.clip(w, 0, size - 1), m, size)
