"""Pallas ragged decode attention — per-sequence-length KV attention.

The serving engine's decode step attends one new token per sequence against
a padded KV cache. The XLA path (ops/attention.decode_attention) reads the
FULL [max_len] cache for every sequence and masks; this kernel loops only
over each sequence's valid blocks (lengths[b]), so mixed short/long requests
in the continuous-batching pool don't pay for the longest reservation —
the "ragged paged attention" role of the reference's vLLM engine.

Grid: (B,). Each program handles one sequence: a static loop over kv heads
(GQA groups) around an online-softmax loop over KV blocks whose trip count
is dynamic in ``lengths[b]`` (scalar-prefetched, so the DMA pipeline sees it
before the body runs).

STATUS: numerics verified (interpreter-mode parity vs the XLA decode path,
incl. garbage-beyond-length isolation). On this environment's axon
remote-compiler the dynamic-trip-count fori_loop does not finish Mosaic
compilation in reasonable time, so llama.decode_step keeps the XLA path by
default; enable explicitly via ``ragged_decode_attention(...)`` on stacks
where Mosaic compiles it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def ragged_decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    block_k: int = 128,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """q: [B, Hq, D]; k/v_cache: [B, max_len, Hkv, D]; lengths: [B] valid
    entries (including the just-written token). Returns [B, Hq, D]."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, max_len, hkv, d = k_cache.shape
    hq = q.shape[1]
    n_rep = hq // hkv
    scale = d**-0.5
    pad = (-max_len) % block_k
    if pad:
        cfgp = ((0, 0), (0, pad), (0, 0), (0, 0))
        k_cache = jnp.pad(k_cache, cfgp)
        v_cache = jnp.pad(v_cache, cfgp)
        max_len += pad
    qg = q.reshape(b, hkv, n_rep, d)

    def kernel(len_ref, q_ref, k_ref, v_ref, o_ref):
        i = pl.program_id(0)
        length = len_ref[i]
        num_blocks = (length + block_k - 1) // block_k

        for h in range(hkv):  # static unroll over GQA groups
            qb = q_ref[0, h].astype(jnp.float32) * scale  # [n_rep, D]

            def body(j, carry):
                m, l, acc = carry
                k = k_ref[0, pl.ds(j * block_k, block_k), h, :].astype(
                    jnp.float32
                )
                v = v_ref[0, pl.ds(j * block_k, block_k), h, :].astype(
                    jnp.float32
                )
                s = jnp.dot(qb, k.T, preferred_element_type=jnp.float32)
                k_pos = j * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (n_rep, block_k), 1
                )
                s = jnp.where(k_pos < length, s, NEG_INF)
                m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(m - m_new)
                l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
                acc_new = alpha * acc + jnp.dot(
                    p, v, preferred_element_type=jnp.float32
                )
                return m_new, l_new, acc_new

            m0 = jnp.full((n_rep, 1), NEG_INF, jnp.float32)
            l0 = jnp.zeros((n_rep, 1), jnp.float32)
            acc0 = jnp.zeros((n_rep, d), jnp.float32)
            m, l, acc = jax.lax.fori_loop(0, num_blocks, body, (m0, l0, acc0))
            o_ref[0, h] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hkv, n_rep, d), lambda i, s: (i, 0, 0, 0)),
            pl.BlockSpec((1, max_len, hkv, d), lambda i, s: (i, 0, 0, 0)),
            pl.BlockSpec((1, max_len, hkv, d), lambda i, s: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hkv, n_rep, d), lambda i, s: (i, 0, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, n_rep, d), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qg, k_cache, v_cache)
    return out.reshape(b, hq, d)
