"""Pallas flash attention (causal) — the TPU replacement for flash-attn 2.

Block-wise online-softmax attention: O(S) memory instead of the S×S score
matrix, MXU-tiled matmuls, fp32 accumulators. Forward is the Pallas kernel;
backward recomputes through the reference XLA attention (standard
recompute-VJP: residuals are just (q, k, v)).

Used by ops.attention.causal_attention on TPU for long sequences; on CPU
tests run the same kernel in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_q: int, block_k: int,
                  scale: float, causal: bool, kv_len: int):
    """Grid: (BH, num_q_blocks). q_ref: [block_q, D]; k/v_ref: [S, D]."""
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale  # [block_q, D]
    d = q.shape[-1]
    s_total = k_ref.shape[1]
    num_k_blocks = pl.cdiv(s_total, block_k)
    # causal: only blocks with start <= q block end participate
    if causal:
        last_block = jnp.minimum(
            ((qi + 1) * block_q + block_k - 1) // block_k, num_k_blocks
        )
    else:
        last_block = num_k_blocks

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        k_pos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        valid = k_pos < kv_len  # mask zero-padded keys
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            valid = valid & (q_pos >= k_pos)
        s = jnp.where(valid, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = alpha * acc + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, last_block, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_fwd_impl(q, k, v, *, block_q: int, block_k: int, causal: bool,
                    interpret: bool, kv_len: int | None = None):
    """q/k/v: [BH, S, D] -> out [BH, S, D]."""
    bh, s, d = q.shape
    scale = d**-0.5
    grid = (bh, pl.cdiv(s, block_q))
    kernel = functools.partial(
        _flash_kernel, block_q=block_q, block_k=block_k, scale=scale,
        causal=causal, kv_len=kv_len if kv_len is not None else s,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)


def _reference_attention(q, k, v, causal: bool):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqd,bkd->bqk", q, k).astype(jnp.float32) * scale
    if causal:
        s = q.shape[1]
        mask = jnp.tril(jnp.ones((s, s), dtype=bool))
        logits = jnp.where(mask[None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bqk,bkd->bqd", probs, v)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def _flash_attention_bh(q, k, v, block_q, block_k, causal, interpret, kv_len):
    return _flash_fwd_impl(q, k, v, block_q=block_q, block_k=block_k,
                           causal=causal, interpret=interpret, kv_len=kv_len)


def _fwd(q, k, v, block_q, block_k, causal, interpret, kv_len):
    out = _flash_fwd_impl(q, k, v, block_q=block_q, block_k=block_k,
                          causal=causal, interpret=interpret, kv_len=kv_len)
    return out, (q, k, v)


def _bwd(block_q, block_k, causal, interpret, kv_len, residuals, g):
    q, k, v = residuals
    s_pad = q.shape[1]
    _, vjp = jax.vjp(
        lambda qs, ks, vs: _reference_attention(qs, ks, vs, causal),
        q[:, :kv_len], k[:, :kv_len], v[:, :kv_len],
    )
    dq, dk, dv = vjp(g[:, :kv_len])

    def repad(x):
        return jnp.pad(x, ((0, 0), (0, s_pad - kv_len), (0, 0)))

    return repad(dq), repad(dk), repad(dv)


_flash_attention_bh.defvjp(_fwd, _bwd)


def _pad_to(x, multiple, axis):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg), n


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = True,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Causal flash attention with GQA broadcast.

    q: [B, S, Hq, D]; k, v: [B, S, Hkv, D] -> [B, S, Hq, D].
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    if hq != hkv:  # GQA: broadcast kv heads
        rep = hq // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    # [B, S, H, D] -> [B*H, S, D]
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * hq, s, d)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    block_q = min(block_q, max(16, s))
    block_k = min(block_k, max(16, s))
    qb, orig_s = _pad_to(qb, block_q, axis=1)
    kb, _ = _pad_to(kb, block_k, axis=1)
    vb, _ = _pad_to(vb, block_k, axis=1)
    # q/k must pad to a common length for the causal index math
    s_pad = max(qb.shape[1], kb.shape[1])
    qb, _ = _pad_to(qb, s_pad, axis=1)
    kb, _ = _pad_to(kb, s_pad, axis=1)
    vb, _ = _pad_to(vb, s_pad, axis=1)
    out = _flash_attention_bh(
        qb, kb, vb, block_q, block_k, causal, interpret, orig_s
    )
    out = out[:, :orig_s]
    return out.reshape(b, hq, orig_s, d).transpose(0, 2, 1, 3)
