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


def flash_decode_attention(
    q: jnp.ndarray,
    k_cache,
    v_cache,
    lengths: jnp.ndarray,
    *,
    layer=None,
    chunk: int = 256,
    alias_caches: bool = False,
    interpret: bool | None = None,
):
    """Contiguous-cache flash decode attention — grid (B,), static chunked
    double-buffered DMAs, block-diagonal dense matmuls (one [Hq, flat] x
    [flat, chunk] pair per chunk), online softmax entirely in VMEM.

    ``alias_caches=True``: the caches are ALSO returned, as input/output-
    aliased pallas outputs (kernel never writes them) — returns
    (out, k_cache, v_cache). Inside a decode layer scan this is REQUIRED
    for performance: a custom-call operand must be a materialized buffer,
    and without the alias XLA copies the whole (stacked) cache out of the
    scan carry for every layer (measured 240 ms/step at 1B serving shapes
    round 4); with it the carry threads through the kernel in place.

    Why it exists (measured, tools/probe_decode_variants.py round 4): the
    XLA decode path materializes the fp32 scores tensor in HBM between the
    QK^T and PV matmuls, so its cost scales ~5x the raw KV bytes with cache
    length (4.3 -> 12.1 ms/step from 192 -> 768 slots at 1B/B=64). This
    kernel streams K/V chunks HBM->VMEM once and writes only [B, Hq, D]
    back. Chunks beyond a sequence's length are never DMA'd (pl.when) —
    ragged serving pools read only live rows, rounded up to ``chunk``.

    q: [B, Hq, D]; caches: [B, T, Hkv, D] — or STACKED [L, B, T, Hkv, D]
    with ``layer`` a traced int32 scalar (a Pallas operand must be a
    materialized buffer, so inside a layer scan the stacked form avoids
    copying the per-layer slice out of the carry). Either cache may be the
    int8 dict {"q", "scale"} (scales folded like ops/attention.decode_
    attention). lengths: [B] valid entries incl. the just-written token.
    T must be divisible by 8; the chunk size adapts downward to divide T.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    k_quant = isinstance(k_cache, dict)
    kq = k_cache["q"] if k_quant else k_cache
    vq = v_cache["q"] if k_quant else v_cache
    k_scale = k_cache["scale"] if k_quant else None
    v_scale = v_cache["scale"] if k_quant else None
    stacked = layer is not None
    b, t, hkv, d = kq.shape[-4:]
    hq = q.shape[1]
    n_rep = hq // hkv
    flat = hkv * d
    c = min(chunk, t)
    while t % c:
        c //= 2
    if c < 8:
        raise ValueError(f"cache length {t} not tileable (chunk {chunk})")
    n_chunks = t // c
    lead = kq.shape[:-4]

    kq = kq.reshape(*lead, b, t, flat)
    vq = vq.reshape(*lead, b, t, flat)
    sc_w = 0
    if k_quant:
        sc_w = hkv if hkv % 128 == 0 else hkv + (-hkv) % 128
        pad = [(0, 0)] * (k_scale.ndim - 1) + [(0, sc_w - hkv)]
        k_scale = jnp.pad(k_scale, pad)
        v_scale = jnp.pad(v_scale, pad)

    # block-diagonal queries (see paged_attention.paged_decode_attention_
    # dense): Qbd[b, (h, r), (h2, col)] = q[b, h, r, col] iff h == h2
    qg = q.reshape(b, hkv, n_rep, d).astype(jnp.float32) * (d**-0.5)
    eye = jnp.eye(hkv, dtype=jnp.float32)
    qbd = (qg[:, :, :, None, :] * eye[:, None, :, None]).reshape(b, hq, flat)
    qbd = qbd.astype(q.dtype)

    n_cache_out = (4 if k_quant else 2) if alias_caches else 0

    def kernel(len_ref, *rest):
        if stacked:
            lyr_ref, *refs = rest
        else:
            lyr_ref, refs = None, list(rest)
        refs = list(refs)
        if k_quant:
            q_ref, k_hbm, ks_hbm, v_hbm, vs_hbm = refs[:5]
            o_ref = refs[5]
            scr = refs[6 + n_cache_out:]  # aliased cache outs never touched
            kbuf, vbuf, ksbuf, vsbuf, sem = scr
        else:
            q_ref, k_hbm, v_hbm = refs[:3]
            o_ref = refs[3]
            scr = refs[4 + n_cache_out:]
            kbuf, vbuf, sem = scr
            ks_hbm = vs_hbm = ksbuf = vsbuf = None
        i = pl.program_id(0)
        length = len_ref[i]
        nc = jnp.maximum((length + c - 1) // c, 1)  # live chunks

        def src(hbm, j):
            sl = pl.ds(j * c, c)
            return (hbm.at[lyr_ref[0], i, sl] if stacked
                    else hbm.at[i, sl])

        def start(j, slot):
            if j >= n_chunks:  # static: the last iteration prefetches j+1
                return

            @pl.when(j < nc)
            def _s(j=j, slot=slot):
                pltpu.make_async_copy(
                    src(k_hbm, j), kbuf.at[slot], sem.at[slot, 0]
                ).start()
                pltpu.make_async_copy(
                    src(v_hbm, j), vbuf.at[slot], sem.at[slot, 1]
                ).start()
                if k_quant:
                    pltpu.make_async_copy(
                        src(ks_hbm, j), ksbuf.at[slot], sem.at[slot, 2]
                    ).start()
                    pltpu.make_async_copy(
                        src(vs_hbm, j), vsbuf.at[slot], sem.at[slot, 3]
                    ).start()

        def wait(j, slot):
            @pl.when(j < nc)
            def _w(j=j, slot=slot):
                pltpu.make_async_copy(
                    src(k_hbm, j), kbuf.at[slot], sem.at[slot, 0]
                ).wait()
                pltpu.make_async_copy(
                    src(v_hbm, j), vbuf.at[slot], sem.at[slot, 1]
                ).wait()
                if k_quant:
                    pltpu.make_async_copy(
                        src(ks_hbm, j), ksbuf.at[slot], sem.at[slot, 2]
                    ).wait()
                    pltpu.make_async_copy(
                        src(vs_hbm, j), vsbuf.at[slot], sem.at[slot, 3]
                    ).wait()

        start(0, 0)
        qb = q_ref[0].astype(jnp.float32)  # [hq, flat] block-diagonal
        if k_quant:
            rows8 = jax.lax.broadcasted_iota(jnp.int32, (sc_w, flat), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (sc_w, flat), 1)
            expand = (cols // d == rows8).astype(jnp.float32)

        m = jnp.full((hq, 1), NEG_INF, jnp.float32)
        l = jnp.zeros((hq, 1), jnp.float32)
        acc = jnp.zeros((hq, flat), jnp.float32)

        for j in range(n_chunks):
            slot = j % 2

            @pl.when(j + 1 < nc)
            def _pre(j=j, slot=slot):
                start(j + 1, 1 - slot)

            wait(j, slot)

            live = j < nc
            base = j * c
            kk = kbuf[slot].astype(jnp.float32)  # [c, flat]
            vv = vbuf[slot].astype(jnp.float32)
            if k_quant:
                ks = jnp.dot(ksbuf[slot], expand,
                             preferred_element_type=jnp.float32)
                vs = jnp.dot(vsbuf[slot], expand,
                             preferred_element_type=jnp.float32)
                kk = kk * ks
                vv = vv * vs
            pos = base + jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
            ok = (pos < length) & live
            vv = jnp.where(ok, vv, 0.0)  # 0*NaN guard: never-DMA'd scratch
            s = jax.lax.dot_general(
                qb, kk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            k_ok = (base + jax.lax.broadcasted_iota(
                jnp.int32, (hq, c), 1) < length) & live
            s = jnp.where(k_ok, s, NEG_INF)  # [hq, c]
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            pexp = jnp.exp(s - m_new)
            m = m_new
            l = alpha * l + jnp.sum(pexp, axis=-1, keepdims=True)
            acc = alpha * acc + jnp.dot(
                pexp, vv, preferred_element_type=jnp.float32
            )

        norm = acc / jnp.maximum(l, 1e-30)  # [hq, flat]
        row_head = jax.lax.broadcasted_iota(jnp.int32, (hq, d), 0) // n_rep
        out = jnp.zeros((hq, d), jnp.float32)
        for h in range(hkv):
            out = out + jnp.where(
                row_head == h, norm[:, h * d:(h + 1) * d], 0.0
            )
        o_ref[0] = out.astype(o_ref.dtype)

    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    in_specs = [pl.BlockSpec((1, hq, flat), lambda i, *s: (i, 0, 0))]
    inputs = [qbd, kq]
    in_specs.append(hbm)
    if k_quant:
        in_specs.append(hbm)
        inputs.append(k_scale)
    in_specs.append(hbm)
    inputs.append(vq)
    if k_quant:
        in_specs.append(hbm)
        inputs.append(v_scale)

    scratch = [
        pltpu.VMEM((2, c, flat), kq.dtype),
        pltpu.VMEM((2, c, flat), vq.dtype),
    ]
    n_sems = 2
    if k_quant:
        scratch += [
            pltpu.VMEM((2, c, sc_w), k_scale.dtype),
            pltpu.VMEM((2, c, sc_w), v_scale.dtype),
        ]
        n_sems = 4
    scratch.append(pltpu.SemaphoreType.DMA((2, n_sems)))

    scalar_args = [lengths.astype(jnp.int32)]
    if stacked:
        scalar_args.append(jnp.asarray(layer, jnp.int32).reshape(1))
    out_shape = [jax.ShapeDtypeStruct((b, hq, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, hq, d), lambda i, *s: (i, 0, 0))]
    aliases = {}
    if alias_caches:
        # thread the caches through as untouched in/out-aliased operands so
        # a surrounding scan's carry is never copied for the custom call;
        # alias keys index the FULL input list incl. scalar-prefetch args
        base = len(scalar_args) + 1  # + qbd
        cache_ins = [kq] + ([k_scale] if k_quant else []) + [vq] + (
            [v_scale] if k_quant else []
        )
        for j, arr in enumerate(cache_ins):
            aliases[base + j] = 1 + j
            out_shape.append(jax.ShapeDtypeStruct(arr.shape, arr.dtype))
            out_specs.append(hbm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalar_args),
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs if alias_caches else out_specs[0],
        scratch_shapes=scratch,
    )
    results = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape if alias_caches else out_shape[0],
        input_output_aliases=aliases,
        interpret=interpret,
    )(*scalar_args, *inputs)
    if not alias_caches:
        return results
    out, *couts = results
    kd = (b, t, hkv, d)
    if k_quant:
        k_new = {"q": couts[0].reshape(*lead, *kd),
                 "scale": couts[1][..., :hkv]}
        v_new = {"q": couts[2].reshape(*lead, *kd),
                 "scale": couts[3][..., :hkv]}
    else:
        k_new = couts[0].reshape(*lead, *kd)
        v_new = couts[1].reshape(*lead, *kd)
    return out, k_new, v_new
