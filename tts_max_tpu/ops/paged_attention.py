"""Paged decode attention over a block-pool KV cache (vLLM-style paging).

The reference serves through vLLM, whose CUDA paged-attention kernel reads
each sequence's KV through a block table so cache memory is allocated in
fixed-size blocks instead of a contiguous max_len reservation per slot
(reference inferencing.py:75-92). This is the TPU-native equivalent:

- the cache is a pool ``[num_blocks, block_size, Hkv, D]`` per layer;
- each sequence owns an ordered list of block ids (``table [B, P]``);
- the Pallas kernel runs on grid ``(B, P)`` with the block table and lengths
  scalar-prefetched, so the BlockSpec index map routes each grid step's DMA
  straight to that sequence's j-th block — no gather materialization;
- grid steps past a sequence's last valid block re-map to its last block:
  consecutive identical indices skip the DMA (Pallas revisiting), so short
  sequences don't stream the whole table width;
- int8 KV pools (``{"q", "scale"}`` leaves, models/llama.py:240-255) are
  dequantized inside the kernel — the int8 payload is what crosses HBM.

``paged_decode_attention_xla`` is the gather-based XLA fallback (used on CPU
and as the parity oracle in tests). Both accept identical arguments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _split(cache):
    if isinstance(cache, dict):
        return cache["q"], cache["scale"]
    return cache, None


def paged_decode_attention_xla(q, k_pool, v_pool, table, lengths):
    """Gather-based reference path. q: [B, Hq, D]; k/v_pool:
    [N, bs, Hkv, D] (or int8 dict with scale [N, bs, Hkv]); table: [B, P]
    int32 block ids (unallocated entries must still be valid ids, e.g. 0);
    lengths: [B] valid tokens (including the just-written one)."""
    from tts_max_tpu.ops.attention import decode_attention

    def gather(pool):
        kq, scale = _split(pool)
        b, p = table.shape
        bs = kq.shape[1]
        flat = jnp.take(kq, table, axis=0)  # [B, P, bs, Hkv, D]
        flat = flat.reshape(b, p * bs, *kq.shape[2:])
        if scale is None:
            return flat
        sflat = jnp.take(scale, table, axis=0).reshape(b, p * bs, scale.shape[-1])
        return {"q": flat, "scale": sflat}

    return decode_attention(q, gather(k_pool), gather(v_pool), lengths)


def paged_decode_attention_dma(
    q: jnp.ndarray,
    k_pool,
    v_pool,
    table: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Manual-DMA paged decode attention: grid ``(B,)`` with double-buffered
    async page copies.

    The BlockSpec-grid kernel below iterates a ``(B, P)`` grid — at serving
    shapes (B=64, P=12) that is 768 sequential grid steps of ~μs-scale work
    PER LAYER, and grid-step overhead (not bandwidth) dominates the decode
    step (~20 ms/step measured at 1B/B=64 vs ~5 ms contiguous). Here the
    grid is one program per sequence; each program walks its own block list
    with ``pltpu.make_async_copy`` (pool stays in HBM/ANY, pages land in a
    2-deep VMEM buffer), overlapping page ``j+1``'s DMA with page ``j``'s
    flash accumulation. Trip count is the STATIC table width; past-the-end
    pages are predicated off with ``pl.when`` (this platform's remote Mosaic
    stalls on dynamic trip counts). int8 KV pools ({"q","scale"}) are
    dequantized in-VMEM after the int8 payload crosses HBM."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kq_pool, k_scale = _split(k_pool)
    vq_pool, v_scale = _split(v_pool)
    n_blocks, bs, hkv, d = kq_pool.shape
    b, p = table.shape
    hq = q.shape[1]
    n_rep = hq // hkv
    scale = d**-0.5
    qg = q.reshape(b, hkv, n_rep, d)
    quantized = k_scale is not None

    # Manual ref.at[blk] slices require the last two dims to be
    # (8, 128)-tile aligned (unlike BlockSpec blocks, which may equal the
    # array dims — head_dim 64 fails Mosaic's memref_slice). Merge (hkv, d)
    # into one 128-aligned minor dim (free: contiguous reinterpret) and
    # lane-pad the per-token-per-head scales.
    flat = hkv * d
    kq_pool = kq_pool.reshape(n_blocks, bs, flat)
    vq_pool = vq_pool.reshape(n_blocks, bs, flat)
    sc_w = 0
    if quantized:
        sc_w = hkv if hkv % 128 == 0 else hkv + (-hkv) % 128
        k_scale = jnp.pad(k_scale, ((0, 0), (0, 0), (0, sc_w - hkv)))
        v_scale = jnp.pad(v_scale, ((0, 0), (0, 0), (0, sc_w - hkv)))

    def kernel(len_ref, tbl_ref, *refs):
        if quantized:
            (q_ref, k_hbm, ks_hbm, v_hbm, vs_hbm, o_ref,
             kbuf, vbuf, ksbuf, vsbuf, sem) = refs
        else:
            q_ref, k_hbm, v_hbm, o_ref, kbuf, vbuf, sem = refs
            ks_hbm = vs_hbm = ksbuf = vsbuf = None
        i = pl.program_id(0)
        length = len_ref[i]
        nb = jnp.maximum((length + bs - 1) // bs, 1)

        def start(j, slot):
            blk = tbl_ref[i, j]
            pltpu.make_async_copy(
                k_hbm.at[blk], kbuf.at[slot], sem.at[slot, 0]
            ).start()
            pltpu.make_async_copy(
                v_hbm.at[blk], vbuf.at[slot], sem.at[slot, 1]
            ).start()
            if quantized:
                pltpu.make_async_copy(
                    ks_hbm.at[blk], ksbuf.at[slot], sem.at[slot, 2]
                ).start()
                pltpu.make_async_copy(
                    vs_hbm.at[blk], vsbuf.at[slot], sem.at[slot, 3]
                ).start()

        def wait(j, slot):
            blk = tbl_ref[i, j]
            pltpu.make_async_copy(
                k_hbm.at[blk], kbuf.at[slot], sem.at[slot, 0]
            ).wait()
            pltpu.make_async_copy(
                v_hbm.at[blk], vbuf.at[slot], sem.at[slot, 1]
            ).wait()
            if quantized:
                pltpu.make_async_copy(
                    ks_hbm.at[blk], ksbuf.at[slot], sem.at[slot, 2]
                ).wait()
                pltpu.make_async_copy(
                    vs_hbm.at[blk], vsbuf.at[slot], sem.at[slot, 3]
                ).wait()

        @pl.when(0 < nb)
        def _p0():
            start(0, 0)

        # flash state in f32 registers via carried values is not expressible
        # across pl.when bodies; keep per-head m/l/acc in small VMEM scratch
        # is avoided — instead accumulate in python-level unrolled loop with
        # masked contributions per page, carried through fori-free statics.
        m = [jnp.full((n_rep, 1), NEG_INF, jnp.float32) for _ in range(hkv)]
        l = [jnp.zeros((n_rep, 1), jnp.float32) for _ in range(hkv)]
        acc = [jnp.zeros((n_rep, d), jnp.float32) for _ in range(hkv)]

        for j in range(p):
            slot = j % 2

            @pl.when(j + 1 < nb)
            def _pre(j=j, slot=slot):
                start(j + 1, 1 - slot)

            @pl.when(j < nb)
            def _w(j=j, slot=slot):
                wait(j, slot)

            live = j < nb
            base = j * bs
            k_pos = base + jax.lax.broadcasted_iota(jnp.int32, (n_rep, bs), 1)
            valid = (k_pos < length) & live
            # rows past the valid region may hold garbage (uninitialized
            # scratch for never-DMA'd pages); pexp is 0 there but 0*NaN=NaN,
            # so v must be zeroed, not just down-weighted
            v_ok = (base + jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0)
                    < length) & live
            kk = kbuf[slot]  # [bs, hkv*d]; heads are 64-lane chunks
            vv = vbuf[slot]
            for h in range(hkv):
                qb = q_ref[0, h].astype(jnp.float32) * scale  # [n_rep, D]
                k = kk[:, h * d:(h + 1) * d].astype(jnp.float32)  # [bs, D]
                v = vv[:, h * d:(h + 1) * d].astype(jnp.float32)
                if quantized:
                    k = k * ksbuf[slot, :, h][:, None]
                    v = v * vsbuf[slot, :, h][:, None]
                v = jnp.where(v_ok, v, 0.0)
                s = jnp.dot(qb, k.T, preferred_element_type=jnp.float32)
                s = jnp.where(valid, s, NEG_INF)
                m_new = jnp.maximum(m[h], jnp.max(s, axis=-1, keepdims=True))
                alpha = jnp.exp(m[h] - m_new)
                pexp = jnp.exp(s - m_new)
                m[h] = m_new
                l[h] = alpha * l[h] + jnp.sum(pexp, axis=-1, keepdims=True)
                acc[h] = alpha * acc[h] + jnp.dot(
                    pexp, v, preferred_element_type=jnp.float32
                )

        out = jnp.stack(
            [acc[h] / jnp.maximum(l[h], 1e-30) for h in range(hkv)]
        )  # [hkv, n_rep, d]
        o_ref[0] = out.astype(o_ref.dtype)

    # pin the pool to HBM: under ANY, Mosaic may place it in VMEM,
    # where .at[blk] memref slices must align to the (8,128) tile
    # (d=64 lanes fails); HBM->VMEM DMAs have no such constraint
    any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    in_specs = [pl.BlockSpec((1, hkv, n_rep, d), lambda i, *s: (i, 0, 0, 0))]
    inputs = [qg, kq_pool]
    in_specs.append(any_spec)
    if quantized:
        in_specs.append(any_spec)
        inputs.append(k_scale)
    in_specs.append(any_spec)
    inputs.append(vq_pool)
    if quantized:
        in_specs.append(any_spec)
        inputs.append(v_scale)

    scratch = [
        pltpu.VMEM((2, bs, flat), kq_pool.dtype),
        pltpu.VMEM((2, bs, flat), vq_pool.dtype),
    ]
    n_sems = 2
    if quantized:
        scratch += [
            pltpu.VMEM((2, bs, sc_w), k_scale.dtype),
            pltpu.VMEM((2, bs, sc_w), v_scale.dtype),
        ]
        n_sems = 4
    scratch.append(pltpu.SemaphoreType.DMA((2, n_sems)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hkv, n_rep, d), lambda i, *s: (i, 0, 0, 0)),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, n_rep, d), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), table.astype(jnp.int32), *inputs)
    return out.reshape(b, hq, d)


def paged_decode_attention_dense(
    q: jnp.ndarray,
    k_pool,
    v_pool,
    table: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    layer=None,
    pages_per_block: int = 4,
    alias_caches: bool = False,
    interpret: bool | None = None,
):
    """Dense block-diagonal paged decode attention (the fast TPU variant).

    Measurement drove this design: the per-head flash kernels (grid or
    manual-DMA) spend their time in [n_rep, d] x [d, bs] matmuls — at GQA
    serving shapes (n_rep 4, d 64) that is <1% MXU utilization, and B x P x
    hkv x layers of them cost ~20-32 ms/decode step at 1B batch 64. Here
    every (sequence, page-group) step runs ONE dense matmul pair instead:

      scores  = Qbd @ K_grp.T   [hq, U*bs]    Qbd [hq, hkv*d] block-diagonal
      acc    += P_grp @ V_grp   [hq, hkv*d]   (flash-rescaled online)

    Qbd places each query head's d-slice in its kv-head's column block, so
    the dense product computes exactly the per-head scores (off-head terms
    multiply zeros; ~hkv x redundant FLOPs, but MXU-shaped). The epilogue
    extracts each head's [n_rep, d] diagonal block of acc/l. Page groups of
    ``pages_per_block`` are double-buffered via manual DMAs (grid (B,),
    static trip counts, predicated tails). int8 KV dequantizes in-VMEM via
    a [U*bs, hkv] @ E (E[h, h*d+c] = 1) scale-expansion matmul.

    ``layer`` (traced int32 scalar): the pools are the FULL STACKED caches
    [L, N, bs, Hkv, D] and the kernel DMAs pages of layer ``layer`` via a
    scalar-prefetched index. A Pallas operand must be a materialized buffer,
    so a per-layer ``pool[layer]`` slice fed to the layer-sliced form forces
    XLA to copy [N, bs, Hkv, D] out of the scan carry EVERY layer — the
    stacked form reads the pages straight out of the stacked pool instead.
    STACKED REQUIRES ``alias_caches=True`` in a scan: without the in/out
    alias XLA copies the whole stacked pool per layer instead (measured
    240 ms/step at 1B serving shapes, round 4 — worse than the slice).

    ``alias_caches=True`` additionally returns (k_pool, v_pool) as
    input/output-aliased pallas outputs the kernel never writes, so a
    surrounding scan's carry threads through the custom call in place:
    returns (out, k_pool, v_pool).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kq_pool, k_scale = _split(k_pool)
    vq_pool, v_scale = _split(v_pool)
    stacked = layer is not None
    n_blocks, bs, hkv, d = kq_pool.shape[1:] if stacked else kq_pool.shape
    b, p = table.shape
    hq = q.shape[1]
    n_rep = hq // hkv
    quantized = k_scale is not None
    u = min(pages_per_block, p)
    n_grp = -(-p // u)
    flat = hkv * d

    # pools reinterpreted with one 128-aligned minor dim (see _dma docstring)
    lead = kq_pool.shape[:-4]
    kq_pool = kq_pool.reshape(*lead, n_blocks, bs, flat)
    vq_pool = vq_pool.reshape(*lead, n_blocks, bs, flat)
    sc_w = 0
    if quantized:
        sc_w = hkv if hkv % 128 == 0 else hkv + (-hkv) % 128
        pad = [(0, 0)] * (k_scale.ndim - 1) + [(0, sc_w - hkv)]
        k_scale = jnp.pad(k_scale, pad)
        v_scale = jnp.pad(v_scale, pad)

    # block-diagonal queries: Qbd[b, (h, r), (h2, c)] = q[b, h, r, c] if
    # h == h2 else 0 (includes the 1/sqrt(d) scale)
    qg = q.reshape(b, hkv, n_rep, d).astype(jnp.float32) * (d**-0.5)
    eye = jnp.eye(hkv, dtype=jnp.float32)
    qbd = (qg[:, :, :, None, :] * eye[:, None, :, None]).reshape(b, hq, flat)
    qbd = qbd.astype(q.dtype)

    n_cache_out = (4 if quantized else 2) if alias_caches else 0

    def kernel(len_ref, tbl_ref, *rest):
        if stacked:
            lyr_ref, *refs = rest
        else:
            lyr_ref, refs = None, list(rest)
        refs = list(refs)
        if quantized:
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
        nb = jnp.maximum((length + bs - 1) // bs, 1)  # live pages
        ng = (nb + u - 1) // u  # live groups

        def src(hbm, blk):
            # stacked pools: pages of the scalar-prefetched layer
            return hbm.at[lyr_ref[0], blk] if stacked else hbm.at[blk]

        def start(g, slot):
            for uu in range(u):  # per-page copies into the group buffer
                pg = g * u + uu

                @pl.when(pg < nb)
                def _cp(pg=pg, uu=uu, slot=slot):
                    blk = tbl_ref[i, pg]
                    pltpu.make_async_copy(
                        src(k_hbm, blk),
                        kbuf.at[slot, pl.ds(uu * bs, bs)],
                        sem.at[slot, 0],
                    ).start()
                    pltpu.make_async_copy(
                        src(v_hbm, blk),
                        vbuf.at[slot, pl.ds(uu * bs, bs)],
                        sem.at[slot, 1],
                    ).start()
                    if quantized:
                        pltpu.make_async_copy(
                            src(ks_hbm, blk),
                            ksbuf.at[slot, pl.ds(uu * bs, bs)],
                            sem.at[slot, 2],
                        ).start()
                        pltpu.make_async_copy(
                            src(vs_hbm, blk),
                            vsbuf.at[slot, pl.ds(uu * bs, bs)],
                            sem.at[slot, 3],
                        ).start()

        def wait(g, slot):
            # one wait per started copy (semaphores count)
            for uu in range(u):
                pg = g * u + uu

                @pl.when(pg < nb)
                def _wt(pg=pg, uu=uu, slot=slot):
                    blk = tbl_ref[i, pg]
                    pltpu.make_async_copy(
                        src(k_hbm, blk),
                        kbuf.at[slot, pl.ds(uu * bs, bs)],
                        sem.at[slot, 0],
                    ).wait()
                    pltpu.make_async_copy(
                        src(v_hbm, blk),
                        vbuf.at[slot, pl.ds(uu * bs, bs)],
                        sem.at[slot, 1],
                    ).wait()
                    if quantized:
                        pltpu.make_async_copy(
                            src(ks_hbm, blk),
                            ksbuf.at[slot, pl.ds(uu * bs, bs)],
                            sem.at[slot, 2],
                        ).wait()
                        pltpu.make_async_copy(
                            src(vs_hbm, blk),
                            vsbuf.at[slot, pl.ds(uu * bs, bs)],
                            sem.at[slot, 3],
                        ).wait()

        start(0, 0)

        qb = q_ref[0].astype(jnp.float32)  # [hq, flat] block-diagonal
        if quantized:
            # E[h, h*d + c] = 1 (rows >= hkv stay 0 and kill the lane pad):
            # [U*bs, sc_w] @ E -> per-lane scale expansion, no sub-128 slices
            rows8 = jax.lax.broadcasted_iota(jnp.int32, (sc_w, flat), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (sc_w, flat), 1)
            expand = (cols // d == rows8).astype(jnp.float32)

        m = jnp.full((hq, 1), NEG_INF, jnp.float32)
        l = jnp.zeros((hq, 1), jnp.float32)
        acc = jnp.zeros((hq, flat), jnp.float32)

        for g in range(n_grp):
            slot = g % 2

            @pl.when(g + 1 < ng)
            def _pre(g=g, slot=slot):
                start(g + 1, 1 - slot)

            wait(g, slot)

            live = g < ng
            base = g * u * bs
            kk = kbuf[slot].astype(jnp.float32)  # [U*bs, flat]
            vv = vbuf[slot].astype(jnp.float32)
            if quantized:
                ks = jnp.dot(ksbuf[slot], expand,
                             preferred_element_type=jnp.float32)
                vs = jnp.dot(vsbuf[slot], expand,
                             preferred_element_type=jnp.float32)
                kk = kk * ks
                vv = vv * vs
            pos = base + jax.lax.broadcasted_iota(
                jnp.int32, (u * bs, 1), 0
            )
            ok = (pos < length) & live
            vv = jnp.where(ok, vv, 0.0)  # 0*NaN guard for never-DMA'd rows
            # contract the flat dims directly (a materialized kk.T is an
            # unsupported tpu.transpose)
            s = jax.lax.dot_general(
                qb, kk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            k_ok = (base + jax.lax.broadcasted_iota(
                jnp.int32, (hq, u * bs), 1) < length) & live
            s = jnp.where(k_ok, s, NEG_INF)  # [hq, U*bs]
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            pexp = jnp.exp(s - m_new)
            m = m_new
            l = alpha * l + jnp.sum(pexp, axis=-1, keepdims=True)
            acc = alpha * acc + jnp.dot(
                pexp, vv, preferred_element_type=jnp.float32
            )

        norm = acc / jnp.maximum(l, 1e-30)  # [hq, flat]
        # extract each head's diagonal block as a masked sum (sublane-offset
        # slices don't concatenate in Mosaic; lane-only slices + where do)
        row_head = jax.lax.broadcasted_iota(jnp.int32, (hq, d), 0) // n_rep
        out = jnp.zeros((hq, d), jnp.float32)
        for h in range(hkv):
            out = out + jnp.where(
                row_head == h, norm[:, h * d:(h + 1) * d], 0.0
            )
        o_ref[0] = out.astype(o_ref.dtype)

    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    in_specs = [pl.BlockSpec((1, hq, flat), lambda i, *s: (i, 0, 0))]
    inputs = [qbd, kq_pool]
    in_specs.append(hbm)
    if quantized:
        in_specs.append(hbm)
        inputs.append(k_scale)
    in_specs.append(hbm)
    inputs.append(vq_pool)
    if quantized:
        in_specs.append(hbm)
        inputs.append(v_scale)

    scratch = [
        pltpu.VMEM((2, u * bs, flat), kq_pool.dtype),
        pltpu.VMEM((2, u * bs, flat), vq_pool.dtype),
    ]
    n_sems = 2
    if quantized:
        scratch += [
            pltpu.VMEM((2, u * bs, sc_w), k_scale.dtype),
            pltpu.VMEM((2, u * bs, sc_w), v_scale.dtype),
        ]
        n_sems = 4
    scratch.append(pltpu.SemaphoreType.DMA((2, n_sems)))

    scalar_args = [lengths.astype(jnp.int32), table.astype(jnp.int32)]
    if stacked:
        scalar_args.append(jnp.asarray(layer, jnp.int32).reshape(1))
    out_shape = [jax.ShapeDtypeStruct((b, hq, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, hq, d), lambda i, *s: (i, 0, 0))]
    aliases = {}
    if alias_caches:
        # alias keys index the FULL input list incl. scalar-prefetch args
        base = len(scalar_args) + 1  # + qbd
        cache_ins = [kq_pool] + ([k_scale] if quantized else []) + [
            vq_pool] + ([v_scale] if quantized else [])
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
    kd = (n_blocks, bs, hkv, d)
    if quantized:
        k_new = {"q": couts[0].reshape(*lead, *kd),
                 "scale": couts[1][..., :hkv]}
        v_new = {"q": couts[2].reshape(*lead, *kd),
                 "scale": couts[3][..., :hkv]}
    else:
        k_new = couts[0].reshape(*lead, *kd)
        v_new = couts[1].reshape(*lead, *kd)
    return out, k_new, v_new


def paged_decode_attention(
    q: jnp.ndarray,
    k_pool,
    v_pool,
    table: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Pallas paged decode attention. Same contract as the XLA fallback."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kq_pool, k_scale = _split(k_pool)
    vq_pool, v_scale = _split(v_pool)
    n_blocks, bs, hkv, d = kq_pool.shape
    b, p = table.shape
    hq = q.shape[1]
    n_rep = hq // hkv
    scale = d**-0.5
    qg = q.reshape(b, hkv, n_rep, d)
    quantized = k_scale is not None

    def kernel(len_ref, tbl_ref, *refs):
        if quantized:
            q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = refs
        else:
            q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref = refs
            ks_ref = vs_ref = None
        i, j = pl.program_id(0), pl.program_id(1)
        length = len_ref[i]
        base = j * bs

        @pl.when(j == 0)
        def _init():
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        @pl.when(base < length)
        def _block():
            for h in range(hkv):  # static unroll over GQA groups
                qb = q_ref[0, h].astype(jnp.float32) * scale  # [n_rep, D]
                k = k_ref[0, :, h, :].astype(jnp.float32)  # [bs, D]
                v = v_ref[0, :, h, :].astype(jnp.float32)
                if quantized:
                    k = k * ks_ref[0, :, h][:, None]
                    v = v * vs_ref[0, :, h][:, None]
                s = jnp.dot(qb, k.T, preferred_element_type=jnp.float32)
                k_pos = base + jax.lax.broadcasted_iota(
                    jnp.int32, (n_rep, bs), 1
                )
                s = jnp.where(k_pos < length, s, NEG_INF)
                m_old = m_ref[h]  # [n_rep, 1]
                m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
                alpha = jnp.exp(m_old - m_new)
                pexp = jnp.exp(s - m_new)
                m_ref[h] = m_new
                l_ref[h] = alpha * l_ref[h] + jnp.sum(pexp, axis=-1, keepdims=True)
                acc_ref[h] = alpha * acc_ref[h] + jnp.dot(
                    pexp, v, preferred_element_type=jnp.float32
                )

        @pl.when(j == p - 1)
        def _finish():
            o_ref[0] = (
                acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
            ).astype(o_ref.dtype)

    def block_map(i, j, len_ref, tbl_ref):
        # past the last valid block, re-map to the last valid block: the
        # repeated index makes Pallas skip the DMA (revisiting)
        nb = jnp.maximum((len_ref[i] + bs - 1) // bs, 1)
        jj = jnp.minimum(j, nb - 1)
        return (tbl_ref[i, jj], 0, 0, 0)

    def scale_map(i, j, len_ref, tbl_ref):
        nb = jnp.maximum((len_ref[i] + bs - 1) // bs, 1)
        jj = jnp.minimum(j, nb - 1)
        return (tbl_ref[i, jj], 0, 0)

    in_specs = [
        pl.BlockSpec((1, hkv, n_rep, d), lambda i, j, *s: (i, 0, 0, 0)),
        pl.BlockSpec((1, bs, hkv, d), block_map),
    ]
    inputs = [qg, kq_pool]
    if quantized:
        in_specs.append(pl.BlockSpec((1, bs, hkv), scale_map))
        inputs.append(k_scale)
    in_specs.append(pl.BlockSpec((1, bs, hkv, d), block_map))
    inputs.append(vq_pool)
    if quantized:
        in_specs.append(pl.BlockSpec((1, bs, hkv), scale_map))
        inputs.append(v_scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, p),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hkv, n_rep, d), lambda i, j, *s: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hkv, n_rep, 1), jnp.float32),
            pltpu.VMEM((hkv, n_rep, 1), jnp.float32),
            pltpu.VMEM((hkv, n_rep, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, n_rep, d), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), table.astype(jnp.int32), *inputs)
    return out.reshape(b, hq, d)
