"""Paged KV cache: block-table attention kernel + paged engine tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.inference.engine import InferenceEngine, PagedInferenceEngine
from tts_max_tpu.models import llama
from tts_max_tpu.ops import paged_attention as pattn
from tts_max_tpu.ops.attention import decode_attention
from tts_max_tpu.ops.sampling import SamplingParams


def _greedy_sp():
    return SamplingParams(temperature=0.0, repetition_penalty=1.0,
                          frequency_penalty=0.0)


def _rand_paged_case(seed, b=3, p=4, bs=16, hkv=2, n_rep=3, d=8,
                     quantized=False):
    """Random contiguous cache + equivalent shuffled block pool."""
    rng = np.random.default_rng(seed)
    hq = hkv * n_rep
    max_len = p * bs
    q = rng.standard_normal((b, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, max_len, hkv, d)).astype(np.float32)
    v = rng.standard_normal((b, max_len, hkv, d)).astype(np.float32)
    lengths = rng.integers(1, max_len + 1, (b,)).astype(np.int32)

    # pool with a random block permutation (plus spare blocks)
    n_blocks = b * p + 5
    perm = rng.permutation(n_blocks)[: b * p].reshape(b, p).astype(np.int32)
    k_pool = rng.standard_normal((n_blocks, bs, hkv, d)).astype(np.float32)
    v_pool = rng.standard_normal((n_blocks, bs, hkv, d)).astype(np.float32)
    for i in range(b):
        for j in range(p):
            k_pool[perm[i, j]] = k[i, j * bs : (j + 1) * bs]
            v_pool[perm[i, j]] = v[i, j * bs : (j + 1) * bs]

    if quantized:
        def q8(x):
            scale = np.abs(x).max(axis=-1, keepdims=True) / 127.0 + 1e-12
            return {
                "q": np.clip(np.round(x / scale), -127, 127).astype(np.int8),
                "scale": scale[..., 0].astype(np.float32),
            }

        k, v, k_pool, v_pool = q8(k), q8(v), q8(k_pool), q8(v_pool)

    to_j = lambda t: jax.tree.map(jnp.asarray, t)
    return (to_j(q), to_j(k), to_j(v), to_j(k_pool), to_j(v_pool),
            jnp.asarray(perm), jnp.asarray(lengths))


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_xla_matches_contiguous(quantized):
    q, k, v, k_pool, v_pool, table, lengths = _rand_paged_case(
        0, quantized=quantized
    )
    ref = decode_attention(q, k, v, lengths)
    out = pattn.paged_decode_attention_xla(q, k_pool, v_pool, table, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_kernel_matches_xla(quantized):
    q, k, v, k_pool, v_pool, table, lengths = _rand_paged_case(
        1, quantized=quantized
    )
    ref = pattn.paged_decode_attention_xla(q, k_pool, v_pool, table, lengths)
    out = pattn.paged_decode_attention(
        q, k_pool, v_pool, table, lengths, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_paged_kernel_ignores_garbage_blocks():
    """Unallocated table entries (0) and beyond-length positions must not
    leak into the output."""
    q, k, v, k_pool, v_pool, table, lengths = _rand_paged_case(2)
    ref = pattn.paged_decode_attention(
        q, k_pool, v_pool, table, lengths, interpret=True
    )
    # poison every block not referenced below each sequence's length
    k_np = np.array(k_pool, copy=True)
    v_np = np.array(v_pool, copy=True)
    used = set()
    bs = k_np.shape[1]
    for i in range(table.shape[0]):
        nb = -(-int(lengths[i]) // bs)
        used.update(int(x) for x in np.asarray(table)[i, :nb])
    for blk in range(k_np.shape[0]):
        if blk not in used:
            k_np[blk] = 1e4
            v_np[blk] = -1e4
    out = pattn.paged_decode_attention(
        q, jnp.asarray(k_np), jnp.asarray(v_np), table, lengths,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("quantized", [False, True])
def test_decode_step_paged_matches_contiguous(quantized):
    """Greedy decode through the paged step == contiguous step, with a
    shuffled block table."""
    cfg = llama.tiny_config(vocab_size=64, max_seq_len=128)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    b, bs, p = 2, 16, 4
    max_len = bs * p
    rng = np.random.default_rng(3)
    prompt_lens = np.array([5, 9])
    tokens = rng.integers(1, 60, (b, 16)).astype(np.int32)

    cache = llama.init_kv_cache(cfg, b, max_len, quantized=quantized)
    logits_c, cache = llama.prefill(
        params, cfg, jnp.asarray(tokens), jnp.asarray(prompt_lens), cache
    )

    pool = llama.init_paged_kv_cache(cfg, b * p + 3, bs, quantized=quantized)
    table = np.asarray(
        rng.permutation(b * p + 3)[: b * p].reshape(b, p), dtype=np.int32
    )
    # scatter each sequence's prefill region into its blocks
    for i in range(b):
        small_i = jax.tree.map(lambda x: x[:, i : i + 1, :16], cache)
        pool = llama.scatter_prefill_to_blocks(
            pool, small_i, jnp.asarray(table[i, : 16 // bs])
        )
    table_j = jnp.asarray(table)

    lengths = jnp.asarray(prompt_lens, jnp.int32)
    logits_p = logits_c
    for step in range(6):
        toks_c = jnp.argmax(logits_c, axis=-1).astype(jnp.int32)
        toks_p = jnp.argmax(logits_p, axis=-1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(toks_c), np.asarray(toks_p))
        logits_c, cache = llama.decode_step(params, cfg, cache, toks_c, lengths)
        logits_p, pool = llama.decode_step_paged(
            params, cfg, pool, toks_p, lengths, table_j
        )
        np.testing.assert_allclose(
            np.asarray(logits_p), np.asarray(logits_c), atol=2e-4
        )
        lengths = lengths + 1


@pytest.fixture(scope="module")
def setup():
    cfg = llama.tiny_config(vocab_size=64, max_seq_len=256)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.mark.parametrize("quantized_kv", [False, True])
def test_paged_engine_matches_contiguous_engine(setup, quantized_kv):
    cfg, params = setup
    prompts = [
        np.array([1, 2, 3], dtype=np.int32),
        np.array(list(range(10, 80)), dtype=np.int32),  # crosses blocks
        np.array([7], dtype=np.int32),
    ]
    ref_engine = InferenceEngine(
        params, cfg, max_batch=4, max_len=128, sp=_greedy_sp(),
        quantized_kv=quantized_kv,
    )
    ref = ref_engine.generate_all(prompts, max_new_tokens=8, eos_id=-1)
    paged = PagedInferenceEngine(
        params, cfg, max_batch=4, max_len=128, block_size=32,
        sp=_greedy_sp(), quantized_kv=quantized_kv,
    )
    got = paged.generate_all(prompts, max_new_tokens=8, eos_id=-1)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r.tokens, g.tokens)


def test_paged_engine_block_recycling(setup):
    """A pool too small for all requests at once still completes them all
    (FIFO admission waits for freed blocks), and the free list is restored."""
    cfg, params = setup
    engine = PagedInferenceEngine(
        params, cfg, max_batch=4, max_len=128, block_size=32,
        num_blocks=11,  # each request needs ceil(64/32)=2+ blocks (block 0 = sink)
        sp=_greedy_sp(),
    )
    prompts = [np.array([i + 1, i + 2, i + 3], dtype=np.int32) for i in range(7)]
    done = engine.generate_all(prompts, max_new_tokens=5, eos_id=-1)
    assert len(done) == 7
    assert all(len(c.tokens) == 5 for c in done)
    assert sorted(engine._free_blocks) == list(range(1, 11))
    # and the outputs match the contiguous engine
    ref_engine = InferenceEngine(params, cfg, max_batch=4, max_len=128,
                                 sp=_greedy_sp())
    ref = ref_engine.generate_all(prompts, max_new_tokens=5, eos_id=-1)
    for r, g in zip(ref, done):
        np.testing.assert_array_equal(r.tokens, g.tokens)


def test_paged_engine_mid_flight_admission(setup):
    cfg, params = setup
    engine = PagedInferenceEngine(
        params, cfg, max_batch=2, max_len=128, block_size=32, sp=_greedy_sp()
    )
    p1 = np.array([4, 5, 6], dtype=np.int32)
    p2 = np.array([8, 9], dtype=np.int32)
    engine.submit(p1, max_new_tokens=10, eos_id=-1)
    for _ in range(4):
        engine.step()
    engine.submit(p2, max_new_tokens=5, eos_id=-1)
    done = {c.request_id: c for c in engine.run()}
    solo = InferenceEngine(params, cfg, max_batch=1, max_len=128, sp=_greedy_sp())
    [r1] = solo.generate_all([p1], max_new_tokens=10, eos_id=-1)
    solo2 = InferenceEngine(params, cfg, max_batch=1, max_len=128, sp=_greedy_sp())
    [r2] = solo2.generate_all([p2], max_new_tokens=5, eos_id=-1)
    np.testing.assert_array_equal(done[0].tokens, r1.tokens)
    np.testing.assert_array_equal(done[1].tokens, r2.tokens)


# --- automatic prefix caching ------------------------------------------------


@pytest.fixture(scope="module")
def fp32_setup():
    import dataclasses
    cfg = dataclasses.replace(
        llama.tiny_config(vocab_size=64, max_seq_len=512), dtype=jnp.float32
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _greedy():
    return SamplingParams(temperature=0.0, repetition_penalty=1.0,
                          frequency_penalty=0.0)


def test_prefix_cache_reuse_matches_uncached(fp32_setup):
    """Second request with the same long prefix reuses its blocks (hit
    counter) and produces the identical greedy completion."""
    cfg, params = fp32_setup
    bs = 16
    prefix = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (3 * bs,), 3, 60)
    ).astype(np.int32)
    p1 = np.concatenate([prefix, [7, 9]]).astype(np.int32)
    p2 = np.concatenate([prefix, [11, 13, 5]]).astype(np.int32)

    ref_eng = PagedInferenceEngine(params, cfg, max_batch=2, max_len=256,
                                   block_size=bs, sp=_greedy())
    ref = {c.request_id: c for c in ref_eng.generate_all(
        [p1, p2], max_new_tokens=8, eos_id=-1)}

    eng = PagedInferenceEngine(params, cfg, max_batch=1, max_len=256,
                               block_size=bs, sp=_greedy(),
                               enable_prefix_cache=True)
    r1 = eng.generate_all([p1], max_new_tokens=8, eos_id=-1)[0]
    assert eng.prefix_cache_hits == 0
    r2 = eng.generate_all([p2], max_new_tokens=8, eos_id=-1)[0]
    assert eng.prefix_cache_hits == 3  # all three full prefix blocks reused

    np.testing.assert_array_equal(r1.tokens, ref[0].tokens)
    np.testing.assert_array_equal(r2.tokens, ref[1].tokens)


def test_prefix_cache_concurrent_sharing_and_refcounts(fp32_setup):
    """Concurrent same-prefix requests share blocks; refcounts release
    correctly and blocks become evictable, then get evicted under pressure."""
    cfg, params = fp32_setup
    bs = 16
    prefix = np.asarray(
        jax.random.randint(jax.random.PRNGKey(2), (2 * bs,), 3, 60)
    ).astype(np.int32)
    prompts = [np.concatenate([prefix, [3 + i]]).astype(np.int32)
               for i in range(3)]

    # small pool: 3 requests x 3 blocks each would need 9 without sharing;
    # with sharing, 2 shared + 3x2 own(partial+budget... here budget 8 -> 1
    # extra block) fits in 8
    # 9 blocks: the three concurrent requests need 4 + 2 + 2 with sharing
    # (impossible without it: 12); the fat request later needs 8 > the 7
    # free blocks, forcing LRU eviction of the cached prefix blocks.
    eng = PagedInferenceEngine(params, cfg, max_batch=3, max_len=128,
                               block_size=bs, num_blocks=10, sp=_greedy(),
                               enable_prefix_cache=True)
    solo = PagedInferenceEngine(params, cfg, max_batch=1, max_len=128,
                                block_size=bs, sp=_greedy())
    outs = eng.generate_all(prompts, max_new_tokens=6, eos_id=-1)
    for p, c in zip(prompts, outs):
        [r] = solo.generate_all([p], max_new_tokens=6, eos_id=-1)
        np.testing.assert_array_equal(c.tokens, r.tokens)
    # everything released: refcounts zero, shared blocks parked evictable
    assert (eng._refs == 0).all()
    assert len(eng._evictable) >= 2
    assert len(eng._free_blocks) + len(eng._evictable) == eng.num_blocks - 1

    # pressure: a fat request forces eviction of cached blocks
    big = np.asarray(
        jax.random.randint(jax.random.PRNGKey(3), (64,), 3, 60)
    ).astype(np.int32)
    [c] = eng.generate_all([big], max_new_tokens=60, eos_id=-1)
    assert len(c.tokens) == 60


def test_prefix_cache_never_swallows_whole_prompt(fp32_setup):
    """A prompt that is entirely full cached blocks still forwards its last
    block so the engine gets last-position logits."""
    cfg, params = fp32_setup
    bs = 16
    p = np.asarray(
        jax.random.randint(jax.random.PRNGKey(4), (2 * bs,), 3, 60)
    ).astype(np.int32)
    eng = PagedInferenceEngine(params, cfg, max_batch=1, max_len=128,
                               block_size=bs, sp=_greedy(),
                               enable_prefix_cache=True)
    a = eng.generate_all([p], max_new_tokens=5, eos_id=-1)[0]
    b = eng.generate_all([p], max_new_tokens=5, eos_id=-1)[0]
    assert eng.prefix_cache_hits == 1  # capped at (n-1)//bs
    np.testing.assert_array_equal(a.tokens, b.tokens)


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_dma_kernel_matches_xla(quantized):
    """Manual-DMA kernel (grid (B,), double-buffered async page copies) must
    match the gather oracle, including NaN-free handling of never-DMA'd
    pages past each sequence's length."""
    q, k, v, k_pool, v_pool, table, lengths = _rand_paged_case(
        3, quantized=quantized
    )
    ref = pattn.paged_decode_attention_xla(q, k_pool, v_pool, table, lengths)
    out = pattn.paged_decode_attention_dma(
        q, k_pool, v_pool, table, lengths, interpret=True
    )
    assert not np.isnan(np.asarray(out)).any()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_paged_dma_kernel_ignores_garbage_blocks():
    q, k, v, k_pool, v_pool, table, lengths = _rand_paged_case(4)
    ref = pattn.paged_decode_attention_dma(
        q, k_pool, v_pool, table, lengths, interpret=True
    )
    k_np = np.array(k_pool, copy=True)
    v_np = np.array(v_pool, copy=True)
    used = set()
    bs = k_np.shape[1]
    for i in range(table.shape[0]):
        nb = -(-int(lengths[i]) // bs)
        used.update(int(x) for x in np.asarray(table)[i, :nb])
    for blk in range(k_np.shape[0]):
        if blk not in used:
            k_np[blk] = np.nan  # harsher than 1e4: NaN must not propagate
            v_np[blk] = np.nan
    out = pattn.paged_decode_attention_dma(
        q, jnp.asarray(k_np), jnp.asarray(v_np), table, lengths,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_decode_step_paged_dma_variant_matches(monkeypatch):
    """decode_step_paged with TTS_MAX_PAGED_ATTN=dma (the TPU serving
    default) matches the XLA variant end-to-end through the layer scan."""
    cfg = llama.tiny_config(vocab_size=64, max_seq_len=128)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    b, bs, p = 2, 16, 4
    rng = np.random.default_rng(7)
    pool = llama.init_paged_kv_cache(cfg, b * p + 3, bs)
    table = jnp.asarray(
        rng.permutation(b * p + 3)[: b * p].reshape(b, p), dtype=jnp.int32
    )
    lengths = jnp.asarray([5, 9], jnp.int32)
    toks = jnp.asarray([11, 23], jnp.int32)
    logits_x, pool_x = llama.decode_step_paged(
        params, cfg, pool, toks, lengths, table
    )
    monkeypatch.setenv("TTS_MAX_PAGED_ATTN", "dma")
    logits_d, pool_d = llama.decode_step_paged(
        params, cfg, pool, toks, lengths, table
    )
    # bf16 model: the dma kernel accumulates attention in f32 while the XLA
    # path dots in bf16 — differences are bf16-rounding scale
    np.testing.assert_allclose(
        np.asarray(logits_d), np.asarray(logits_x), atol=2e-2
    )
    for a, b_ in zip(jax.tree.leaves(pool_x), jax.tree.leaves(pool_d)):
        # later layers' K/V derive from earlier layers' attention output,
        # so bf16 rounding differences propagate into the writes too
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-2, atol=2e-2
        )


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("ppb", [1, 2, 4])
def test_paged_dense_kernel_matches_xla(quantized, ppb):
    """Dense block-diagonal kernel == gather oracle across page-group
    sizes, including the NaN guard for never-DMA'd pages."""
    q, k, v, k_pool, v_pool, table, lengths = _rand_paged_case(
        5, quantized=quantized
    )
    ref = pattn.paged_decode_attention_xla(q, k_pool, v_pool, table, lengths)
    out = pattn.paged_decode_attention_dense(
        q, k_pool, v_pool, table, lengths, pages_per_block=ppb,
        interpret=True,
    )
    assert not np.isnan(np.asarray(out)).any()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_decode_step_paged_dense_variant_matches(monkeypatch):
    """decode_step_paged with TTS_MAX_PAGED_ATTN=dense (the TPU serving
    default) matches the XLA variant end-to-end through the layer scan."""
    cfg = llama.tiny_config(vocab_size=64, max_seq_len=128)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    b, bs, p = 2, 16, 4
    rng = np.random.default_rng(9)
    pool = llama.init_paged_kv_cache(cfg, b * p + 3, bs)
    table = jnp.asarray(
        rng.permutation(b * p + 3)[: b * p].reshape(b, p), dtype=jnp.int32
    )
    lengths = jnp.asarray([5, 9], jnp.int32)
    toks = jnp.asarray([11, 23], jnp.int32)
    logits_x, pool_x = llama.decode_step_paged(
        params, cfg, pool, toks, lengths, table
    )
    monkeypatch.setenv("TTS_MAX_PAGED_ATTN", "dense")
    logits_d, pool_d = llama.decode_step_paged(
        params, cfg, pool, toks, lengths, table
    )
    np.testing.assert_allclose(
        np.asarray(logits_d), np.asarray(logits_x), atol=2e-2
    )
    for a, b_ in zip(jax.tree.leaves(pool_x), jax.tree.leaves(pool_d)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-2, atol=2e-2
        )


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_dense_stacked_kernel_matches_xla(quantized):
    """dense2 (stacked-pool, scalar-prefetched layer index) == gather
    oracle for every layer. The stacked form exists so the engine's layer
    scan never materializes a per-layer pool slice as a kernel operand."""
    rng = np.random.default_rng(12)
    L, N, bs, hkv, d, b, p, hq = 3, 9, 32, 2, 64, 4, 2, 8
    kp = jnp.asarray(rng.normal(size=(L, N, bs, hkv, d)).astype(np.float32))
    vp = jnp.asarray(rng.normal(size=(L, N, bs, hkv, d)).astype(np.float32))
    if quantized:
        ks = jnp.asarray(
            rng.uniform(0.5, 1.5, size=(L, N, bs, hkv)).astype(np.float32)
        )
        k_pool = {"q": kp.astype(jnp.int8), "scale": ks}
        v_pool = {"q": vp.astype(jnp.int8), "scale": ks * 0.7}
    else:
        k_pool, v_pool = kp, vp
    q = jnp.asarray(rng.normal(size=(b, hq, d)).astype(np.float32))
    table = jnp.asarray(rng.integers(0, N, size=(b, p)).astype(np.int32))
    lengths = jnp.asarray([5, 40, 64, 17], jnp.int32)
    for layer in range(L):
        sl_k = jax.tree.map(lambda x: x[layer], k_pool)
        sl_v = jax.tree.map(lambda x: x[layer], v_pool)
        ref = pattn.paged_decode_attention_xla(q, sl_k, sl_v, table, lengths)
        out = pattn.paged_decode_attention_dense(
            q, k_pool, v_pool, table, lengths, layer=jnp.int32(layer),
            interpret=True,
        )
        assert not np.isnan(np.asarray(out)).any()
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_decode_step_paged_dense2_variant_matches(monkeypatch):
    """decode_step_paged with TTS_MAX_PAGED_ATTN=dense2 (the stacked-pool
    TPU serving default) matches the XLA variant through the layer scan."""
    cfg = llama.tiny_config(vocab_size=64, max_seq_len=128)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    b, bs, p = 2, 16, 4
    rng = np.random.default_rng(9)
    pool = llama.init_paged_kv_cache(cfg, b * p + 3, bs)
    table = jnp.asarray(
        rng.permutation(b * p + 3)[: b * p].reshape(b, p), dtype=jnp.int32
    )
    lengths = jnp.asarray([5, 9], jnp.int32)
    toks = jnp.asarray([11, 23], jnp.int32)
    logits_x, pool_x = llama.decode_step_paged(
        params, cfg, pool, toks, lengths, table
    )
    monkeypatch.setenv("TTS_MAX_PAGED_ATTN", "dense2")
    logits_d, pool_d = llama.decode_step_paged(
        params, cfg, pool, toks, lengths, table
    )
    np.testing.assert_allclose(
        np.asarray(logits_d), np.asarray(logits_x), atol=2e-2
    )
    for a, b_ in zip(jax.tree.leaves(pool_x), jax.tree.leaves(pool_d)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-2, atol=2e-2
        )


def test_paged_engine_dense2_matches_xla_engine(setup, monkeypatch):
    """End-to-end paged engine under TTS_MAX_PAGED_ATTN=dense2 (staged
    table slicing included) reproduces the XLA-variant engine greedily."""
    from tts_max_tpu.inference.engine import PagedInferenceEngine

    cfg, params = setup
    sp = SamplingParams(temperature=0.0, repetition_penalty=1.0,
                        frequency_penalty=0.0)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(3, 60, n).astype(np.int32) for n in (4, 21, 9)]

    def run():
        eng = PagedInferenceEngine(
            params, cfg, max_batch=2, max_len=128, block_size=32, sp=sp,
            steps_per_dispatch=4, min_stage=32,
        )
        return [c.tokens for c in sorted(
            eng.generate_all(prompts, max_new_tokens=12, eos_id=-1),
            key=lambda c: c.request_id,
        )]

    ref = run()
    monkeypatch.setenv("TTS_MAX_PAGED_ATTN", "dense2")
    got = run()
    for a, b_ in zip(ref, got):
        np.testing.assert_array_equal(a, b_)
