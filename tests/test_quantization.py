"""int8 weight-only quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.models import llama, quantization as q


def test_quantize_tensor_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
    qt = q.quantize_tensor(w, axis=0)  # reduce the contraction dim
    assert qt["q"].dtype == jnp.int8
    assert qt["scale"].shape == (32,)
    deq = q.dequantize(qt, jnp.float32)
    # per-channel int8: relative error bounded by ~1/127
    err = np.abs(np.asarray(deq) - np.asarray(w)).max(axis=0)
    amax = np.abs(np.asarray(w)).max(axis=0)
    assert (err <= amax / 127.0 + 1e-6).all()


def test_matmul_quantized_close():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64), dtype=jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), (64, 32))
    qt = q.quantize_tensor(w, axis=0)
    ref = np.asarray(x @ w)
    ours = np.asarray(q.matmul(x, qt))
    rel = np.abs(ours - ref).mean() / np.abs(ref).mean()
    assert rel < 0.01


def test_quantized_model_logits_close():
    cfg = llama.tiny_config(vocab_size=256, max_seq_len=64)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    qparams = q.quantize_llama_params(params)
    # embedding per-row, kernels per-out-channel, norms untouched
    assert qparams["embed"]["embedding"]["q"].dtype == jnp.int8
    assert qparams["embed"]["embedding"]["scale"].shape == (256,)
    assert qparams["layers"]["attn"]["wq"]["kernel"]["q"].dtype == jnp.int8
    assert qparams["norm"]["scale"].dtype == params["norm"]["scale"].dtype

    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 256)
    ref = np.asarray(llama.forward(params, cfg, tokens))
    ours = np.asarray(llama.forward(qparams, cfg, tokens))
    # top-1 agreement is what matters for greedy decode
    agree = (ref.argmax(-1) == ours.argmax(-1)).mean()
    assert agree > 0.9, agree


def test_quantized_decode_runs():
    cfg = llama.tiny_config(vocab_size=128, max_seq_len=64)
    params = q.quantize_llama_params(llama.init_params(jax.random.PRNGKey(0), cfg))
    cache = llama.init_kv_cache(cfg, 2, 32)
    toks = jnp.zeros((2, 8), jnp.int32)
    lens = jnp.full((2,), 8, jnp.int32)
    logits, cache = llama.prefill(params, cfg, toks, lens, cache)
    logits2, cache = llama.decode_step(params, cfg, cache,
                                       jnp.zeros((2,), jnp.int32), lens)
    assert np.isfinite(np.asarray(logits2)).all()


def test_quantize_tensor_int4():
    w = jax.random.normal(jax.random.PRNGKey(3), (64, 32))
    qt = q.quantize_tensor(w, axis=0, bits=4)
    # nibble pairs packed along the LAST axis, natural orientation: [K, N/2]
    assert qt["q4"].dtype == jnp.uint8 and qt["q4"].shape == (64, 16)
    assert qt["scale"].shape == (32,)
    # matmul path contracts against the packed layout without transposing
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 64), jnp.float32)
    rel = (np.abs(np.asarray(q.matmul(x, qt)) - np.asarray(x @ w)).mean()
           / np.abs(np.asarray(x @ w)).mean())
    assert rel < 0.15, rel  # per-channel int4 on gaussian weights
    deq = q.dequantize(qt, jnp.float32)
    assert deq.shape == w.shape
    # clip-searched int4: per-channel MSE must beat (or match) plain abs-max
    amax = np.abs(np.asarray(w)).max(axis=0, keepdims=True)
    s = np.maximum(amax / 7.0, 1e-12)
    naive = np.clip(np.round(np.asarray(w) / s), -7, 7) * s
    mse = ((np.asarray(deq) - np.asarray(w)) ** 2).sum(axis=0)
    naive_mse = ((naive - np.asarray(w)) ** 2).sum(axis=0)
    assert (mse <= naive_mse + 1e-9).all()
    # per-row embedding orientation packs the feature axis
    qe = q.quantize_tensor(w, axis=1, bits=4)
    assert qe["q4"].shape == (64, 16) and qe["scale"].shape == (64,)
    deq_e = q.dequantize(qe, jnp.float32)
    amax_r = np.abs(np.asarray(w)).max(axis=1, keepdims=True)
    s_r = np.maximum(amax_r / 7.0, 1e-12)
    naive_r = np.clip(np.round(np.asarray(w) / s_r), -7, 7) * s_r
    mse_r = ((np.asarray(deq_e) - np.asarray(w)) ** 2).sum(axis=1)
    assert (mse_r <= ((naive_r - np.asarray(w)) ** 2).sum(axis=1) + 1e-9).all()
    with pytest.raises(ValueError):
        q.quantize_tensor(w, axis=0, bits=3)
    with pytest.raises(ValueError):
        q.quantize_tensor(jnp.ones((4, 63)), axis=0, bits=4)  # odd last axis

    # the in-program S4 view restores natural orientation and exact values
    s4 = q.unpack_packed_params(qt)
    assert s4["q"].shape == (64, 32) and s4["q"].dtype == jnp.int4
    np.testing.assert_allclose(
        np.asarray(q.dequantize(s4, jnp.float32)),
        np.asarray(q.dequantize(qt, jnp.float32)),
    )


def test_int4_model_generate():
    """int4 params drive the whole generate loop (embed gather on int4 rows,
    dequant matmuls, windowed head) and keep decent top-1 agreement."""
    from tts_max_tpu.inference.generate import generate
    from tts_max_tpu.ops.sampling import SamplingParams

    cfg = llama.tiny_config(vocab_size=256, max_seq_len=64)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    q4 = q.quantize_llama_params(params, bits=4)
    # layer kernels packed int4; embedding/head keep an int8 floor
    assert "q4" in q4["layers"]["attn"]["wq"]["kernel"]
    assert q4["embed"]["embedding"]["q"].dtype == jnp.int8
    q4e = q.quantize_llama_params(params, bits=4, embed_bits=4)
    assert "q4" in q4e["embed"]["embedding"]

    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 256)
    ref = np.asarray(llama.forward(params, cfg, tokens))
    ours = np.asarray(llama.forward(q4, cfg, tokens))
    agree = (ref.argmax(-1) == ours.argmax(-1)).mean()
    assert agree > 0.5, agree  # per-channel int4 is coarse; sanity bound

    sp = SamplingParams(temperature=0.0, repetition_penalty=1.0,
                        frequency_penalty=0.0)
    toks = tokens[:, :8]
    lens = jnp.full((2,), 8, jnp.int32)
    res = generate(q4, cfg, toks, lens, jax.random.PRNGKey(0), sp=sp,
                   max_new_tokens=6, eos_id=-1, vocab_window=(32, 64))
    out = np.asarray(res.tokens)
    assert ((out >= 32) & (out < 96)).all()


def test_grouped_int4_shapes_and_dequant():
    """Sub-channel grouped int4: scale [..., K/g, N]; dequantize respects
    group boundaries; grouping strictly beats per-channel on weights with a
    per-group outlier (the failure mode that makes per-channel int4 coarse
    at 2048-deep contractions)."""
    rng = np.random.default_rng(0)
    w = rng.normal(size=(256, 64)).astype(np.float32)
    # one huge outlier per column in the FIRST group only: per-channel scales
    # blow up for the whole column, grouped scales only for group 0
    w[5, :] *= 40.0
    p = q.quantize_tensor(jnp.asarray(w), axis=0, bits=4, group_size=64)
    assert p["q4"].shape == (256, 32) and p["q4"].dtype == jnp.uint8
    assert p["scale"].shape == (4, 64)
    pc = q.quantize_tensor(jnp.asarray(w), axis=0, bits=4)
    err_g = float(jnp.mean((q.dequantize(p, jnp.float32) - w) ** 2))
    err_c = float(jnp.mean((q.dequantize(pc, jnp.float32) - w) ** 2))
    assert err_g < err_c / 2, (err_g, err_c)


def test_grouped_int4_matmul_matches_dequant():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(128, 32)).astype(np.float32)
    x = rng.normal(size=(4, 128)).astype(np.float32)
    p = q.quantize_tensor(jnp.asarray(w), axis=0, bits=4, group_size=32)
    got = q.matmul(jnp.asarray(x), p, dtype=jnp.float32)
    want = x @ np.asarray(q.dequantize(p, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_grouped_int4_layer_stacked_and_model():
    """[L, K, N] stacked kernels quantize to [L, G, N] scales; the full
    model generates through the grouped path (scan slices layer by layer),
    including unpack_packed_params and the engine."""
    from tts_max_tpu.inference.generate import generate
    from tts_max_tpu.ops.sampling import SamplingParams

    cfg = llama.tiny_config(vocab_size=64, max_seq_len=128)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    gp = q.quantize_llama_params(params, bits=4, group_size=8)
    k = gp["layers"]["mlp"]["w_gate"]["kernel"]
    assert k["scale"].ndim == 3  # [L, G, N]
    sp = SamplingParams(temperature=0.0, repetition_penalty=1.0,
                        frequency_penalty=0.0)
    toks = jnp.asarray(np.arange(1, 9, dtype=np.int32)[None])
    lens = jnp.asarray([8], jnp.int32)
    out = generate(gp, cfg, toks, lens, jax.random.PRNGKey(1), sp=sp,
                   max_new_tokens=6, eos_id=-1, cache_len=64)
    assert out.tokens.shape == (1, 6)
    # grouped dequantized weights are CLOSER to bf16 than per-channel ones,
    # so greedy tokens should match the bf16 model at this tiny scale
    ref = generate(params, cfg, toks, lens, jax.random.PRNGKey(1), sp=sp,
                   max_new_tokens=6, eos_id=-1, cache_len=64)
    pc = q.quantize_llama_params(params, bits=4)
    out_pc = generate(pc, cfg, toks, lens, jax.random.PRNGKey(1), sp=sp,
                      max_new_tokens=6, eos_id=-1, cache_len=64)
    agree_g = int((out.tokens == ref.tokens).sum())
    agree_c = int((out_pc.tokens == ref.tokens).sum())
    assert agree_g >= agree_c


def test_quantize_for_serving_grouped_mode():
    cfg = llama.tiny_config(vocab_size=64, max_seq_len=64)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    gp = q.quantize_for_serving(params, "int4-g8")
    assert gp["layers"]["attn"]["wq"]["kernel"]["scale"].ndim == 3
    with pytest.raises(ValueError):
        q.quantize_tensor(jnp.ones((16, 16)), axis=0, bits=8, group_size=8)
