"""Tensor-parallel serving: generation with params sharded over the mesh
(the reference's vLLM --tensor_parallel_size equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tts_max_tpu.core.config import MeshConfig
from tts_max_tpu.inference.generate import make_generate_fn
from tts_max_tpu.models import llama
from tts_max_tpu.ops.sampling import SamplingParams
from tts_max_tpu.parallel.mesh import build_mesh
from tts_max_tpu.parallel.sharding import params_shardings


def test_tp_sharded_generate_matches_replicated():
    """Greedy generation with TP-sharded weights must produce the same
    tokens as the replicated run."""
    mesh = build_mesh(MeshConfig(data=1, fsdp=1, tensor=8))
    cfg = llama.tiny_config(vocab_size=512, max_seq_len=128)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    sp = SamplingParams(temperature=0.0, repetition_penalty=1.0,
                        frequency_penalty=0.0)
    gen = make_generate_fn(cfg, sp, max_new_tokens=8, eos_id=-1, cache_len=64)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 3, 512)
    lens = jnp.full((2,), 16, jnp.int32)

    ref = gen(params, toks, lens, jax.random.PRNGKey(2))

    sharded = jax.device_put(params, params_shardings(params, mesh))
    # verify something actually sharded over tensor
    specs = {
        str(p): s.sharding.spec
        for p, s in jax.tree_util.tree_leaves_with_path(sharded)
    }
    assert any("tensor" in str(s) for s in specs.values())
    with mesh:
        out = gen(sharded, toks, lens, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))


def test_fsdp_sharded_forward_matches():
    mesh = build_mesh(MeshConfig(data=1, fsdp=4, tensor=2))
    cfg = llama.tiny_config(vocab_size=256, max_seq_len=64)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, 256)
    ref = llama.forward(params, cfg, toks)
    sharded = jax.device_put(params, params_shardings(params, mesh))
    with mesh:
        out = jax.jit(lambda p, t: llama.forward(p, cfg, t))(sharded, toks)
    # bf16 compute + sharded reduction order: compare within bf16 noise and
    # require exact top-1 agreement
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2)
    np.testing.assert_array_equal(
        np.asarray(out).argmax(-1), np.asarray(ref).argmax(-1)
    )


def test_llama8b_sharding_plan_abstract():
    """The 8B flagship's partition specs must tile a (1, 4, 2) mesh without
    materializing weights (eval_shape only) — every sharded dim divides."""
    mesh = build_mesh(MeshConfig(data=1, fsdp=4, tensor=2))
    cfg = llama.llama31_8b_config()
    shapes = jax.eval_shape(
        lambda: llama.init_params(jax.random.PRNGKey(0), cfg)
    )
    shardings = params_shardings(shapes, mesh)
    flat = jax.tree_util.tree_leaves_with_path(shardings)
    sharded_leaves = 0
    for path, sh in flat:
        spec = sh.spec
        if any(a is not None for a in spec):
            sharded_leaves += 1
    # all big kernels + embeddings must actually shard (not fall back)
    assert sharded_leaves >= 8
    emb = shardings["embed"]["embedding"].spec
    assert emb == P("tensor", "fsdp")
    wq = shardings["layers"]["attn"]["wq"]["kernel"].spec
    assert wq == P(None, "fsdp", "tensor")
    # jit the forward abstractly with these shardings: partitioning must be
    # consistent (no shape errors at trace/lower time)
    tokens = jax.ShapeDtypeStruct((2, 32), jnp.int32)
    abstract_params = jax.tree_util.tree_map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        shapes, shardings,
    )
    with mesh:
        lowered = jax.jit(
            lambda p, t: llama.forward(p, cfg, t)
        ).lower(abstract_params, tokens)
    assert lowered is not None


def test_tp_sharded_engine_matches_replicated():
    """The continuous-batching engine runs with TP-sharded params (GSPMD
    propagates from the committed param shardings) and reproduces the
    replicated engine's greedy tokens."""
    from tts_max_tpu.inference.engine import InferenceEngine
    from tts_max_tpu.ops.sampling import SamplingParams

    import dataclasses

    mesh = build_mesh(MeshConfig(data=1, fsdp=1, tensor=8))
    # fp32 compute: TP splits each matmul's reduction over 8 devices, and
    # bf16 accumulation-order noise flips greedy near-ties on a random model
    cfg = dataclasses.replace(
        llama.tiny_config(vocab_size=64, max_seq_len=256), dtype=jnp.float32
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    sp = SamplingParams(temperature=0.0, repetition_penalty=1.0,
                        frequency_penalty=0.0)
    prompts = [np.array([5, 9, 42, 7], dtype=np.int32),
               np.array([11, 3], dtype=np.int32)]

    ref_eng = InferenceEngine(params, cfg, max_batch=2, max_len=128, sp=sp)
    ref = ref_eng.generate_all(prompts, max_new_tokens=8, eos_id=-1)

    sharded = jax.device_put(params, params_shardings(params, mesh))
    with mesh:
        eng = InferenceEngine(sharded, cfg, max_batch=2, max_len=128, sp=sp)
        out = eng.generate_all(prompts, max_new_tokens=8, eos_id=-1)
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(a.tokens, b.tokens)


@pytest.mark.parametrize("paged", [False, True])
def test_tp_sharded_engine_matches_replicated_multistep(paged):
    """Continuous-batching engine with TP-sharded params (mesh=...) must
    produce the same tokens as the single-device engine — the reference's
    vLLM --tensor_parallel_size serving role, paged and contiguous.

    fp32 compute like the test above: TP splits each matmul's reduction
    over 8 devices, and bf16 accumulation-order noise flips greedy
    near-ties on a random model."""
    import dataclasses

    from tts_max_tpu.inference.engine import InferenceEngine, PagedInferenceEngine

    mesh = build_mesh(MeshConfig(data=1, fsdp=1, tensor=8))
    cfg = dataclasses.replace(
        llama.tiny_config(vocab_size=512, max_seq_len=128),
        dtype=jnp.float32,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    sp = SamplingParams(temperature=0.0, repetition_penalty=1.0,
                        frequency_penalty=0.0)
    prompts = [
        np.array([5, 9, 42], dtype=np.int32),
        np.array(list(range(3, 70)), dtype=np.int32),
        np.array([7, 8], dtype=np.int32),
    ]

    def make(engine_params, mesh_arg):  # noqa: ANN001
        kw = dict(max_batch=2, max_len=128, sp=sp, steps_per_dispatch=4,
                  mesh=mesh_arg)
        if paged:
            return PagedInferenceEngine(
                engine_params, cfg, block_size=32, **kw
            )
        return InferenceEngine(engine_params, cfg, **kw)

    ref = make(params, None).generate_all(prompts, max_new_tokens=8, eos_id=-1)
    sharded = jax.device_put(params, params_shardings(params, mesh))
    with mesh:
        got = make(sharded, mesh).generate_all(
            prompts, max_new_tokens=8, eos_id=-1
        )
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r.tokens, g.tokens)
        assert r.finish_reason == g.finish_reason
