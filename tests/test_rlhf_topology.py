"""Trainer/sampler multi-mesh RLHF topology (VERDICT r4 missing #1).

The reference runs GRPO on 8 training GPUs against a separate 8-GPU vLLM
server with NCCL weight broadcast between rollout rounds
(/root/reference/tts/training/rlhf/run_rlhf_combine.sh:45-61). The TPU
analog (training/rlhf/topology.py): split the virtual 8-CPU device set into
a trainer sub-mesh (FSDP-sharded GRPO update) and a sampler sub-mesh (TP
serving engine), pushing resharded params between rounds. These tests pin

- the cross-mesh weight push preserves values and lands TP-sharded;
- a full multi-mesh GRPO run (engine rollouts on the sampler mesh,
  update on the trainer mesh, weight push between rounds) matches the
  single-mesh trainer's rewards and losses.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.core.config import MeshConfig, RLHFConfig
from tts_max_tpu.core import tokenization
from tts_max_tpu.data.samples import Sample
from tts_max_tpu.models import llama
from tts_max_tpu.training.rlhf import grpo
from tts_max_tpu.training.rlhf.dataset import TtsRLHFDataset
from tts_max_tpu.training.rlhf.topology import TrainerSamplerTopology


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device CPU mesh"
)


def _topology():
    return TrainerSamplerTopology.create(n_sampler=4)


def test_split_and_weight_push():
    topo = _topology()
    assert dict(topo.trainer_mesh.shape) == {"data": 2, "fsdp": 2, "tensor": 1}
    assert dict(topo.sampler_mesh.shape) == {"data": 1, "fsdp": 1, "tensor": 4}
    trainer_devs = set(topo.trainer_mesh.devices.flat)
    sampler_devs = set(topo.sampler_mesh.devices.flat)
    assert not trainer_devs & sampler_devs  # disjoint sub-meshes

    cfg = llama.tiny_config(vocab_size=512, max_seq_len=128)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    sharded = topo.shard_for_trainer(params)
    pushed = topo.push_to_sampler(sharded)
    # values survive the reshard bit-exactly
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(pushed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # every pushed leaf lives on the sampler mesh only
    for leaf in jax.tree_util.tree_leaves(pushed):
        assert set(leaf.sharding.mesh.devices.flat) == sampler_devs
    # a TP-partitioned leaf (attention projection) is actually split
    wq = pushed["layers"]["attn"]["wq"]["kernel"]
    assert wq.sharding.is_fully_replicated is False


class _LenReward:
    __name__ = "len"

    def __call__(self, completions, **kw):
        return [float(len(c)) for c in completions]


def _make_trainer(params, cfg, tok, sv, rlhf_cfg, **kw):
    return grpo.GRPOTrainer(
        params, cfg, tok, sv, [_LenReward()], rlhf_cfg,
        learning_rate=1e-4, **kw,
    )


def _dataset(tok):
    samples = [
        Sample.from_json(
            {"wav_path": f"w{i}.wav", "transcript": f"text {i}",
             "language": "en", "duration": 1.0, "sample_rate": 16000},
            "ds",
        )
        for i in range(3)
    ]
    codes = np.arange(30, dtype=np.int32) % 65536
    return TtsRLHFDataset(
        "ds", samples, codes, [(0, 10), (10, 20), (20, 30)], tok
    )


def test_multimesh_grpo_matches_single_mesh():
    """Two GRPO steps through the full multi-mesh loop (engine rollout on
    the sampler TP mesh, FSDP update on the trainer mesh, weight push
    between rounds) must reproduce the single-mesh trainer: greedy rollouts
    are token-identical, so rewards match exactly and losses to fp32
    collective-reordering tolerance."""
    tok = tokenization.build_byte_tokenizer()
    sv = tokenization.speech_vocab(tok)
    # fp32 + greedy + no penalties: TP psum reordering must not flip
    # near-tie sampling on a random tiny model (same rationale as
    # __graft_entry__._dryrun_tp_engine)
    cfg = dataclasses.replace(
        llama.tiny_config(vocab_size=len(tok), max_seq_len=512),
        dtype=jnp.float32,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rlhf_cfg = RLHFConfig(
        num_generations=2, max_completion_length=8, max_prompt_length=64,
        temperature=0.0, repetition_penalty=1.0, kl_beta=0.04,
    )
    ds = _dataset(tok)
    prompts = [[ds[0], ds[1]], [ds[1], ds[2]]]

    ref = _make_trainer(params, cfg, tok, sv, rlhf_cfg)
    ref_stats = [ref.train_step(p) for p in prompts]

    topo = _topology()
    multi = _make_trainer(
        params, cfg, tok, sv, rlhf_cfg,
        topology=topo, rollout_via_engine=True, engine_max_batch=4,
    )
    multi_stats = [multi.train_step(p) for p in prompts]

    for r, m in zip(ref_stats, multi_stats):
        # greedy rollouts identical => identical completion lengths/rewards
        assert r["reward_mean"] == pytest.approx(m["reward_mean"])
        assert r["completion_len"] == pytest.approx(m["completion_len"])
        assert m["loss"] == pytest.approx(r["loss"], abs=1e-4)
    # the trainer-side params stayed on the trainer mesh
    leaf = jax.tree_util.tree_leaves(multi.params)[0]
    assert set(leaf.sharding.mesh.devices.flat) == set(
        topo.trainer_mesh.devices.flat
    )
    # and the engine is serving the pushed (sampler-mesh) copy
    eng_leaf = jax.tree_util.tree_leaves(multi._engine.params)[0]
    assert set(eng_leaf.sharding.mesh.devices.flat) == set(
        topo.sampler_mesh.devices.flat
    )


def test_generate_rollout_on_sampler_mesh():
    """topology without rollout_via_engine: the one-shot generate program
    runs on the sampler mesh with pushed params (smoke + finiteness)."""
    tok = tokenization.build_byte_tokenizer()
    sv = tokenization.speech_vocab(tok)
    cfg = dataclasses.replace(
        llama.tiny_config(vocab_size=len(tok), max_seq_len=512),
        dtype=jnp.float32,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rlhf_cfg = RLHFConfig(
        num_generations=2, max_completion_length=8, max_prompt_length=64,
        temperature=0.0, repetition_penalty=1.0,
    )
    ds = _dataset(tok)
    trainer = _make_trainer(
        params, cfg, tok, sv, rlhf_cfg, topology=_topology()
    )
    stats = trainer.train_step([ds[0], ds[1]])
    assert np.isfinite(stats["loss"])
    assert stats["step"] == 1
