"""Foundation tests: config system, mesh construction, statistics."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tts_max_tpu.core import constants
from tts_max_tpu.core.config import (
    ExperimentConfig,
    MeshConfig,
    Strategy,
    from_dict,
)
from tts_max_tpu.parallel.mesh import build_mesh, resolve_mesh_shape
from tts_max_tpu.parallel.sharding import (
    batch_sharding,
    params_shardings,
    spec_for_path,
)
from tts_max_tpu.utils.statistics import Statistics, Timer


def test_constants():
    assert constants.CODEC_SAMPLE_RATE // constants.CODEC_TOKEN_RATE == constants.CODEC_HOP_LENGTH
    assert int(np.prod(constants.FSQ_LEVELS)) == constants.CODEBOOK_SIZE
    assert len(constants.SPECIAL_TOKENS) == 8
    assert len(constants.NONVERBAL_TOKENS) == 21
    assert constants.SPEECH_TOKEN_TEMPLATE.format(5) == "<|s_5|>"


def test_config_loads_reference_sft_json(tmp_path):
    # The reference example config must load, including its extra keys
    # (randomize_slider etc.) which we must tolerate.
    cfg = ExperimentConfig.from_json("/root/reference/example/configs/sft.json")
    assert cfg.training.seed == 777
    assert cfg.training.strategy.canonical() == Strategy.DP
    assert cfg.modeling.parameters.codebook_size == 65536
    assert cfg.modeling.parameters.max_seq_len == 2048
    assert cfg.checkpointing.save_steps == 100
    assert cfg.train_weighted_datasets == {"/path/to/your/vectorized_dataset": 1.0}
    # round trip
    p = tmp_path / "cfg.json"
    cfg.to_json(str(p))
    cfg2 = ExperimentConfig.from_json(str(p))
    assert cfg2.training.learning_rate == cfg.training.learning_rate


def test_config_missing_required_raises(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"training": {}}))
    with pytest.raises(ValueError):
        ExperimentConfig.from_json(str(p))


def test_mesh_shapes():
    assert resolve_mesh_shape(MeshConfig(data=-1, fsdp=2, tensor=2), 8) == (2, 2, 2)
    assert resolve_mesh_shape(MeshConfig(data=8, fsdp=1, tensor=1), 8) == (8, 1, 1)
    with pytest.raises(ValueError):
        resolve_mesh_shape(MeshConfig(data=3, fsdp=3, tensor=1), 8)
    mesh = build_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    assert mesh.shape == {"data": 2, "fsdp": 2, "tensor": 2}


def test_sharding_rules(mesh8):
    assert spec_for_path("layers/0/attn/wq/kernel") == P("fsdp", "tensor")
    assert spec_for_path("layers/0/norm/scale") == P()
    params = {
        "embed": {"embedding": jnp.zeros((256, 64))},
        "layers": [{"attn": {"wq": {"kernel": jnp.zeros((64, 64))}}}],
        "norm": {"scale": jnp.zeros((64,))},
    }
    sh = params_shardings(params, mesh8)
    assert sh["embed"]["embedding"].spec == P("tensor", "fsdp")
    assert sh["norm"]["scale"].spec == P(None)
    # a dim not divisible by the axis is replicated, not errored
    odd = {"attn": {"wq": {"kernel": jnp.zeros((63, 64))}}}
    sh2 = params_shardings(odd, mesh8)
    assert sh2["attn"]["wq"]["kernel"].spec == P(None, "tensor")


def test_batch_sharding_put(mesh8):
    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
    xs = jax.device_put(x, batch_sharding(mesh8))
    assert xs.sharding.spec == P(("data", "fsdp"))
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_statistics_roundtrip():
    s = Statistics()
    s.step = 7
    s.record_loss("libri", 2.0, n=4)
    s.record_loss("libri", 4.0, n=4)
    s.record_counter("tokens", 128)
    stats = s.logging_stats()
    assert stats["loss/libri"] == pytest.approx(3.0)
    assert stats["tokens"] == 128
    s2 = Statistics.from_state_dict(s.state_dict())
    assert s2.step == 7
    assert s2.logging_stats()["loss/libri"] == pytest.approx(3.0)


def test_timer():
    with Timer("x") as t:
        sum(range(1000))
    assert t.elapsed >= 0


def test_make_global_batch_single_process(mesh8):
    from tts_max_tpu.parallel.multihost import barrier, make_global_batch
    from tts_max_tpu.training.train_step import data_sh_axis1

    sh = data_sh_axis1(mesh8)
    batch = {"input_ids": np.zeros((2, 8, 16), np.int32)}
    out = make_global_batch(batch, {"input_ids": sh})
    assert out["input_ids"].shape == (2, 8, 16)
    assert out["input_ids"].sharding.spec == P(None, ("data", "fsdp"))
    barrier()  # no-op single process
