"""Integration: checkpoint save/restore, full training loop run + resume."""

import functools

import jax
import numpy as np
import pytest

from tts_max_tpu.core.config import ExperimentConfig, from_dict
from tts_max_tpu.data.collate import collate
from tts_max_tpu.data.loader import DataLoader
from tts_max_tpu.models import llama
from tts_max_tpu.training import loop, optim, train_step as ts
from tts_max_tpu.training.checkpointing import (
    CheckpointManager,
    load_final_model,
    save_config,
    save_final_model,
)
from tts_max_tpu.utils.statistics import Statistics


class SyntheticDataset:
    """Deterministic fake LM data."""

    def __init__(self, n=64, L=24, vocab=128):
        self.n, self.L, self.vocab = n, L, vocab

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        ids = rng.integers(3, self.vocab, self.L).astype(np.int32)
        labels = ids.copy()
        labels[:4] = -100
        return {
            "input_ids": ids,
            "labels": labels,
            "tokens_processed": self.L,
            "audio_processed_sec": self.L / 50,
            "source": "synt",
        }


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = llama.tiny_config(vocab_size=128, max_seq_len=64)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    sched = optim.cosine_warmup_schedule(1e-3, 2, 100)
    tx = optim.create_optimizer(sched)
    opt_state = tx.init(params)
    return cfg, params, tx, opt_state, sched


def _loader(batch=4):
    return DataLoader(
        SyntheticDataset(),
        batch,
        functools.partial(collate, pad_token_id=0, max_seq_len=64),
        shuffle=True,
        seed=0,
    )


def _exp_config(tmp_path, save_steps=5):
    return from_dict(
        ExperimentConfig,
        {
            "training": {"logging_steps": 5, "eval_steps": 100,
                         "gradient_accumulation_steps": 2},
            "modeling": {},
            "checkpointing": {"save_steps": save_steps},
        },
    )


def test_checkpoint_roundtrip(tmp_path, tiny_setup):
    cfg, params, tx, opt_state, _ = tiny_setup
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep_last_n=2, async_save=False)
    stats = Statistics()
    stats.step = 3
    stats.record_loss("synt", 1.5)
    mgr.save(3, params, opt_state, stats)
    mgr.wait()
    assert mgr.latest_step() == 3
    p2, o2, s2 = mgr.restore(None, params, opt_state)
    assert s2.step == 3
    np.testing.assert_allclose(
        np.asarray(p2["embed"]["embedding"]),
        np.asarray(params["embed"]["embedding"]),
    )
    # weights-only restore
    p3, o3, s3 = mgr.restore(3, params, opt_state, weights_only=True)
    assert s3 is None
    mgr.close()


def test_checkpoint_pruning(tmp_path, tiny_setup):
    cfg, params, tx, opt_state, _ = tiny_setup
    mgr = CheckpointManager(str(tmp_path / "ck2"), keep_last_n=2, async_save=False)
    for step in (1, 2, 3):
        s = Statistics()
        s.step = step
        mgr.save(step, params, opt_state, s)
    mgr.wait()
    assert mgr.latest_step() == 3
    steps = sorted(mgr._mgr.all_steps())
    assert steps == [2, 3]
    mgr.close()


def test_final_model_roundtrip(tmp_path, tiny_setup):
    cfg, params, _, _, _ = tiny_setup
    path = save_final_model(str(tmp_path / "out"), params)
    p2 = load_final_model(path, params)
    np.testing.assert_allclose(
        np.asarray(p2["norm"]["scale"]), np.asarray(params["norm"]["scale"])
    )


def test_loop_runs_and_loss_drops(tmp_path, tiny_setup):
    cfg, params, tx, opt_state, sched = tiny_setup
    config = _exp_config(tmp_path)
    mgr = CheckpointManager(str(tmp_path / "ck3"), keep_last_n=2, async_save=False)
    step_fn = functools.partial(ts.train_step, cfg=cfg, tx=tx)
    eval_fn = functools.partial(ts.eval_step, cfg=cfg)
    logged = {}

    p, o, stats = loop.run(
        train_step=jax.jit(step_fn),
        eval_step=jax.jit(eval_fn),
        params=params,
        opt_state=opt_state,
        train_loader=_loader(),
        val_loader=_loader(),
        config=config,
        total_training_steps=10,
        steps_per_epoch=8,
        checkpoint_manager=mgr,
        lr_schedule=sched,
        metrics_logger=lambda step, m: logged.setdefault(step, m),
    )
    assert stats.step == 10
    assert mgr.latest_step() == 10
    assert 0 in logged and "val_loss/total" in logged[0]
    assert any("loss/total" in m for m in logged.values())
    mgr.wait()

    # ------- resume from step 10 and continue to 12 -------
    p2, o2, s2 = mgr.restore(None, params, opt_state)
    p3, o3, s3 = loop.run(
        train_step=jax.jit(step_fn),
        eval_step=None,
        params=p2,
        opt_state=o2,
        train_loader=_loader(),
        config=config,
        total_training_steps=12,
        steps_per_epoch=8,
        checkpoint_manager=None,
        statistics=s2,
    )
    assert s3.step == 12
    mgr.close()
