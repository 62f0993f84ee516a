"""Tests: text SFT dataset, metrics logging, profiling counters, quality factory."""

import json

import numpy as np
import pytest

from tts_max_tpu.core import constants, tokenization
from tts_max_tpu.data.datasets import TextFineTuningDataset, parse_oig_sample
from tts_max_tpu.inference import quality
from tts_max_tpu.utils.metrics_logging import MetricsLogger, rewrite_logs_for_wandb
from tts_max_tpu.utils.profiling import Throughput


def test_parse_oig():
    msgs = parse_oig_sample(
        "<human>: What is 2+2? <bot>: Four. <human>: Thanks <bot>: Welcome."
    )
    assert [m["role"] for m in msgs] == ["user", "assistant", "user", "assistant"]
    assert msgs[1]["content"] == "Four."
    with pytest.raises(ValueError):
        parse_oig_sample("no prefix here")


def test_text_finetuning_dataset():
    tok = tokenization.build_byte_tokenizer(codebook_size=16)
    ds = TextFineTuningDataset(
        [
            {"messages": [
                {"role": "user", "content": "hi"},
                {"role": "assistant", "content": "hello there"},
            ]},
            {"text": "<human>: q <bot>: a"},
        ],
        tok,
        max_seq_len=128,
    )
    item = ds[0]
    ids, labels = item["input_ids"], item["labels"]
    eh = tok.convert_tokens_to_ids(constants.END_HEADER_ID)
    last = np.nonzero(ids == eh)[0][-1]
    assert (labels[: last + 1] == -100).all()
    np.testing.assert_array_equal(labels[last + 1 :], ids[last + 1 :])
    # response region contains the assistant text bytes
    assert "hello there" in tok.decode(ids[last + 1 :])
    item2 = ds[1]
    assert item2["tokens_processed"] > 0


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(str(tmp_path), is_main=True)
    logger.log(1, {"train_loss": 2.0, "val_loss": 1.5, "other": 3})
    logger.log(2, {"train_loss": 1.8})
    logger.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["train/loss"] == 2.0
    assert lines[0]["val/loss"] == 1.5
    assert lines[0]["other"] == 3
    assert lines[1]["step"] == 2
    # non-main is a no-op
    MetricsLogger(str(tmp_path / "x"), is_main=False).log(1, {})


def test_rewrite_logs():
    out = rewrite_logs_for_wandb({"train_loss": 1, "eval_acc": 2, "plain": 3})
    assert set(out) == {"train/loss", "eval/acc", "plain"}


def test_throughput_counters():
    t = Throughput()
    t.record(100, 1.0)
    t.record(100, 1.0)
    rates = t.rates()
    assert rates["tokens_per_sec"] > 0
    assert rates["audio_sec_per_sec"] > 0


def test_quality_factory():
    assert isinstance(quality.create("none"), quality.NoOpQualityValidator)
    with pytest.raises(ValueError):
        quality.create("bogus")
    combos = quality.all_test_combinations({"a.wav": "ta", "b.wav": "tb"}, ["p1", "p2"])
    assert len(combos) == 4
    s0 = quality.shard_combinations(combos, 0, 2)
    s1 = quality.shard_combinations(combos, 1, 2)
    assert len(s0) + len(s1) == 4 and s0 + s1 == combos
    assert len(quality.DEFAULT_PHRASES) == 21
