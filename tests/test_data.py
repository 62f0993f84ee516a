"""Data plane tests: tokenization, codes IO format, datasets, collate, loader."""

import json
import os

import numpy as np
import pytest

from tts_max_tpu.core import constants, prompting, tokenization
from tts_max_tpu.data import codes_io, collate, filtering
from tts_max_tpu.data.datasets import (
    CombinedDataset,
    TtsFineTuningDataset,
    TtsPretrainingDataset,
    WeightedDataset,
)
from tts_max_tpu.data.loader import DataLoader
from tts_max_tpu.data.normalization import BasicTextNormalizer
from tts_max_tpu.data.samples import Sample


@pytest.fixture(scope="module")
def tok():
    return tokenization.build_byte_tokenizer(codebook_size=65536)


def test_prompting_format():
    p = prompting.compile_training_prompt("hello", [3, 7])
    assert p == (
        "Convert the text to speech:<|text_prompt_start|>hello<|text_prompt_end|>"
        "\n<|speech_start|><|s_3|><|s_7|><|speech_end|>"
    )
    ip = prompting.compile_inference_prompt("ref text", "say this", [5])
    assert ip.endswith("<|speech_start|><|s_5|>")
    assert "ref text say this" in ip
    with pytest.raises(ValueError):
        prompting.compile_training_prompt("x", [])


def test_voice_description_prompt():
    p = prompting.compile_training_prompt("hi", [1], voice_description="a deep voice")
    assert "<|voice_description_start|>a deep voice<|voice_description_end|>" in p
    assert p.startswith("Given the following voice description ")


def test_byte_tokenizer_roundtrip(tok):
    text = "Convert the text to speech:<|text_prompt_start|>hi<|text_prompt_end|>\n<|speech_start|><|s_42|><|speech_end|>"
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    # speech token is a single id
    sid = tok.convert_tokens_to_ids("<|s_42|>")
    assert ids.count(sid) == 1


def test_speech_vocab_dense_maps(tok):
    sv = tokenization.speech_vocab(tok)
    codes = np.array([0, 1, 65535, 123], dtype=np.int64)
    toks = sv.tokens_from_codes(codes)
    back = sv.codes_from_tokens(toks)
    np.testing.assert_array_equal(back, codes)
    # non-speech ids are dropped
    mixed = np.concatenate([[sv.speech_start_id], toks, [sv.speech_end_id]])
    np.testing.assert_array_equal(sv.codes_from_tokens(mixed), codes)


def test_extract_speech_ids():
    assert tokenization.extract_speech_ids("<|s_1|>x<|s_23|>") == [1, 23]


def test_extension_tokens_sorted_lexicographically():
    toks = tokenization.extension_tokens(100)
    assert toks == sorted(toks)
    assert len(toks) == 108


def _mk_samples(n, dataset="ds"):
    return [
        Sample.from_json(
            {
                "wav_path": f"w{i}.wav",
                "transcript": f"hello world {i}",
                "language": "en",
                "duration": 2.0,
                "sample_rate": 16000,
            },
            dataset,
        )
        for i in range(n)
    ]


def test_codes_io_roundtrip_and_merge(tmp_path):
    d = str(tmp_path)
    # two shards in the reference format
    codes_io.write_shard(d, "train", np.arange(10, dtype=np.int32),
                         np.array([0, 4, 7]), _mk_samples(3), rank=0)
    codes_io.write_shard(d, "train", np.arange(100, 106, dtype=np.int32),
                         np.array([0, 2]), _mk_samples(2), rank=1)
    # raw (headerless) codes file — reference reads with bare np.memmap
    sz = os.path.getsize(os.path.join(d, "train_codes_0.npy"))
    assert sz == 10 * 4  # no npy header
    info = codes_io.merge_shards(d, "train")
    assert info == {"num_shards": 2, "total_codes": 16, "total_samples": 5}
    codes_io.validate_merged(d, "train")
    codes, index, lines = codes_io.load_codes(d, "train")
    np.testing.assert_array_equal(index, [0, 4, 7, 10, 12])
    np.testing.assert_array_equal(codes[10:], [100, 101, 102, 103, 104, 105])


def test_load_and_filter(tmp_path):
    d = str(tmp_path)
    samples = _mk_samples(3)
    samples[1].transcript = ""
    samples[1].voice_description = "desc"  # keeps Sample valid but filtered
    codes_io.write_shard(d, "val", np.arange(9, dtype=np.int32),
                         np.array([0, 3, 6]), samples)
    codes, kept, spans, status = codes_io.load_and_filter_audio_codes_and_samples(
        d, "val", None, extra_filters=[filtering.filter_empty_transcript]
    )
    assert len(kept) == 2
    assert spans == [(0, 3), (6, 9)]
    assert status["total_filtered"] == 1


def test_finetuning_dataset(tok, tmp_path):
    codes = np.array([5, 6, 7, 8, 9, 10], dtype=np.int32)
    indexes = [(0, 3), (3, 6)]
    ds = TtsFineTuningDataset(
        "ds", _mk_samples(2), codes, indexes, tok, max_seq_len=256,
        text_normalizer=BasicTextNormalizer(),
    )
    item = ds[0]
    ids, labels = item["input_ids"], item["labels"]
    assert item["audio_processed_sec"] == pytest.approx(3 / 50)
    # labels masked before <|speech_start|>
    sep = np.nonzero(ids == tok.convert_tokens_to_ids(constants.SPEECH_START_TOKEN))[0][0]
    assert (labels[:sep] == -100).all()
    np.testing.assert_array_equal(labels[sep:], ids[sep:])
    # speech ids appear as single tokens
    sv = tokenization.speech_vocab(tok)
    np.testing.assert_array_equal(sv.codes_from_tokens(ids), [5, 6, 7])


def test_pretraining_dataset(tok, tmp_path):
    d = str(tmp_path)
    flat = np.arange(100, dtype=np.int32) % 65536
    arr = np.memmap(os.path.join(d, "train_pretraining_codes.npy"),
                    dtype=np.int32, mode="w+", shape=(100,))
    arr[:] = flat
    arr.flush()
    sv = tokenization.speech_vocab(tok)
    ds = TtsPretrainingDataset(d, "train", max_seq_len=32, speech_vocab=sv)
    assert len(ds) == 2
    item = ds[1]
    np.testing.assert_array_equal(sv.codes_from_tokens(item["input_ids"]), flat[32:64])
    np.testing.assert_array_equal(item["labels"], item["input_ids"])


def test_combined_dataset_weighting():
    class Fixed:
        def __init__(self, tag, n):
            self.tag, self.n = tag, n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return {"v": f"{self.tag}{i}"}

    ds = CombinedDataset(
        [WeightedDataset("b", Fixed("b", 4), 0.5), WeightedDataset("a", Fixed("a", 2), 2.0)]
    )
    # sorted by name: a (2*2=4 effective), b (4*0.5=2) => total 6
    assert len(ds) == 6
    assert ds[0] == {"v": "a0", "source": "a"}
    assert ds[2] == {"v": "a0", "source": "a"}  # epoch wraparound
    assert ds[4] == {"v": "b0", "source": "b"}
    ds.enable_fast_forwarding()
    assert ds[3] == {}
    ds.disable_fast_forwarding()
    with pytest.raises(IndexError):
        ds[6]


def test_collate_bucketing():
    feats = [
        {
            "input_ids": np.arange(70, dtype=np.int32),
            "labels": np.arange(70, dtype=np.int32),
            "tokens_processed": 70,
            "audio_processed_sec": 1.0,
            "source": "x",
        },
        {
            "input_ids": np.arange(10, dtype=np.int32),
            "labels": np.arange(10, dtype=np.int32),
            "tokens_processed": 10,
            "audio_processed_sec": 0.5,
            "source": "x",
        },
    ]
    out = collate.collate(feats, pad_token_id=0, max_seq_len=2048)
    assert out["input_ids"].shape == (2, 128)  # smallest bucket >= 70
    assert (out["labels"][1, 10:] == -100).all()
    assert (out["input_ids"][1, 10:] == 0).all()
    assert collate.collate([{}, {}], 0) == {}
    pretty = collate.prettify_batch(out)
    assert set(pretty) == {"input_ids", "labels"}


def test_loader_determinism_and_sharding():
    class Ds:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {
                "input_ids": np.array([i], dtype=np.int32),
                "labels": np.array([i], dtype=np.int32),
                "tokens_processed": 1,
                "audio_processed_sec": 0.0,
            }

    def cf(items):
        return collate.collate(items, 0, max_seq_len=128)

    # two processes must jointly cover each global batch, deterministically
    l0 = DataLoader(Ds(), 8, cf, seed=3, process_index=0, process_count=2)
    l1 = DataLoader(Ds(), 8, cf, seed=3, process_index=1, process_count=2)
    b0 = [b["input_ids"][:, 0].tolist() for b in l0.batches(0)]
    b1 = [b["input_ids"][:, 0].tolist() for b in l1.batches(0)]
    assert len(b0) == 4 and all(len(x) == 4 for x in b0)
    seen = sorted(sum(b0, []) + sum(b1, []))
    assert seen == list(range(32))
    # same seed, same order
    b0_again = [b["input_ids"][:, 0].tolist() for b in l0.batches(0)]
    assert b0 == b0_again
    # different epoch, different order
    b0_e1 = [b["input_ids"][:, 0].tolist() for b in l0.batches(1)]
    assert b0 != b0_e1


def test_loader_fast_forward_resume():
    calls = []

    class Ds:
        def __init__(self):
            self.ff = False

        def enable_fast_forwarding(self):
            self.ff = True

        def disable_fast_forwarding(self):
            self.ff = False

        def __len__(self):
            return 16

        def __getitem__(self, i):
            if self.ff:
                return {}
            calls.append(i)
            return {
                "input_ids": np.array([i], dtype=np.int32),
                "labels": np.array([i], dtype=np.int32),
                "tokens_processed": 1,
                "audio_processed_sec": 0.0,
            }

    def cf(items):
        return collate.collate(items, 0, max_seq_len=128)

    loader = DataLoader(Ds(), 4, cf, shuffle=False, seed=0)
    batches = list(loader.batches(0, skip_batches=2))
    # first two batches come back empty ({}), later ones real
    assert batches[0] == {} and batches[1] == {}
    assert batches[2]["input_ids"][:, 0].tolist() == [8, 9, 10, 11]
    assert calls == list(range(8, 16))
