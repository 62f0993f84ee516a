"""Distributed codec-encode job: jsonl of samples → codes/index/samples shards.

Reference parity (/root/reference/tools/data/data_vectorizer.py): per-process
static ``chunk_work`` sharding, per-sample hop padding + half-hop feature pad,
batched encoder forward, train/val split, per-rank shard outputs in the
byte-compatible format. On TPU the encode runs as one jitted program per
length bucket; wav loading/resampling stays on host CPU workers.

Usage:
  python tools/data_vectorizer.py --samples_path s.jsonl --output_dir out \
      [--codec_checkpoint ckpt.pt] [--val_ratio 0.01] [--batch_size 8] \
      [--dry_run]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tts_max_tpu.core.constants import CODEC_SAMPLE_RATE
from tts_max_tpu.data import codes_io
from tts_max_tpu.data.audio_io import load_wav
from tts_max_tpu.data.filtering import DEFAULT_LOAD_FILTERS, apply_filters
from tts_max_tpu.data.samples import Sample, read_samples_jsonl
from tts_max_tpu.models.codec import api, encoder as enc
from tts_max_tpu.models.codec.encoder import pad_wav_for_encode
from tts_max_tpu.utils.logging import get_logger, setup_logging

log = get_logger("vectorizer")


def build_encoder(args) -> api.AudioEncoder:
    if args.codec_checkpoint:
        return api.create_encoder(args.codec_checkpoint)
    # random-weights encoder for smoke runs (no checkpoint available)
    cfg = enc.tiny_encoder_config() if args.tiny else enc.EncoderConfig()
    params = enc.init_encoder(jax.random.PRNGKey(0), cfg)

    def zero_semantic(wav):
        return jnp.zeros((wav.shape[0], wav.shape[1] // cfg.hop_length,
                          cfg.semantic_input_dim))

    log.warning("No codec checkpoint: encoding with random weights (smoke mode).")
    return api.AudioEncoder(params, cfg, zero_semantic)


def encode_samples(encoder: api.AudioEncoder, samples: list[Sample], args):
    """Encode one process's samples in batches; returns (codes, index, kept).

    Batches zero-pad to the longest wav (bucketed to 1 s multiples so the
    jitted encoder compiles once per bucket) and trim each sample back to
    its own code count — the same approximation the reference's
    pad_audio_batch collate makes (data_vectorizer.py:46-81).
    """
    hop = encoder._cfg.hop_length
    all_codes: list[np.ndarray] = []
    index: list[int] = []
    kept: list[Sample] = []
    offset = 0
    t0 = time.time()
    batch_wavs: list[np.ndarray] = []
    batch_samples: list[Sample] = []

    def flush():
        nonlocal offset
        if not batch_wavs:
            return
        own_codes = [
            pad_wav_for_encode(w[None], hop).shape[1] // hop for w in batch_wavs
        ]
        bucket = ((max(len(w) for w in batch_wavs) + 16000) // 16000) * 16000
        padded = np.zeros((len(batch_wavs), bucket), dtype=np.float32)
        for i, w in enumerate(batch_wavs):
            padded[i, : len(w)] = w
        codes = np.asarray(encoder.encode(padded))
        for i, sample in enumerate(batch_samples):
            n = own_codes[i]
            all_codes.append(codes[i, :n].astype(np.int32))
            index.append(offset)
            offset += n
            kept.append(sample)
        batch_wavs.clear()
        batch_samples.clear()

    for i, sample in enumerate(samples):
        try:
            wav, _ = load_wav(sample.wav_path, CODEC_SAMPLE_RATE)
        except Exception as e:  # unreadable wavs are skipped (reference :99-104)
            log.warning("Skipping sample [%s] because: %s", sample.wav_path, e)
            continue
        batch_wavs.append(wav[0])
        batch_samples.append(sample)
        if len(batch_wavs) >= args.batch_size:
            flush()
        if (i + 1) % 100 == 0:
            log.info(
                "Encoded %d/%d samples (%.2f samples/s)",
                i + 1, len(samples), (i + 1) / (time.time() - t0),
            )
    flush()
    codes_arr = (
        np.concatenate(all_codes) if all_codes else np.zeros(0, dtype=np.int32)
    )
    return codes_arr, np.asarray(index, dtype=np.int64), kept


def main(argv=None):
    from tts_max_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--samples_path", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--codec_checkpoint", default="")
    parser.add_argument("--val_ratio", type=float, default=0.01)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--dry_run", action="store_true")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny random codec (tests/smoke)")
    parser.add_argument("--process_index", type=int, default=-1)
    parser.add_argument("--process_count", type=int, default=-1)
    args = parser.parse_args(argv)

    rank = args.process_index if args.process_index >= 0 else jax.process_index()
    world = args.process_count if args.process_count > 0 else jax.process_count()
    setup_logging(rank, silence_nonmain=False)

    samples = read_samples_jsonl(
        args.samples_path, os.path.basename(os.path.dirname(args.samples_path)) or "ds"
    )
    samples = [s for s in samples if not apply_filters(s, DEFAULT_LOAD_FILTERS)]
    if args.dry_run:
        samples = samples[: args.batch_size * world * 50]  # reference :30,191-192
    mine = codes_io.chunk_work(samples, rank, world)
    log.info("Process %d/%d encodes %d samples", rank, world, len(mine))

    encoder = build_encoder(args)
    n_val = max(1, int(len(mine) * args.val_ratio)) if len(mine) > 1 else 0
    splits = {"train": mine[n_val:], "val": mine[:n_val]}
    os.makedirs(args.output_dir, exist_ok=True)
    for split, split_samples in splits.items():
        if not split_samples:
            continue
        codes, index, kept = encode_samples(encoder, split_samples, args)
        codes_io.write_shard(
            args.output_dir, split, codes, index, kept, rank=rank
        )
        log.info(
            "Saved %s shard %d: %d samples, %d codes",
            split, rank, len(kept), len(codes),
        )


if __name__ == "__main__":
    main()
