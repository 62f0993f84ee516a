"""Distill a shallow DRAFT SpeechLM from a target — the speculative-decode
recipe (BENCHMARKS.md: breakeven needs ~2.6 accepted tokens/round at γ=3;
a random draft realizes ~1.0, a distilled one is the production path).

Initializes the draft from the target's first --draft_layers layers
(training/distill.truncated_draft), trains it to match the target's token
distribution (blockwise forward KL) on a vectorized TTS dataset, and writes
an HF-format draft dir that serving can load next to the target.

Usage:
  python tools/distill_draft.py --dataset_dir ds --output_dir draft \
      [--model_dir serving | --architecture llama-1b] [--draft_layers 4] \
      [--steps 2000] [--batch 8] [--seq 512]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from tts_max_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from tts_max_tpu.core.config import DatasetConfig
    from tts_max_tpu.core.tokenization import (
        build_byte_tokenizer,
        build_tokenizer,
    )
    from tts_max_tpu.data import codes_io
    from tts_max_tpu.data.datasets import TtsFineTuningDataset
    from tts_max_tpu.models import hf_import, llama
    from tts_max_tpu.training import distill
    from tts_max_tpu.utils.logging import get_logger, setup_logging

    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--model_dir", default="",
                        help="target HF serving dir; empty = random init")
    parser.add_argument("--architecture", default="llama-tiny")
    parser.add_argument("--draft_layers", type=int, default=4)
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--seq", type=int, default=512)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--chunk", type=int, default=256)
    parser.add_argument("--log_steps", type=int, default=20)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    setup_logging(0)
    log = get_logger("distill_draft")

    if args.model_dir and os.path.isdir(args.model_dir):
        try:
            tokenizer = build_tokenizer(
                args.model_dir, expected_vocab_size=None
            )
        except Exception:  # serving dirs may carry no tokenizer files
            tokenizer = build_byte_tokenizer()
        params, cfg = hf_import.load_model_from_hf_dir(args.model_dir)
        params = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.bfloat16), params
        )
        cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    else:
        tokenizer = build_byte_tokenizer()
        cfg = llama.config_for_architecture(
            args.architecture, vocab_size=len(tokenizer)
        )
        if cfg.dim >= 1024:
            cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
        params = jax.jit(
            lambda k: llama.init_params(k, cfg, dtype=cfg.dtype)
        )(jax.random.PRNGKey(args.seed))
        log.warning("No --model_dir: distilling against a RANDOM target "
                    "(recipe smoke mode).")
    cfg = dataclasses.replace(cfg, max_seq_len=args.seq)

    codes, samples, spans, _ = codes_io.load_and_filter_audio_codes_and_samples(
        args.dataset_dir, "train", DatasetConfig()
    )
    ds = TtsFineTuningDataset(
        os.path.basename(args.dataset_dir), samples, codes, spans, tokenizer,
        max_seq_len=args.seq,
    )
    log.info("Distillation dataset: %d samples", len(ds))
    pad_id = tokenizer.pad_token_id or 0

    def make_batch(rng):
        idxs = rng.integers(0, len(ds), args.batch)
        toks = np.full((args.batch, args.seq), pad_id, np.int32)
        mask = np.zeros((args.batch, args.seq), bool)
        for r, i in enumerate(idxs):
            ids = ds[int(i)]["input_ids"][: args.seq]
            toks[r, : len(ids)] = ids
            mask[r, : len(ids)] = True
        return jnp.asarray(toks), jnp.asarray(mask)

    draft, draft_cfg = distill.truncated_draft(
        params, cfg, args.draft_layers
    )
    tx = optax.adamw(args.lr, b1=0.9, b2=0.95, weight_decay=0.01,
                     mu_dtype=jnp.bfloat16)
    opt_state = jax.jit(tx.init)(draft)
    step_fn = distill.make_distill_step(
        draft_cfg, cfg, tx, chunk_size=args.chunk
    )

    rng = np.random.default_rng(args.seed)
    t0 = time.perf_counter()
    for step in range(1, args.steps + 1):
        toks, mask = make_batch(rng)
        draft, opt_state, loss, gnorm = step_fn(
            draft, params, opt_state, toks, mask
        )
        if step % args.log_steps == 0 or step == 1:
            log.info("step %d: kl %.4f grad_norm %.2f (%.0f tok/s)",
                     step, float(loss), float(gnorm),
                     step * args.batch * args.seq
                     / (time.perf_counter() - t0))

    os.makedirs(args.output_dir, exist_ok=True)
    hf_import.save_model_to_hf_dir(draft, draft_cfg, args.output_dir)
    log.info("Draft (%d layers) written to %s — serve with "
             "speculative_generate(target, draft, ...)",
             args.draft_layers, args.output_dir)


if __name__ == "__main__":
    main()
