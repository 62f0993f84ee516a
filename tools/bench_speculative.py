"""Speculative decoding bench on the real chip (VERDICT r3 item 7).

inference/speculative.py is exactness-tested but had no TPU number. This
measures, at serving shapes:

  plain       make_generate_fn tok/s (the baseline the speculation must beat)
  spec@gN/L   speculative_generate with a TRUNCATED-LAYER draft (the
              target's first L layers + shared embed/head — a stand-in with
              a production draft's cost profile), gamma=N: end-to-end tok/s,
              verify rounds, and realized tokens/round (= accept behavior)

With random weights the draft/target agreement is the floor for a real
distilled draft, so the report also derives the BREAKEVEN tokens/round from
the measured plain step cost vs the speculative round cost — what a real
draft must achieve for speculation to win on this chip.

Usage: python tools/bench_speculative.py [--arch llama-1b] [--batch 16]
           [--steps 192] [--gammas 3,7] [--draft-layers 4] [--greedy]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from tts_max_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import dataclasses  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tts_max_tpu.inference.generate import make_generate_fn  # noqa: E402
from tts_max_tpu.inference.speculative import (  # noqa: E402
    make_speculative_generate_fn,
)
from tts_max_tpu.models import llama, quantization  # noqa: E402
from tts_max_tpu.ops.sampling import SamplingParams  # noqa: E402
from tts_max_tpu.utils.profiling import fetch_rtt  # noqa: E402

SPEECH_WINDOW = (128264, 65544)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="llama-1b")
    ap.add_argument("--quantize", default="int8",
                    choices=["int8", "int4", "none"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=192)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--gammas", default="3,7")
    ap.add_argument("--draft-layers", type=int, default=4)
    ap.add_argument("--greedy", action="store_true",
                    help="temperature 0 (prefix-match acceptance)")
    ap.add_argument("--no-window", action="store_true")
    ap.add_argument("--model_dir", default="",
                    help="TRAINED target (HF serving dir) instead of "
                    "random init — the realized-acceptance measurement "
                    "VERDICT r4 asked for")
    ap.add_argument("--draft_dir", default="",
                    help="TRAINED draft (tools/distill_draft.py output) "
                    "instead of the truncated-layer stand-in")
    ap.add_argument("--dataset_dir", default="",
                    help="vectorized dataset: prompts become "
                    "in-distribution prefixes instead of random tokens")
    args = ap.parse_args()

    bits = {"int8": 8, "int4": 4, "none": None}[args.quantize]
    tokenizer = None
    if args.model_dir:
        from tts_max_tpu.core.tokenization import (
            build_byte_tokenizer,
            build_tokenizer,
        )
        from tts_max_tpu.models import hf_import

        try:
            tokenizer = build_tokenizer(
                args.model_dir, expected_vocab_size=None
            )
        except Exception:  # serving dirs carry no tokenizer files
            tokenizer = build_byte_tokenizer()
        raw, cfg = hf_import.load_model_from_hf_dir(args.model_dir)
        cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
        raw = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), raw)
        params = (
            jax.jit(lambda p: quantization.quantize_llama_params(p, bits=bits))(raw)
            if bits else raw
        )
    else:
        cfg = llama.config_for_architecture(
            args.arch, max_seq_len=args.prompt_len + args.steps + 16
        )

        def init(key):
            p = llama.init_params(key, cfg, dtype=jnp.bfloat16)
            if bits:
                p = quantization.quantize_llama_params(p, bits=bits)
            return p

        params = jax.jit(init)(jax.random.PRNGKey(0))

    if args.draft_dir:
        from tts_max_tpu.models import hf_import

        draw, draft_cfg = hf_import.load_model_from_hf_dir(args.draft_dir)
        draft_cfg = dataclasses.replace(draft_cfg, dtype=jnp.bfloat16)
        draw = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), draw)
        draft_params = (
            jax.jit(lambda p: quantization.quantize_llama_params(p, bits=bits))(draw)
            if bits else draw
        )
        dl = draft_cfg.n_layers
    else:
        # truncated-layer draft: first L stacked layers, shared embed/head
        dl = args.draft_layers
        draft_cfg = dataclasses.replace(cfg, n_layers=dl)
        draft_params = dict(params)
        draft_params["layers"] = jax.tree.map(
            lambda x: x[:dl], params["layers"]
        )

    if args.no_window:
        window = None
    elif tokenizer is not None:
        from tts_max_tpu.core.tokenization import speech_vocab

        window = speech_vocab(tokenizer).generation_window()
    else:
        window = SPEECH_WINDOW
    if window and window[0] + window[1] > cfg.vocab_size:
        window = None
    lo = window[0] if window else 3
    sp = SamplingParams(
        temperature=0.0 if args.greedy else 0.8, top_k=50,
        repetition_penalty=1.1, frequency_penalty=0.3,
    )
    b, s, n = args.batch, args.prompt_len, args.steps
    cache_len = s + n + 8
    rng = np.random.default_rng(0)
    if args.dataset_dir:
        # in-distribution prompts: real prompt+speech prefixes from the
        # vectorized set the target was trained on
        from tts_max_tpu.core.config import DatasetConfig
        from tts_max_tpu.core.tokenization import build_byte_tokenizer
        from tts_max_tpu.data import codes_io
        from tts_max_tpu.data.datasets import TtsFineTuningDataset
        import os

        tok = tokenizer or build_byte_tokenizer()
        codes, samples, spans, _ = (
            codes_io.load_and_filter_audio_codes_and_samples(
                args.dataset_dir, "train", DatasetConfig()
            )
        )
        ds = TtsFineTuningDataset(
            os.path.basename(args.dataset_dir), samples, codes, spans, tok,
            max_seq_len=4 * s + 64,
        )
        from tts_max_tpu.core.tokenization import speech_vocab as _sv

        sv = _sv(tok)
        # cut each prompt just AFTER <|speech_start|> plus a few speech
        # tokens, so constrained generation starts ON the speech manifold
        # (a fixed byte-token cut lands mid-chat-template and the window
        # constraint then forces near-uniform logits — acceptance becomes
        # meaningless)
        toks_np = np.zeros((b, s), np.int32)
        lens_np = np.zeros((b,), np.int32)
        for r in range(b):
            ids = np.asarray(ds[r % len(ds)]["input_ids"], np.int32)
            starts = np.nonzero(ids == sv.speech_start_id)[0]
            cut = (int(starts[0]) + 9) if len(starts) else len(ids)
            cut = min(cut, len(ids), s)
            toks_np[r, :cut] = ids[:cut]
            lens_np[r] = cut
        toks = jnp.asarray(toks_np)
        lens = jnp.asarray(lens_np)
    else:
        toks = jnp.asarray(
            rng.integers(lo, lo + 1000, (b, s)).astype(np.int32)
        )
        lens = jnp.full((b,), s, jnp.int32)
    rtt = fetch_rtt()
    print(f"bench_speculative: {args.arch} {args.quantize} B={b} "
          f"steps={n} draft={dl}L rtt={rtt * 1e3:.1f}ms",
          file=sys.stderr, flush=True)

    def timed(fn, *fargs, iters=3):
        res = fn(*fargs)
        rounds = int(res.steps)  # scalar fetch serializes
        best = None
        for i in range(iters):
            t0 = time.perf_counter()
            res = fn(*fargs)
            rounds = int(res.steps)
            dt = time.perf_counter() - t0 - rtt
            best = dt if best is None else min(best, dt)
        gen = int(np.sum(np.asarray(res.num_generated)))
        return best, rounds, gen

    plain = make_generate_fn(
        cfg, sp, max_new_tokens=n, eos_id=-1, cache_len=cache_len,
        vocab_window=window,
    )
    dt, rounds, gen = timed(plain, params, toks, lens, jax.random.PRNGKey(1))
    plain_tps = gen / dt
    plain_step_ms = dt / rounds * 1e3
    print(f"plain: {plain_tps:8.0f} tok/s  ({plain_step_ms:.2f} ms/step)",
          flush=True)

    for gamma in [int(g) for g in args.gammas.split(",") if g]:
        spec = make_speculative_generate_fn(
            cfg, draft_cfg, sp, max_new_tokens=n, eos_id=-1, gamma=gamma,
            cache_len=cache_len, vocab_window=window,
        )
        try:
            dt, rounds, gen = timed(
                spec, params, draft_params, toks, lens, jax.random.PRNGKey(2)
            )
        except Exception as e:  # noqa: BLE001
            print(f"spec@g{gamma}/{dl}L: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        tps = gen / dt
        tpr = gen / b / max(rounds, 1)
        round_ms = dt / max(rounds, 1) * 1e3
        breakeven = round_ms / plain_step_ms
        print(
            f"spec@g{gamma}/{dl}L: {tps:8.0f} tok/s  "
            f"({rounds} rounds, {tpr:.2f} tok/round realized, "
            f"round {round_ms:.2f} ms, breakeven {breakeven:.2f} tok/round)"
            f"  -> {'WIN' if tps > plain_tps else 'LOSS'} "
            f"{tps / plain_tps:.2f}x vs plain",
            flush=True,
        )


if __name__ == "__main__":
    main()
