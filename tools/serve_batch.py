"""Batch/throughput TTS serving CLI over the continuous-batching engine.

The reference serves batched generation through a vLLM server
(/root/reference/tts/training/rlhf/run_rlhf_combine.sh:60); this is the
TPU-native equivalent as a CLI: a JSONL of requests drives the
PagedInferenceEngine (mid-flight admission, paged KV, automatic prefix
caching, per-request sampling, speech-window constrained decode), and every
completion is vocoded to a wav.

Request JSONL fields (one object per line):
  text                 (required) text to synthesize
  prompt_wav           optional voice-prompt wav path (shared prompts hit
                       the prefix cache and share KV blocks)
  prompt_transcript    transcript of the voice prompt
  temperature/top_k/top_p/repetition_penalty/frequency_penalty/max_tokens
                       optional per-request sampling overrides
  output               optional wav path (default <out_dir>/req_<i>.wav)

Usage:
  python tools/serve_batch.py --model_dir serving --requests reqs.jsonl \
      --out_dir wavs [--quantize int8] [--max_batch 16] [--codec_...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tts_max_tpu.core import prompting
from tts_max_tpu.core.constants import CODEC_SAMPLE_RATE, CODEC_TOKEN_RATE
from tts_max_tpu.core.tokenization import build_byte_tokenizer, speech_vocab
from tts_max_tpu.data.audio_io import load_wav, save_wav
from tts_max_tpu.inference.engine import InferenceEngine, PagedInferenceEngine
from tts_max_tpu.models import hf_import
from tts_max_tpu.ops.sampling import SamplingParams
from tts_max_tpu.utils.logging import get_logger, setup_logging

log = get_logger("serve_batch")


def _request_sampling(req: dict, default: SamplingParams) -> SamplingParams:
    keys = ("temperature", "top_k", "top_p", "repetition_penalty",
            "frequency_penalty")
    if not any(k in req for k in keys):
        return default
    return SamplingParams(**{
        **{k: getattr(default, k) for k in keys},
        **{k: req[k] for k in keys if k in req},
    })


def main(argv=None):
    from tts_max_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--requests", required=True, help="JSONL of requests")
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--codec_decoder", default="")
    parser.add_argument("--codec_encoder", default="")
    parser.add_argument("--max_batch", type=int, default=8)
    parser.add_argument("--max_len", type=int, default=2048)
    parser.add_argument("--block_size", type=int, default=64)
    parser.add_argument("--max_tokens", type=int, default=1792)
    parser.add_argument("--quantize", nargs="?", const="int8", default="",
                        choices=["", "int8", "int4", "int4-g64", "int4-g128"])
    parser.add_argument("--quantized_kv", action="store_true")
    parser.add_argument("--no_prefix_cache", action="store_true")
    parser.add_argument("--no_constrain", action="store_true",
                        help="disable the speech-window sampling constraint")
    parser.add_argument(
        "--steps_per_dispatch", type=int, default=0,
        help="decode steps per jitted dispatch (K-step lax.scan). >1 "
        "amortizes the ~28ms host round-trip and is required for int4 "
        "weights to run at speed; a freed slot idles at most K-1 steps",
    )
    parser.add_argument("--no_warmup", action="store_true",
                        help="skip the startup compile warmup")
    parser.add_argument(
        "--engine", choices=["contiguous", "paged"], default="contiguous",
        help="KV layout: 'contiguous' is the measured-fastest mode "
        "(BENCHMARKS.md serving table); 'paged' (vLLM block pool, "
        "~72%% of same-load contiguous throughput with delta-KV dispatches) "
        "admits more mixed-length traffic per GB and enables the "
        "prefix cache",
    )
    parser.add_argument(
        "--prefill_ahead", action="store_true",
        help="under saturation, prefill queued requests ahead of "
        "slot availability (park buffer) and emit their first token "
        "immediately — cuts TTFT; costs park-buffer HBM "
        "(BENCHMARKS.md round-5 serving rows)",
    )
    parser.add_argument("--park_rows", type=int, default=0,
                        help="prefill-ahead park rows (0 = max_batch); "
                        "size to the expected queue depth for lowest TTFT")
    parser.add_argument("--park_len", type=int, default=0,
                        help="park buffer token capacity "
                        "(0 = min(512, max_len))")
    parser.add_argument("--park_groups_per_poll", type=int, default=0,
                        help="throttle parking (0 = park the whole "
                        "eligible queue at once)")
    parser.add_argument(
        "--admission_policy", choices=["fifo", "shortest"], default="fifo",
        help="'shortest' = shortest-job-first admission (better TTFT "
        "under saturation; long requests can starve under overload)",
    )
    parser.add_argument("--no_staged_cache", action="store_true",
                        help="disable staged (occupancy-sized) dispatches")
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args(argv)
    setup_logging(0)
    os.makedirs(args.out_dir, exist_ok=True)

    tokenizer = build_byte_tokenizer()
    sv = speech_vocab(tokenizer)
    params, cfg = hf_import.load_serving_model(args.model_dir)
    if args.quantize and hf_import.is_quantized_dir(args.model_dir):
        log.warning("model dir is pre-quantized; ignoring --quantize")
        args.quantize = ""
    if args.quantize:
        from tts_max_tpu.models import quantization

        params = quantization.quantize_for_serving(
            jax.tree_util.tree_map(jnp.asarray, params), args.quantize
        )
        log.info("Quantized weights (%s, per-channel).", args.quantize)
    from tools.serving_inference import build_codec

    encoder, decoder = build_codec(args)

    window = None if args.no_constrain else sv.generation_window()
    if window and window[0] + window[1] > cfg.vocab_size:
        log.warning("speech window %s exceeds model vocab %d; disabling the "
                    "constraint", window, cfg.vocab_size)
        window = None
    kw = dict(
        max_batch=args.max_batch, max_len=args.max_len,
        quantized_kv=args.quantized_kv, vocab_window=window,
        steps_per_dispatch=args.steps_per_dispatch or (
            32 if getattr(args, "prefill_ahead", False) else 16
        ),
        staged_cache=not args.no_staged_cache,
        admission_policy=args.admission_policy,
        prefill_ahead=args.prefill_ahead,
        park_rows=args.park_rows or None,
        park_len=args.park_len or None,
        park_groups_per_poll=args.park_groups_per_poll,
    )
    dev_params = jax.tree_util.tree_map(jnp.asarray, params)
    if args.engine == "paged":
        engine = PagedInferenceEngine(
            dev_params, cfg, block_size=args.block_size,
            enable_prefix_cache=not args.no_prefix_cache, **kw
        )
    else:
        if not args.no_prefix_cache:
            log.info("contiguous engine: prefix caching is paged-only "
                     "(shared voice prompts re-prefill each time)")
        engine = InferenceEngine(dev_params, cfg, **kw)

    if not args.no_warmup:
        log.info("Warmup: compiling prefill/decode programs ...")
        t_w = time.perf_counter()
        engine.warmup()
        log.info("Warmup done in %.1fs", time.perf_counter() - t_w)

    requests = [json.loads(l) for l in open(args.requests) if l.strip()]
    from tts_max_tpu.data import normalization

    normalizer = normalization.create()
    default_sp = SamplingParams()
    meta: dict[int, dict] = {}
    t0 = time.perf_counter()
    for i, req in enumerate(requests):
        speech_ids: list[int] = []
        if req.get("prompt_wav"):
            wav, _ = load_wav(req["prompt_wav"], CODEC_SAMPLE_RATE)
            speech_ids = np.asarray(
                encoder.encode(req["prompt_wav"], wav)
            ).ravel().tolist()
        # per-request language tag, else detection (reference
        # text_normalization.py:73-90 routes by lingua detection)
        text = normalizer.normalize(req["text"], req.get("language") or None)
        prompt = prompting.compile_inference_prompt(
            req.get("prompt_transcript", ""), text, speech_ids,
            req.get("voice_description", ""), True,
        )
        input_ids = np.asarray(
            tokenizer.encode(prompt, add_special_tokens=True), dtype=np.int32
        )
        budget = min(args.max_tokens, req.get("max_tokens", args.max_tokens),
                     args.max_len - len(input_ids))
        if budget <= 0:
            # one oversized request must not abort the whole batch: skip it
            log.warning(
                "request %d skipped: prompt %d tokens leaves no budget "
                "within max_len %d", i, len(input_ids), args.max_len,
            )
            continue
        rid = engine.submit(
            input_ids,
            max_new_tokens=budget,
            eos_id=sv.speech_end_id,
            sampling_seed=args.seed + i,
            sampling=_request_sampling(req, default_sp),
            min_tokens=req.get("min_tokens", 0),
        )
        meta[rid] = {"idx": i, "speech_ids": speech_ids,
                     "output": req.get("output",
                                       f"{args.out_dir}/req_{i}.wav")}

    completions = engine.run()
    gen_time = time.perf_counter() - t0
    total_tokens = sum(len(c.tokens) for c in completions)
    log.info(
        "Generated %d completions, %d tokens in %.1fs (%.0f tok/s)",
        len(completions), total_tokens, gen_time, total_tokens / gen_time,
    )
    if hasattr(engine, "prefix_cache_hits"):
        log.info("prefix cache: %d block hits / %d misses",
                 engine.prefix_cache_hits, engine.prefix_cache_misses)

    for c in completions:
        m = meta[c.request_id]
        gen_codes = sv.codes_from_tokens(np.asarray(c.tokens))
        all_codes = np.concatenate(
            [np.asarray(m["speech_ids"], dtype=np.int64), gen_codes]
        )
        if len(all_codes) == 0:
            log.warning("request %d produced no speech tokens", m["idx"])
            continue
        wav = decoder.decode(all_codes)
        skip = int(len(m["speech_ids"]) / CODEC_TOKEN_RATE * CODEC_SAMPLE_RATE)
        save_wav(m["output"], wav[:, skip:], CODEC_SAMPLE_RATE)
        log.info("Wrote %s (%.2fs audio)", m["output"],
                 (wav.shape[1] - skip) / CODEC_SAMPLE_RATE)


if __name__ == "__main__":
    main()
