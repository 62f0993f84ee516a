"""Serving-engine benchmark: continuous batching under concurrent
mixed-length load on the real chip (VERDICT r1 item 3).

The generate-path numbers in BENCHMARKS.md measure one monolithic jitted
program over a fixed batch; production serving runs the continuous-batching
engine (inference/engine.py — the vLLM role, reference
inferencing.py:77-92), whose host-side scheduling could in principle eat the
theoretical throughput. This drives PagedInferenceEngine end-to-end with a
pool of mixed-length requests and reports:

  - engine tokens/s (all generated tokens / wall-clock from first submit to
    last completion, compile excluded via a warmup round)
  - TTFT: submit -> first token observed on host, p50/p95 (granularity =
    one dispatch)
  - admission latency: submit -> prefill dispatched
  - per-request completion latency p50/p95

Usage:
  python tools/bench_engine.py [--arch llama-1b] [--quantize int8|int4|none]
      [--max-batch 64] [--steps-per-dispatch 32] [--requests 128]
      [--budget 256] [--kv int8] [--contiguous] [--no-window]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from tts_max_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tts_max_tpu.inference.engine import InferenceEngine, PagedInferenceEngine
from tts_max_tpu.models import llama, quantization
from tts_max_tpu.ops.sampling import SamplingParams

SPEECH_WINDOW = (128264, 65544)  # SpeechVocab.generation_window at 193856


def pct(xs, p):
    return float(np.percentile(np.asarray(xs), p)) if xs else float("nan")


def run_load(engine, prompts, budgets, seed=0, pipeline=True):
    """Submit everything up-front (saturation load) and drive the engine to
    completion, recording per-request submit/first-token/done timestamps.

    ``pipeline=True`` drives ``engine.run_iter()`` — the production serving
    loop, which overlaps dispatch N+1 with fetching N's blob; False drives
    ``engine.step()`` (synchronous round-trip per dispatch, the legacy
    comparison)."""
    submit_t, first_t, done_t, admit_t = {}, {}, {}, {}
    t0 = time.perf_counter()
    ids = []
    for i, (p, b) in enumerate(zip(prompts, budgets)):
        rid = engine.submit(p, int(b), eos_id=-1, sampling_seed=seed + i)
        submit_t[rid] = time.perf_counter()
        ids.append(rid)
    n_tokens = 0

    def iterate():
        if pipeline:
            yield from engine.run_iter()
        else:
            while engine.has_work():
                yield engine.step()

    for completions in iterate():
        now = time.perf_counter()
        for s in engine._slots:
            if s.request is not None:
                rid = s.request.request_id
                admit_t.setdefault(rid, now)
                if s.generated:
                    first_t.setdefault(rid, now)
        for c in completions:
            done_t[c.request_id] = now
            admit_t.setdefault(c.request_id, now)
            first_t.setdefault(c.request_id, now)
            n_tokens += len(c.tokens)
    # the engine's own first-token timestamps are authoritative (parked
    # prefill emits first tokens BEFORE a slot exists; poll-granularity
    # slot scans above remain the fallback)
    for rid, t in getattr(engine, "first_token_times", {}).items():
        if rid in first_t:
            first_t[rid] = min(first_t[rid], t)
        else:
            first_t[rid] = t
    wall = time.perf_counter() - t0
    ttft = [first_t[r] - submit_t[r] for r in ids if r in first_t]
    lat = [done_t[r] - submit_t[r] for r in ids if r in done_t]
    admit = [admit_t[r] - submit_t[r] for r in ids if r in admit_t]
    return {
        "tokens": n_tokens,
        "wall_s": wall,
        "tok_per_s": n_tokens / wall,
        "ttft_p50": pct(ttft, 50),
        "ttft_p95": pct(ttft, 95),
        "latency_p50": pct(lat, 50),
        "latency_p95": pct(lat, 95),
        "admission_p50": pct(admit, 50),
        "completed": len(done_t),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="llama-1b")
    ap.add_argument("--quantize", choices=["int8", "int4", "int4-g64", "int4-g128", "none"],
                    default="int8")
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--steps-per-dispatch", type=int, default=32)
    ap.add_argument("--requests", type=int, default=128)
    ap.add_argument("--budget", type=int, default=256)
    ap.add_argument("--max-len", type=int, default=768)
    ap.add_argument("--block-size", type=int, default=64)
    ap.add_argument("--kv", choices=["bf16", "int8"], default="bf16")
    ap.add_argument("--contiguous", action="store_true",
                    help="contiguous per-slot KV instead of paged blocks")
    ap.add_argument("--no-window", action="store_true")
    ap.add_argument("--no-pipeline", action="store_true",
                    help="drive engine.step() synchronously instead of the "
                         "pipelined run_iter() serving loop")
    ap.add_argument("--no-staged", action="store_true",
                    help="disable staged (occupancy-sized) dispatches")
    ap.add_argument("--min-stage", type=int, default=256)
    ap.add_argument("--policy", choices=["fifo", "shortest"], default="fifo")
    ap.add_argument("--prefill-ahead", action="store_true",
                    help="park queued requests' prefills ahead of slot "
                         "availability and emit first tokens immediately")
    ap.add_argument("--park-rows", type=int, default=0,
                    help="park buffer rows (0 = max_batch)")
    ap.add_argument("--park-len", type=int, default=0,
                    help="park buffer token capacity (0 = min(512, max_len))")
    ap.add_argument("--park-groups-per-poll", type=int, default=0,
                    help="throttle parking: max park groups per poll "
                         "(0 = park the whole eligible queue at once)")
    ap.add_argument("--no-delta", action="store_true",
                    help="disable delta-KV dispatches")
    ap.add_argument("--no-persistent-read-cache", action="store_true",
                    help="paged: re-gather the pool span per dispatch "
                         "instead of the persistent contiguous mirror")
    ap.add_argument("--shared-prefix", type=int, default=0,
                    help="prepend one shared N-token prefix (the common "
                         "voice prompt) to every request — the prefix-"
                         "cache showcase load (paged engines reuse its "
                         "blocks and forward only the suffix)")
    ap.add_argument("--prefix-cache", action="store_true",
                    help="paged: enable the automatic prefix cache")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = llama.config_for_architecture(args.arch, max_seq_len=args.max_len)
    # init + quantize fused in ONE jit: the bf16 tree never materializes in
    # HBM (an 8B bf16 tree alone is ~16 GB and OOMs the chip before
    # quantization can halve it)
    mode, group_size = args.quantize, None
    if mode.startswith("int4-g"):
        group_size = int(mode[len("int4-g"):])
        mode = "int4"
    bits = {"int8": 8, "int4": 4}.get(mode)

    def init(k):
        p = llama.init_params(k, cfg, dtype=jnp.bfloat16)
        if bits is not None:
            p = quantization.quantize_llama_params(
                p, bits=bits, group_size=group_size
            )
        return p

    params = jax.jit(init)(jax.random.PRNGKey(0))
    window = None if args.no_window else SPEECH_WINDOW
    sp = SamplingParams(temperature=0.8, top_k=50, repetition_penalty=1.1,
                        frequency_penalty=0.3)

    kw = dict(
        max_batch=args.max_batch, max_len=args.max_len, sp=sp,
        quantized_kv=args.kv == "int8", vocab_window=window,
        steps_per_dispatch=args.steps_per_dispatch,
        staged_cache=not args.no_staged, min_stage=args.min_stage,
        admission_policy=args.policy, delta_kv=not args.no_delta,
        prefill_ahead=args.prefill_ahead,
        park_rows=args.park_rows or None,
        park_len=args.park_len or None,
        park_groups_per_poll=args.park_groups_per_poll,
    )
    if args.contiguous:
        engine = InferenceEngine(params, cfg, **kw)
    else:
        engine = PagedInferenceEngine(
            params, cfg, block_size=args.block_size,
            persistent_read_cache=not args.no_persistent_read_cache,
            enable_prefix_cache=args.prefix_cache, **kw
        )

    # Mixed-length load: prompts at the 64/128/256 buckets, budgets 50-100%
    # of --budget (4-10 s speech at 50 tok/s with the default 256).
    rng = np.random.default_rng(args.seed)
    lo = window[0] if window else 3
    hi = (window[0] + window[1] - 8) if window else cfg.vocab_size

    shared = (rng.integers(lo, hi, args.shared_prefix).astype(np.int32)
              if args.shared_prefix else None)

    def make_load(n, seed_off):
        prompts, budgets = [], []
        for i in range(n):
            plen = int(rng.choice([48, 96, 112, 200, 240]))
            p = rng.integers(lo, hi, plen).astype(np.int32)
            if shared is not None:
                p = np.concatenate([shared, p])
            prompts.append(p)
            budgets.append(int(rng.integers(args.budget // 2, args.budget)))
        return prompts, budgets

    # warmup: compile every (bucket, group-size) prefill variant + the
    # decode program via the engine's vLLM-style warmup, then flush any
    # residual programs with a tiny real load
    print("bench_engine: warmup/compile ...", file=sys.stderr, flush=True)
    t_w = time.perf_counter()
    engine.warmup(prompt_buckets=(64, 128, 256))
    wp, wb = make_load(min(4, args.requests), 10_000)
    run_load(engine, wp, [8] * len(wp), seed=10_000)
    print(f"bench_engine: warmup took {time.perf_counter() - t_w:.1f}s",
          file=sys.stderr, flush=True)

    prompts, budgets = make_load(args.requests, 0)
    print(
        f"bench_engine: {args.requests} reqs, budgets ~{args.budget}, "
        f"pool {args.max_batch}, K={args.steps_per_dispatch}, "
        f"{args.quantize}, kv={args.kv}, "
        f"{'contig' if args.contiguous else 'paged'}",
        file=sys.stderr, flush=True,
    )
    r = run_load(engine, prompts, budgets, seed=args.seed,
                 pipeline=not args.no_pipeline)
    assert r["completed"] == args.requests, r
    print(
        f"engine {args.arch} {args.quantize} kv={args.kv} "
        f"pool={args.max_batch} K={args.steps_per_dispatch}"
        f"{' sync' if args.no_pipeline else ''}"
        f"{' unstaged' if args.no_staged else ' staged'}"
        f"{' sjf' if args.policy == 'shortest' else ''}: "
        f"{r['tok_per_s']:.0f} tok/s  "
        f"TTFT p50 {r['ttft_p50'] * 1e3:.0f}ms p95 {r['ttft_p95'] * 1e3:.0f}ms  "
        f"latency p50 {r['latency_p50']:.2f}s p95 {r['latency_p95']:.2f}s  "
        f"({r['tokens']} toks in {r['wall_s']:.1f}s)",
        flush=True,
    )
    st = engine.stats()
    print(
        f"engine stats: decode dispatches {st['dispatches_per_stage']}, "
        f"completed {st['completed_requests']}"
        + (f", parked {st.get('parked_total', 0)}"
           if "parked_total" in st else ""),
        file=sys.stderr, flush=True,
    )


if __name__ == "__main__":
    main()
