"""Long-form decode bench: staged caches x KV precision on the real chip.

The serving-realistic case (reference inferencing.py:21 caps generation at
1792 tokens ~= 35.8 s audio) decodes against a ~2048-slot cache whose reads
dominate HBM traffic. Measures the four combinations of
{bf16, int8} KV x {full-size, staged} cache.

Usage: python tools/bench_longform.py [--batch 64] [--steps 1760]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from tts_max_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from tts_max_tpu.utils.profiling import fetch_rtt
from tts_max_tpu.inference.generate import (
    make_generate_fn,
    make_host_staged_generate_fn,
)
from tts_max_tpu.models import llama, quantization
from tts_max_tpu.ops import sampling


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=1760)
    ap.add_argument("--prompt_len", type=int, default=64)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--skip_full", action="store_true",
                    help="skip the monolithic full-cache variants (the axon "
                         "relay drops single executions over ~1 minute)")
    ap.add_argument("--window", action="store_true",
                    help="speech-window constrained decode (serving config)")
    ap.add_argument("--bits", type=int, default=8,
                    help="weight precision: 8 or 4")
    ap.add_argument("--kv", choices=["both", "bf16", "int8"], default="both")
    ap.add_argument("--arch", default="llama-1b")
    ap.add_argument("--delta-k", type=int, default=0,
                    help="delta-KV stages: commit the cache every K steps "
                    "instead of writing per step (0 = conventional)")
    args = ap.parse_args()
    cache_len = args.prompt_len + args.steps

    cfg = llama.config_for_architecture(args.arch)
    window = (128264, 65544) if args.window else None
    params = jax.jit(
        lambda k: quantization.quantize_llama_params(
            llama.init_params(k, cfg, dtype=jnp.bfloat16), bits=args.bits
        )
    )(jax.random.PRNGKey(0))
    tokens = jax.random.randint(
        jax.random.PRNGKey(2), (args.batch, args.prompt_len), 0, cfg.vocab_size
    )
    lengths = jnp.full((args.batch,), args.prompt_len, jnp.int32)
    sp = sampling.SamplingParams(
        temperature=0.8, top_k=50, repetition_penalty=1.1, frequency_penalty=0.3
    )
    rtt = fetch_rtt()
    print(f"devices={jax.devices()} rtt={rtt*1e3:.1f}ms cache={cache_len}",
          file=sys.stderr)

    for qkv in (False, True):
        if args.kv != "both" and qkv != (args.kv == "int8"):
            continue
        for staged in (False, True):
            if args.skip_full and not staged:
                continue
            name = f"{'int8' if qkv else 'bf16'}-kv {'staged' if staged else 'full  '}"
            if staged:
                # per-stage dispatch: same arithmetic, bounded program time
                gen = make_host_staged_generate_fn(
                    cfg, sp, max_new_tokens=args.steps, eos_id=-1,
                    cache_len=cache_len, quantized_kv=qkv,
                    vocab_window=window, delta_k=args.delta_k or None,
                )
            else:
                gen = make_generate_fn(
                    cfg, sp, max_new_tokens=args.steps, eos_id=-1,
                    cache_len=cache_len, quantized_kv=qkv,
                    vocab_window=window,
                )
            res = gen(params, tokens, lengths, jax.random.PRNGKey(1))
            int(res.steps)
            best = 0.0
            for it in range(args.iters):
                t0 = time.perf_counter()
                res = gen(params, tokens, lengths, jax.random.PRNGKey(3 + it))
                assert int(res.steps) == args.steps
                dt = time.perf_counter() - t0 - rtt
                best = max(best, args.batch * args.steps / dt)
            print(f"{name}: {best:7.0f} tok/s/chip "
                  f"({best / 50:.0f} realtime streams)")


if __name__ == "__main__":
    main()
