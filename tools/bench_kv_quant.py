"""Drive + time the int8 KV cache on the real chip.

Compares jitted greedy-ish decode throughput with bf16 vs int8 KV at a
context length where cache reads are a visible fraction of the HBM traffic
(batch 64, 1024-token cache). Also sanity-checks token agreement.

Usage: python tools/bench_kv_quant.py [--batch 64] [--steps 256]
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
from tts_max_tpu.inference.generate import make_generate_fn
from tts_max_tpu.models import llama, quantization
from tts_max_tpu.ops import sampling


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--prompt_len", type=int, default=64)
    ap.add_argument("--cache_len", type=int, default=1024)
    args = ap.parse_args()

    cfg = llama.llama32_1b_config()
    params = jax.jit(
        lambda k: quantization.quantize_llama_params(
            llama.init_params(k, cfg, dtype=jnp.bfloat16)
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
    print(f"devices={jax.devices()} rtt={rtt*1e3:.1f}ms", file=sys.stderr)

    results = {}
    for name, qkv in [("bf16-kv", False), ("int8-kv", True)]:
        gen = make_generate_fn(
            cfg, sp, max_new_tokens=args.steps, eos_id=-1,
            cache_len=args.cache_len, quantized_kv=qkv,
        )
        res = gen(params, tokens, lengths, jax.random.PRNGKey(1))
        int(res.steps)  # compile + serialize
        best = 0.0
        for it in range(3):
            t0 = time.perf_counter()
            res = gen(params, tokens, lengths, jax.random.PRNGKey(3 + it))
            assert int(res.steps) == args.steps
            dt = time.perf_counter() - t0 - rtt
            best = max(best, args.batch * args.steps / dt)
        results[name] = (best, res.tokens)
        print(f"{name}: {best:.0f} tok/s/chip", file=sys.stderr)

    agree = float(
        jnp.mean(results["bf16-kv"][1] == results["int8-kv"][1])
    )
    speedup = results["int8-kv"][0] / results["bf16-kv"][0]
    print(
        f"int8-kv speedup {speedup:.3f}x, sampled-token agreement {agree:.3f}"
    )


if __name__ == "__main__":
    main()
