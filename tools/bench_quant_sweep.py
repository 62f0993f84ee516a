"""Decode-throughput sweep over weight precisions (real TPU, one config per
invocation — remote compiles are minutes each, so the driver script runs
configs serially).

Usage: python tools/bench_quant_sweep.py <arch> <bits> <batch> [embed_bits]
  arch: llama-1b | llama-8b ; bits: 4 | 8 | 16 (16 = bf16, no quantization)

Speech-window constrained decode (the serving config), 64-token prompts,
128 decode steps. Params are initialized AND quantized inside one jit so the
full bf16 tree never materializes in HBM (required for 8B on a 16 GB chip).
"""

import functools
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

SPEECH_WINDOW = (128264, 65544)


def main():
    arch, bits, batch = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    embed_bits = int(sys.argv[4]) if len(sys.argv) > 4 else None
    prompt_len, steps = 64, 128
    cfg = llama.config_for_architecture(arch)
    lo, size = SPEECH_WINDOW

    def init(k):
        p = llama.init_params(k, cfg, dtype=jnp.bfloat16)
        if bits == 16:
            return p
        return quantization.quantize_llama_params(
            p, bits=bits, embed_bits=embed_bits
        )

    params = jax.jit(init)(jax.random.PRNGKey(0))
    tokens = jax.random.randint(
        jax.random.PRNGKey(2), (batch, prompt_len), lo, lo + size
    )
    lengths = jnp.full((batch,), prompt_len, jnp.int32)
    sp = sampling.SamplingParams(
        temperature=0.8, top_k=50, repetition_penalty=1.1, frequency_penalty=0.3
    )
    gen = make_generate_fn(
        cfg, sp, max_new_tokens=steps, eos_id=-1,
        cache_len=prompt_len + steps, vocab_window=SPEECH_WINDOW,
    )
    rtt = fetch_rtt()
    res = gen(params, tokens, lengths, jax.random.PRNGKey(1))
    _ = int(res.steps)  # compile + warmup
    best = 0.0
    for it in range(3):
        t0 = time.perf_counter()
        res = gen(params, tokens, lengths, jax.random.PRNGKey(3 + it))
        n = int(res.steps)
        dt = time.perf_counter() - t0 - rtt
        assert n == steps, n
        best = max(best, batch * steps / dt)
    tag = "bf16" if bits == 16 else f"int{bits}"
    if embed_bits is not None:
        tag += f"/embed{embed_bits}"
    print(f"{arch} {tag} batch {batch}: {best:.0f} tok/s/chip", flush=True)


if __name__ == "__main__":
    main()
