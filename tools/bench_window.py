"""A/B bench: full-vocab vs speech-window-constrained decode (real TPU).

Same setup as bench.py (llama-1B geometry, int8 weights, batch 128); the
window is SpeechVocab.generation_window() geometry: 65544 rows out of
193856.
"""

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
    batch, prompt_len, steps = 128, 64, 128
    cfg = llama.llama32_1b_config()
    params = jax.jit(
        lambda k: quantization.quantize_llama_params(
            llama.init_params(k, cfg, dtype=jnp.bfloat16)
        )
    )(jax.random.PRNGKey(0))
    lo, size = 128264, 65544  # speech window geometry at the fixed vocab
    tokens = jax.random.randint(
        jax.random.PRNGKey(2), (batch, prompt_len), lo, lo + size
    )
    lengths = jnp.full((batch,), prompt_len, dtype=jnp.int32)
    sp = sampling.SamplingParams(
        temperature=0.8, top_k=50, repetition_penalty=1.1, frequency_penalty=0.3
    )
    rtt = fetch_rtt()
    print(f"rtt {rtt*1e3:.1f}ms", file=sys.stderr)

    for name, window in (("window", (lo, size)), ("full", None)):
        gen = make_generate_fn(
            cfg, sp, max_new_tokens=steps, eos_id=-1,
            cache_len=prompt_len + steps, vocab_window=window,
        )
        res = gen(params, tokens, lengths, jax.random.PRNGKey(1))
        _ = int(res.steps)  # compile+warmup
        best = 0.0
        for it in range(3):
            t0 = time.perf_counter()
            res = gen(params, tokens, lengths, jax.random.PRNGKey(3 + it))
            n = int(res.steps)
            dt = time.perf_counter() - t0 - rtt
            assert n == steps, n
            best = max(best, batch * steps / dt)
            print(f"{name} iter{it}: {dt*1e3:.1f}ms", file=sys.stderr)
        print(f"{name}: {best:.0f} tok/s/chip")


if __name__ == "__main__":
    main()
