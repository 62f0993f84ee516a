"""Benchmark: SpeechLM AR decode throughput on the real TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: KV-cached autoregressive decode tokens/s/chip on the flagship
Llama-3.2-1B SpeechLM (int8 weights, speech-window constrained, batch 128,
on-device sampling with top-k/penalties). The whole decode loop is ONE
jitted XLA program (nested delta-KV while_loops: the cache commits once
per 32 steps instead of per step — the per-step scatter made XLA copy the
loop-carried cache every iteration, round-4 ablation) — no per-token host
round-trips.

The reference publishes no benchmark numbers (BASELINE.md), so
``vs_baseline`` reports the real-time factor: concurrent real-time TTS
streams one chip sustains = tokens/s ÷ 50 (codec tokens per audio-second).

Timing notes for the axon tunnel: block_until_ready does not reliably block,
so timing brackets a jitted program whose scalar result is fetched to host;
the ~30 ms relay RTT is measured and subtracted.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from tts_max_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp


def main():
    from tts_max_tpu.core.constants import CODEC_TOKEN_RATE
    from tts_max_tpu.inference.generate import make_generate_fn
    from tts_max_tpu.models import llama
    from tts_max_tpu.ops import sampling

    batch = 128  # sweep: 64 -> 9595, 128 -> 11424 tok/s; 256 fails remote compile
    prompt_len = 64
    decode_steps = 128

    cfg = llama.llama32_1b_config()
    print(
        f"bench: llama-1b decode, batch={batch}, steps={decode_steps}, "
        f"devices={jax.devices()}",
        file=sys.stderr,
    )
    # jit the init: one XLA program, no op-by-op relay round-trips
    from tts_max_tpu.models import quantization

    params = jax.jit(
        lambda k: quantization.quantize_llama_params(
            llama.init_params(k, cfg, dtype=jnp.bfloat16)
        )
    )(jax.random.PRNGKey(0))
    tokens = jax.random.randint(
        jax.random.PRNGKey(2), (batch, prompt_len), 0, cfg.vocab_size
    )
    lengths = jnp.full((batch,), prompt_len, dtype=jnp.int32)

    sp = sampling.SamplingParams(
        temperature=0.8, top_k=50, repetition_penalty=1.1, frequency_penalty=0.3
    )
    # Speech-window-constrained decode (the production TTS serving config,
    # synthesize.py constrain_to_speech): logits over the 65544-row speech
    # window instead of all 193856 rows — ~3x smaller LM-head + penalty
    # buffer HBM read per step (+21% measured, BENCHMARKS.md).
    speech_window = (128264, 65544)
    import os

    # delta-KV commit window: the round-5 sweep at this 192-slot cache
    # measured 8→17848, 12→17662, 16→17825, 20→17155, 24→17479, 32→16722,
    # 48→15962 tok/s — small windows win at short caches (the delta
    # attention term scales with K while the commit amortization saturates);
    # long-form (1824 slots) still prefers 32 (BENCHMARKS.md).
    delta_k = int(os.environ.get("TTS_MAX_DELTA_K", "16")) or None
    gen = make_generate_fn(
        cfg, sp, max_new_tokens=decode_steps, eos_id=-1,
        cache_len=prompt_len + decode_steps, vocab_window=speech_window,
        delta_k=delta_k,
    )

    from tts_max_tpu.utils.profiling import fetch_rtt

    rtt = fetch_rtt()
    print(f"bench: relay RTT {rtt * 1e3:.1f}ms", file=sys.stderr)

    # compile + warmup (fetch a scalar to serialize)
    res = gen(params, tokens, lengths, jax.random.PRNGKey(1))
    _ = int(res.steps)

    best = None
    for it in range(3):
        t0 = time.perf_counter()
        res = gen(params, tokens, lengths, jax.random.PRNGKey(3 + it))
        steps = int(res.steps)  # scalar fetch serializes the program
        dt = time.perf_counter() - t0 - rtt
        assert steps == decode_steps, steps
        tps = batch * decode_steps / dt
        print(f"bench: iter {it}: {dt * 1e3:.1f}ms -> {tps:.0f} tok/s", file=sys.stderr)
        best = max(best or 0.0, tps)

    print(
        json.dumps(
            {
                "metric": "speechlm_decode_tokens_per_s_per_chip",
                "value": round(best, 2),
                "unit": f"tokens/s/chip (llama-1b int8 weights, batch {batch}, jitted KV decode, speech-window constrained)",
                "vs_baseline": round(best / CODEC_TOKEN_RATE, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
