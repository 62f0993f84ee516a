"""Time-to-first-audio for streaming synthesis (VERDICT r4 weak-item 7).

TTFA = submit -> first decodable audio chunk out of StreamingSynthesizer
(inference/streaming.py): the SpeechLM must generate chunk+crossfade codes
(default 29 ≈ 0.58 s of audio) and the Vocos decoder must decode them.
Measured at batch 1 (idle engine) and under saturation load (the streaming
request contends with --load background requests), with and without
--prefill-ahead.

Run on the chip:  python tools/bench_ttfa.py --arch llama-1b --quantize int8
CPU smoke:        JAX_PLATFORMS=cpu python tools/bench_ttfa.py --arch tiny
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

from tts_max_tpu.core.tokenization import SpeechVocab  # noqa: E402
from tts_max_tpu.inference.engine import InferenceEngine  # noqa: E402
from tts_max_tpu.inference.streaming import StreamingSynthesizer  # noqa: E402
from tts_max_tpu.models import llama, quantization  # noqa: E402
from tts_max_tpu.models.codec import api, vocos  # noqa: E402
from tts_max_tpu.ops.sampling import SamplingParams  # noqa: E402

SPEECH_LO = 128264  # speech-token block start at the 193856 vocab


def synthetic_speech_vocab(vocab_size: int) -> SpeechVocab:
    """The production id layout (tokenization.py): 65536 speech tokens in
    one contiguous block, the 8 structural specials right after."""
    if vocab_size >= SPEECH_LO + 65544:
        lo, n = SPEECH_LO, 65536
    else:  # tiny architectures: shrink the block, keep the layout
        n = max(16, vocab_size // 2)
        lo = vocab_size - n - 8
    speech_to_token = (np.arange(n) + lo).astype(np.int32)
    token_to_speech = np.full((vocab_size,), -1, dtype=np.int32)
    token_to_speech[lo : lo + n] = np.arange(n)
    return SpeechVocab(
        speech_to_token=speech_to_token,
        token_to_speech=token_to_speech,
        speech_start_id=lo + n,
        speech_end_id=lo + n + 1,
        text_prompt_start_id=lo + n + 2,
        text_prompt_end_id=lo + n + 3,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="llama-1b")  # llama-tiny for CPU smoke
    ap.add_argument("--quantize", choices=["int8", "int4", "none"],
                    default="int8")
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--max-len", type=int, default=768)
    ap.add_argument("--steps-per-dispatch", type=int, default=32)
    ap.add_argument("--kv", choices=["bf16", "int8"], default="bf16")
    ap.add_argument("--load", type=int, default=128,
                    help="background requests for the under-load scenario")
    ap.add_argument("--budget", type=int, default=256)
    ap.add_argument("--stream-budget", type=int, default=512)
    ap.add_argument("--chunk-codes", type=int, default=25)
    ap.add_argument("--context-codes", type=int, default=50)
    ap.add_argument("--prefill-ahead", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tiny-decoder", action="store_true",
                    help="tiny random Vocos (isolates the LM cost)")
    args = ap.parse_args()

    cfg = llama.config_for_architecture(args.arch, max_seq_len=args.max_len)
    bits = {"int8": 8, "int4": 4}.get(args.quantize)

    def init(k):
        p = llama.init_params(k, cfg, dtype=jnp.bfloat16)
        return quantization.quantize_llama_params(p, bits=bits) if bits else p

    params = jax.jit(init)(jax.random.PRNGKey(0))
    sv = synthetic_speech_vocab(cfg.vocab_size)
    window = sv.generation_window()

    vcfg = (vocos.tiny_vocos_config() if args.tiny_decoder
            else vocos.VocosConfig())
    decoder = api.AudioDecoder(
        vocos.init_decoder(jax.random.PRNGKey(1), vcfg), vcfg,
        api.DecoderConfig(),
    )

    sp = SamplingParams(temperature=0.8, top_k=50, repetition_penalty=1.1,
                        frequency_penalty=0.3)
    engine = InferenceEngine(
        params, cfg, max_batch=args.max_batch, max_len=args.max_len, sp=sp,
        quantized_kv=args.kv == "int8", vocab_window=window,
        steps_per_dispatch=args.steps_per_dispatch,
        prefill_ahead=args.prefill_ahead,
    )
    print("bench_ttfa: warmup (compiles every serving program) ...",
          flush=True)
    t0 = time.time()
    engine.warmup(prompt_buckets=(64, 128, 256))
    synth = StreamingSynthesizer(engine, None, sv, decoder,
                                 chunk_codes=args.chunk_codes,
                                 context_codes=args.context_codes)
    rng = np.random.default_rng(0)
    lo = window[0]

    def prompt(n):
        return rng.integers(lo, lo + 65536, n).astype(np.int32)

    # decoder warmup (first chunk decode compiles)
    _ = decoder.decode(rng.integers(0, 100, args.chunk_codes + 8))
    print(f"bench_ttfa: warmup took {time.time() - t0:.1f}s", flush=True)

    def measure_ttfa():
        t_submit = time.perf_counter()
        it = synth.stream("", max_new_tokens=args.stream_budget, seed=1,
                          input_ids=prompt(96))
        first = next(it)
        ttfa = time.perf_counter() - t_submit
        n = len(first)
        for _ in it:  # drain
            pass
        return ttfa, n

    # --- batch 1, idle engine ---
    for r in range(args.reps):
        ttfa, n = measure_ttfa()
        print(f"TTFA idle rep{r}: {ttfa * 1e3:.0f} ms "
              f"(first chunk {n} samples = {n / 16000:.2f}s audio)",
              flush=True)

    # --- under load ---
    for i in range(args.load):
        engine.submit(prompt(int(rng.choice([48, 96, 200]))),
                      int(rng.integers(args.budget // 2, args.budget)),
                      eos_id=-1, sampling_seed=1000 + i)
    # let the pool saturate before the streaming request arrives
    for _ in range(4):
        engine.poll()
    ttfa, n = measure_ttfa()
    print(f"TTFA under load ({args.load} bg requests, "
          f"prefill_ahead={args.prefill_ahead}): {ttfa * 1e3:.0f} ms",
          flush=True)
    while engine.has_work():  # drain background
        engine.poll()
    st = engine.stats()
    print(f"bench_ttfa done: engine stats {st}", flush=True)


if __name__ == "__main__":
    main()
