"""Admission (prefill-group) cost probe: contiguous vs paged engines.

Round-5 attribution: the paged engine's end-to-end gap vs contiguous
persists after delta-KV + the persistent read cache made their DECODE
programs near-identical — this measures the OTHER dispatch type. Each
iteration submits a group of requests, times ``_admit()`` (one grouped
prefill dispatch + state scatter) to completion (lengths fetch), then
cancels them so the next iteration re-admits into an empty pool.

Usage: python tools/probe_prefill_cost.py [--contiguous]
           [--no-persistent-read-cache] [--group 8] [--prompt 200]
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

from tts_max_tpu.inference.engine import (  # noqa: E402
    InferenceEngine,
    PagedInferenceEngine,
)
from tts_max_tpu.models import llama, quantization  # noqa: E402
from tts_max_tpu.ops.sampling import SamplingParams  # noqa: E402

SPEECH_WINDOW = (128264, 65544)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="llama-1b")
    ap.add_argument("--quantize", default="int8")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--max-len", type=int, default=768)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=200)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--contiguous", action="store_true")
    ap.add_argument("--no-persistent-read-cache", action="store_true")
    args = ap.parse_args()

    cfg = llama.config_for_architecture(args.arch, max_seq_len=args.max_len)
    bits = {"int8": 8, "int4": 4}.get(args.quantize)

    def init(k):
        p = llama.init_params(k, cfg, dtype=jnp.bfloat16)
        return quantization.quantize_llama_params(p, bits=bits) if bits else p

    params = jax.jit(init)(jax.random.PRNGKey(0))
    sp = SamplingParams(temperature=0.8, top_k=50, repetition_penalty=1.1,
                        frequency_penalty=0.3)
    window = SPEECH_WINDOW if SPEECH_WINDOW[0] < cfg.vocab_size else None
    kw = dict(max_batch=args.batch, max_len=args.max_len, sp=sp,
              vocab_window=window, steps_per_dispatch=args.k)
    if args.contiguous:
        eng = InferenceEngine(params, cfg, **kw)
        mode = "contig"
    else:
        eng = PagedInferenceEngine(
            params, cfg,
            persistent_read_cache=not args.no_persistent_read_cache, **kw
        )
        mode = ("paged+mirror" if not args.no_persistent_read_cache
                else "paged+gather")
    rng = np.random.default_rng(0)
    lo = window[0] if window else 3

    def admit_once():
        ids = [
            eng.submit(
                rng.integers(lo, lo + 65000, args.prompt).astype(np.int32),
                256, eos_id=-1, sampling_seed=i,
            )
            for i in range(args.group)
        ]
        t0 = time.perf_counter()
        eng._admit()
        np.asarray(eng.lengths)  # sync: prefill dispatch complete
        dt = time.perf_counter() - t0
        for rid in ids:
            eng.cancel(rid)
        return dt

    admit_once()  # compile
    times = [admit_once() for _ in range(args.iters)]
    med = 1e3 * float(np.median(times))
    print(
        f"prefill-group probe {args.arch} {args.quantize} {mode} "
        f"g={args.group} prompt={args.prompt}: med {med:.1f}ms "
        f"({med / args.group:.2f} ms/request)",
        flush=True,
    )


if __name__ == "__main__":
    main()
