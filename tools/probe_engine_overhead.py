"""Per-dispatch overhead breakdown for the serving engine on the relayed TPU.

The engine bench shows ~200-350 ms per K-step dispatch beyond the expected
compute (~5 ms/step at 1B batch 64) — far above the ~28 ms relay RTT measured
for simple jitted calls. This probe isolates where the time goes, per
dispatch, with a full pool and NO admissions in the loop:

  enqueue  - the _dispatch_decode() call itself (jit dispatch, arg handling)
  fetch    - np.asarray(packed blob) (device sync + D2H of [2K+1, B] int32)
  host     - _process_decode_blob (pure host bookkeeping)

Usage: python tools/probe_engine_overhead.py [--k 16] [--batch 64] [--iters 20]
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

from tts_max_tpu.inference.engine import PagedInferenceEngine
from tts_max_tpu.models import llama, quantization
from tts_max_tpu.ops.sampling import SamplingParams

SPEECH_WINDOW = (128264, 65544)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="llama-1b")
    ap.add_argument("--quantize", default="int8")
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--max-len", type=int, default=768)
    ap.add_argument("--contiguous", action="store_true",
                    help="probe the contiguous-KV engine instead of paged")
    ap.add_argument("--no-staged", action="store_true",
                    help="disable staged (occupancy-sized) dispatches")
    ap.add_argument("--kv", choices=["bf16", "int8"], default="bf16")
    ap.add_argument("--no-persistent-read-cache", action="store_true",
                    help="paged: per-dispatch pool gather instead of the "
                         "persistent contiguous mirror")
    ap.add_argument("--no-delta", action="store_true")
    args = ap.parse_args()

    cfg = llama.config_for_architecture(args.arch, max_seq_len=args.max_len)
    # init + quantize fused in ONE jit (the bf16 8B tree alone OOMs 16 GB)
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
    sp = SamplingParams(temperature=0.8, top_k=50, repetition_penalty=1.1,
                        frequency_penalty=0.3)
    window = SPEECH_WINDOW
    if window[0] + window[1] > cfg.vocab_size:  # tiny smoke configs
        window = None
    from tts_max_tpu.inference.engine import InferenceEngine

    kw = dict(
        max_batch=args.batch, max_len=args.max_len, sp=sp,
        vocab_window=window, steps_per_dispatch=args.k,
        staged_cache=not args.no_staged, quantized_kv=args.kv == "int8",
        delta_kv=not args.no_delta,
    )
    if args.contiguous:
        eng = InferenceEngine(params, cfg, **kw)
    else:
        eng = PagedInferenceEngine(
            params, cfg,
            persistent_read_cache=not args.no_persistent_read_cache, **kw
        )
    rng = np.random.default_rng(0)
    lo, hi = (window[0], window[0] + window[1] - 8) if window else (3, cfg.vocab_size)
    for i in range(args.batch):
        eng.submit(rng.integers(lo, hi, 96).astype(np.int32),
                   args.max_len - 104, eos_id=-1, sampling_seed=i)
    print("probe: admitting + compiling ...", file=sys.stderr, flush=True)
    eng._admit()
    # compile the decode program outside the timed loop; PROCESS its blob so
    # host/device token counts stay in sync (else the in-program budget
    # finish fires K tokens early and the disagreement check trips)
    d = eng._dispatch_decode()
    eng._process_decode_blob(np.asarray(d[0]), d[1])
    # never decode past max_len: cap iters so prompt + (iters+1)*K fits
    max_iters = (args.max_len - 96) // args.k - 1
    if args.iters > max_iters:
        print(f"probe: capping iters {args.iters} -> {max_iters}",
              file=sys.stderr, flush=True)
        args.iters = max_iters

    enq, fetch, host, stages = [], [], [], []
    for it in range(args.iters):
        stages.append(eng._dispatch_stage())
        t0 = time.perf_counter()
        dispatched = eng._dispatch_decode()
        t1 = time.perf_counter()
        blob = np.asarray(dispatched[0])
        t2 = time.perf_counter()
        eng._process_decode_blob(blob, dispatched[1])
        t3 = time.perf_counter()
        enq.append(t1 - t0)
        fetch.append(t2 - t1)
        host.append(t3 - t2)
    if any(s is not None for s in stages):
        # staged: per-stage median fetch (the dispatch's device compute)
        by_stage: dict = {}
        for s, f in zip(stages, fetch):
            by_stage.setdefault(s, []).append(f)
        for s in sorted(by_stage, key=lambda x: (x is None, x)):
            v = by_stage[s]
            print(f"  stage {s or args.max_len}: fetch med "
                  f"{1e3 * float(np.median(v)):.1f}ms over {len(v)} "
                  f"dispatches = {1e3 * float(np.median(v)) / args.k:.2f} "
                  f"ms/step", flush=True)
    # steady-state medians; first iters may overlap residual work
    med = lambda xs: 1e3 * float(np.median(xs))
    toks = args.k * args.batch
    total = med(enq) + med(fetch) + med(host)
    print(
        f"probe {args.arch} {args.quantize} B={args.batch} K={args.k}: "
        f"enqueue {med(enq):.1f}ms  fetch {med(fetch):.1f}ms  "
        f"host {med(host):.1f}ms  -> {total:.1f}ms/dispatch "
        f"= {toks / total * 1e3:.0f} tok/s sync ceiling "
        f"({toks} tok/dispatch)",
        flush=True,
    )
    # pipelined ceiling: enqueue+host on the critical path only if they
    # exceed the overlapped fetch; approximate as max(fetch, enqueue+host)
    pipe = max(med(fetch), med(enq) + med(host))
    print(f"probe pipelined ceiling ~ {toks / pipe * 1e3:.0f} tok/s "
          f"(critical path {pipe:.1f}ms)", flush=True)


if __name__ == "__main__":
    main()
