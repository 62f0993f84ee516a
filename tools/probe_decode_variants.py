"""Ablation probe: where does the engine decode-step time go? (VERDICT r3
items 1/2 — the 14.0 ms contiguous vs 21.7 ms paged vs ~6.6 ms generate-path
step.)

Hypotheses probed head-to-head on the chip, all at serving shapes
(default 1B int8 B=64), each as one K-step jitted lax.scan (weights
unpacked once; timing = scalar fetch minus relay RTT):

  scan@L      contiguous decode_step, lax.scan over layers, cache len L
              -> how cost scales with cache length (staging's win)
  unroll@L    same but Python-unrolled layers (STATIC cache slice indices;
              if XLA materializes the scan's per-layer dynamic cache slice,
              this is faster)
  paged-X@W   decode_step_paged variant X with table width W blocks
              -> table-width staging win + residual paged premium vs scan
              at the same capacity

Usage: python tools/probe_decode_variants.py [--batch 64] [--k 32]
           [--lens 192,512,768] [--widths 4,8,12] [--variants dense,xla]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from tts_max_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tts_max_tpu.models import llama, quantization  # noqa: E402
from tts_max_tpu.utils.profiling import fetch_rtt  # noqa: E402

SPEECH_WINDOW = (128264, 65544)


def time_fn(fn, *args, iters=3, rtt=0.0):
    out = fn(*args)
    float(out)  # compile + serialize
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        dt = time.perf_counter() - t0 - rtt
        best = dt if best is None else min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="llama-1b")
    ap.add_argument("--quantize", default="int8")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--lens", default="192,512,768")
    ap.add_argument("--widths", default="4,8,12")
    ap.add_argument("--block-size", type=int, default=64)
    ap.add_argument("--variants", default="dense2,dense,xla")
    ap.add_argument("--max-len", type=int, default=768)
    ap.add_argument("--kv", choices=["bf16", "int8"], default="bf16")
    ap.add_argument("--no-window", action="store_true")
    ap.add_argument("--skip-unroll", action="store_true")
    ap.add_argument("--skip-flash", action="store_true")
    ap.add_argument("--nowrite", action="store_true",
                    help="ablation: also time decode WITHOUT the K/V "
                    "cache scatter (wrong numerics; isolates scatter cost)")
    ap.add_argument("--prewrite", action="store_true",
                    help="also time the attend-before-write formulation")
    args = ap.parse_args()

    cfg = llama.config_for_architecture(args.arch, max_seq_len=args.max_len)
    bits = {"int8": 8, "int4": 4, "none": None}[args.quantize]

    def init(key):
        p = llama.init_params(key, cfg, dtype=jnp.bfloat16)
        if bits:
            p = quantization.quantize_llama_params(p, bits=bits)
        return p

    params = jax.jit(init)(jax.random.PRNGKey(0))
    window = None if args.no_window else SPEECH_WINDOW
    if window and window[0] + window[1] > cfg.vocab_size:
        window = None
    b, k = args.batch, args.k
    rtt = fetch_rtt()
    print(f"probe_decode_variants: B={b} K={k} {args.arch} {args.quantize} "
          f"rtt={rtt * 1e3:.1f}ms", file=sys.stderr, flush=True)

    def report(name, dt):
        print(f"{name:>16}: {dt / k * 1e3:6.2f} ms/step  "
              f"({b * k / dt:6.0f} tok/s sync ceiling)", flush=True)

    def ksteps_contig(cache_len, unroll, flash=False, write=True,
                      prewrite=False):
        # fixed greedy-ish loop: argmax over the (windowed) head, K steps.
        # write=False skips the per-layer K/V cache scatter (WRONG numerics;
        # isolates whether the scatter copies the whole cache per layer)
        def fn(params, cache, lengths):
            params = quantization.unpack_packed_params(params)
            head = (llama.slice_logits_head(params, cfg, *window)
                    if window else None)

            def step(carry, _):
                cache, lengths, toks = carry
                logits, cache = llama.decode_step(
                    params, cfg, cache, toks, lengths, logits_head=head,
                    unroll=unroll, flash=flash, skip_write=not write,
                    prewrite=prewrite,
                )
                toks = jnp.argmax(logits, axis=-1).astype(jnp.int32) + (
                    window[0] if window else 0
                )
                return (cache, lengths + 1, toks), None

            toks0 = jnp.full((b,), window[0] if window else 3, jnp.int32)
            (cache, lengths, toks), _ = jax.lax.scan(
                step, (cache, lengths, toks0), None, length=k
            )
            return jnp.sum(toks).astype(jnp.float32)

        return jax.jit(fn)

    for L in [int(x) for x in args.lens.split(",") if x]:
        cache = llama.init_kv_cache(cfg, b, L, quantized=args.kv == "int8")
        lengths = jnp.full((b,), 96, jnp.int32)
        dt = time_fn(ksteps_contig(L, False), params, cache, lengths, rtt=rtt)
        report(f"scan@{L}", dt)
        if not args.skip_unroll:
            dt = time_fn(
                ksteps_contig(L, True), params, cache, lengths, rtt=rtt
            )
            report(f"unroll@{L}", dt)
        if args.nowrite:
            dt = time_fn(
                ksteps_contig(L, False, write=False), params, cache,
                lengths, rtt=rtt,
            )
            report(f"nowrite@{L}", dt)
        if args.prewrite:
            dt = time_fn(
                ksteps_contig(L, False, prewrite=True), params, cache,
                lengths, rtt=rtt,
            )
            report(f"prewrite@{L}", dt)
        if not args.skip_flash:
            # NOTE: lengths start at 96 — flash skips never-live chunks, so
            # its early steps read ~96-128 rows while scan reads all L (the
            # ragged win is the point; full-cache cost = flash@L with
            # lengths near L)
            try:
                dt = time_fn(
                    ksteps_contig(L, False, flash=True), params, cache,
                    lengths, rtt=rtt,
                )
                report(f"flash@{L}", dt)
                full = jnp.full((b,), L - k - 1, jnp.int32)
                dt = time_fn(
                    ksteps_contig(L, False, flash=True), params, cache,
                    full, rtt=rtt,
                )
                report(f"flash-full@{L}", dt)
            except Exception as e:  # noqa: BLE001
                print(f"flash@{L}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

    bs = args.block_size
    for W in [int(x) for x in args.widths.split(",") if x]:
        num_blocks = b * W + 1
        pool = llama.init_paged_kv_cache(
            cfg, num_blocks, bs, quantized=args.kv == "int8"
        )
        table = jnp.arange(1, num_blocks, dtype=jnp.int32).reshape(b, W)
        lengths = jnp.full((b,), min(96, W * bs - k - 1), jnp.int32)
        for variant in [v for v in args.variants.split(",") if v]:
            use_pallas = variant != "xla"
            import os

            os.environ["TTS_MAX_PAGED_ATTN"] = variant

            def fn(params, pool, table, lengths):
                params = quantization.unpack_packed_params(params)
                head = (llama.slice_logits_head(params, cfg, *window)
                        if window else None)

                def step(carry, _):
                    pool, lengths, toks = carry
                    logits, pool = llama.decode_step_paged(
                        params, cfg, pool, toks, lengths, table,
                        logits_head=head, use_pallas=use_pallas,
                    )
                    toks = jnp.argmax(logits, axis=-1).astype(jnp.int32) + (
                        window[0] if window else 0
                    )
                    return (pool, lengths + 1, toks), None

                toks0 = jnp.full((b,), window[0] if window else 3, jnp.int32)
                (pool, lengths, toks), _ = jax.lax.scan(
                    step, (pool, lengths, toks0), None, length=k
                )
                return jnp.sum(toks).astype(jnp.float32)

            try:
                dt = time_fn(
                    jax.jit(fn), params, pool, table, lengths, rtt=rtt
                )
                report(f"paged-{variant}@{W}", dt)
            except Exception as e:  # noqa: BLE001
                print(f"paged-{variant}@{W}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
            finally:
                os.environ.pop("TTS_MAX_PAGED_ATTN", None)


if __name__ == "__main__":
    main()
