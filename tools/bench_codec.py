"""Codec throughput on the real chip: encode (wav → FSQ codes), decode
(codes → wav), and the w2v-BERT semantic stack — full-size models, random
weights (kernel throughput).

Usage: python tools/bench_codec.py {encode|decode|semantic} [--batch N]
         [--seconds S]
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
from tts_max_tpu.core.constants import CODEC_HOP_LENGTH
from tts_max_tpu.models.codec import encoder as enc, vocos, w2vbert


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["encode", "decode", "semantic"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--trace", default="",
                    help="capture an xprof trace of the timed iterations "
                    "(summarize with tools/xplane_summary.py)")
    args = ap.parse_args()
    samples = int(args.seconds * 16000)
    samples -= samples % CODEC_HOP_LENGTH
    frames = samples // CODEC_HOP_LENGTH
    audio_sec_per_call = args.batch * samples / 16000.0

    if args.stage == "decode":
        cfg = vocos.VocosConfig()
        params = jax.jit(lambda k: vocos.init_decoder(k, cfg))(
            jax.random.PRNGKey(0)
        )
        codes = jnp.zeros((args.batch, frames), jnp.int32)
        run = jax.jit(lambda p, c: jnp.sum(vocos.decode(p, c, cfg) ** 2))
        arg = codes
    elif args.stage == "semantic":
        cfg = w2vbert.W2VBertConfig()
        params = jax.jit(lambda k: w2vbert.init_params(k, cfg))(
            jax.random.PRNGKey(0)
        )
        feats = jnp.zeros((args.batch, frames, cfg.feature_dim), jnp.float32)
        run = jax.jit(lambda p, f: jnp.sum(w2vbert.encode(p, f, cfg) ** 2))
        arg = feats
    else:
        cfg = enc.EncoderConfig()
        params = jax.jit(lambda k: enc.init_encoder(k, cfg))(
            jax.random.PRNGKey(0)
        )
        wav = jnp.zeros((args.batch, samples), jnp.float32)
        feats = jnp.zeros((args.batch, frames, cfg.semantic_input_dim),
                          jnp.float32)
        run = jax.jit(
            lambda p, w: jnp.sum(enc.encode_features(p, w, feats, cfg))
        )
        arg = wav

    rtt = fetch_rtt()
    _ = float(run(params, arg))  # compile + warmup
    if args.trace:
        from tts_max_tpu.utils.profiling import trace

        with trace(args.trace):
            for _ in range(2):
                _ = float(run(params, arg))
    best = 0.0
    for _ in range(args.iters):
        t0 = time.perf_counter()
        _ = float(run(params, arg))
        best = max(best, audio_sec_per_call / (time.perf_counter() - t0 - rtt))
    print(
        f"{args.stage} batch {args.batch} x {args.seconds:.0f}s: "
        f"{best:.0f} audio-sec/s/chip",
        flush=True,
    )


if __name__ == "__main__":
    main()
