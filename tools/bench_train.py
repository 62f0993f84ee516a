"""Training-step throughput on the real chip.

Usage: python tools/bench_train.py [--arch llama-1b] [--batch 2] [--seq 2048]
         [--remat full|dots|none] [--precision bf16|fp32] [--mu bf16|fp32]

Single-chip recipe for 1B: bf16 params + bf16 Adam mu + remat (BENCHMARKS).
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

from tts_max_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from tts_max_tpu.models import llama
from tts_max_tpu.training import optim, train_step as ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="llama-1b")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--remat", choices=["full", "dots", "none"], default="full")
    ap.add_argument("--precision", choices=["bf16", "fp32"], default="bf16")
    ap.add_argument("--mu", choices=["bf16", "fp32"], default="bf16")
    ap.add_argument("--steps", type=int, default=8)
    # Blockwise cross-entropy (train_step.chunked_causal_lm_loss): 0 = naive
    # full-vocab [B,S,193856] fp32 logprobs.
    ap.add_argument("--loss-chunk", type=int, default=0)
    ap.add_argument("--trace", default="",
                    help="capture a jax.profiler/xprof trace of the timed "
                    "steps into this directory (VERDICT r3 item 9)")
    ap.add_argument("--ablate", action="store_true",
                    help="also time forward-only and grad-only programs to "
                    "attribute the step (fwd vs bwd vs optimizer)")
    args = ap.parse_args()

    cfg = llama.config_for_architecture(args.arch, max_seq_len=args.seq)
    cfg = dataclasses.replace(
        cfg,
        remat=args.remat != "none",
        remat_policy="dots" if args.remat == "dots" else None,
    )
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    params = jax.jit(lambda k: llama.init_params(k, cfg, dtype=dtype))(
        jax.random.PRNGKey(0)
    )
    tx = optim.create_optimizer(1e-4, mu_dtype=args.mu)
    opt_state = jax.jit(tx.init)(params)
    batch = {
        "input_ids": jnp.zeros((1, args.batch, args.seq), jnp.int32),
        "labels": jnp.ones((1, args.batch, args.seq), jnp.int32),
    }
    step = jax.jit(
        lambda p, o, b: ts.train_step(
            p, o, b, cfg=cfg, tx=tx, loss_chunk_size=args.loss_chunk
        ),
        donate_argnums=(0, 1),
    )
    params, opt_state, m = step(params, opt_state, batch)
    _ = float(m.loss)  # compile + warmup

    from tts_max_tpu.utils.profiling import fetch_rtt

    rtt = fetch_rtt()

    toks = args.batch * args.seq
    if args.trace:
        from tts_max_tpu.utils.profiling import trace

        with trace(args.trace):
            for _ in range(2):
                params, opt_state, m = step(params, opt_state, batch)
            _ = float(m.loss)
        print(f"trace written to {args.trace}", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        params, opt_state, m = step(params, opt_state, batch)
    _ = float(m.loss)
    dt = time.perf_counter() - t0 - rtt
    print(
        f"{args.arch} remat={args.remat} {args.precision}/mu-{args.mu} "
        f"chunk={args.loss_chunk} "
        f"batch {args.batch}x{args.seq}: {toks * args.steps / dt:.0f} "
        f"tokens/s/chip ({dt / args.steps * 1e3:.0f} ms/step)",
        flush=True,
    )

    if args.ablate:
        # attribute the step: forward-only loss, loss+grad (no optimizer),
        # and the full step above — substantiates (or breaks) the claim
        # that the single-chip step is layer-stack-bound (VERDICT r3 item 9)
        opt_state = None  # free ~5 GB of Adam state: the ablation programs
        # (grad tree + remat activations) must coexist with params in 16 GB
        mb = {k: v[0] for k, v in batch.items()}

        fwd = jax.jit(
            lambda p, b: ts.loss_fn(
                p, cfg, b, loss_chunk_size=args.loss_chunk
            )[0]
        )
        grad = jax.jit(
            lambda p, b: jax.grad(
                lambda pp: ts.loss_fn(
                    pp, cfg, b, loss_chunk_size=args.loss_chunk
                )[0]
            )(p)
        )

        def timeit(fn, *fa, red=lambda o: float(o)):
            red(fn(*fa))  # compile
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out = fn(*fa)
            red(out)
            return (time.perf_counter() - t0 - rtt) / args.steps

        t_f = timeit(fwd, params, mb)
        t_g = timeit(
            grad, params, mb,
            red=lambda g: float(
                jax.tree_util.tree_leaves(g)[0].ravel()[0]
            ),
        )
        t_s = dt / args.steps
        print(
            f"ablation: forward {t_f * 1e3:.0f} ms, +backward "
            f"{t_g * 1e3:.0f} ms (bwd {1e3 * (t_g - t_f):.0f}), full step "
            f"{t_s * 1e3:.0f} ms (optimizer+guard "
            f"{1e3 * (t_s - t_g):.0f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
