"""Generate the trained quantization-quality anchor fixture.

Random-init weights have near-zero logit margins, so top-1/greedy-divergence
quantization metrics are chaotic on them (tools/quant_quality.py prints
exactly that caveat). This trains a small-but-real Llama (dim 256 — two
128-wide groups per channel, so int4-g128 is distinct from per-channel
int4) on a deterministic synthetic language until the margins are decisive,
and checks the weights in as tests/fixtures/quant_anchor.npz. The fixture
anchors quant_quality (--fixture) and the CPU regression test
(tests/test_quant_anchor.py): agreement/SNR ORDERING across quantization
modes on a trained model, measurable on every CI run without a real
checkpoint.

The synthetic language: two interleaved affine maps over the vocab
(t' = a*t + b mod V, map chosen by a prefix token), noiseless — learnable
to near-zero loss, so the trained model has sharp next-token margins.

Run once (CPU, ~2 min): python tests/fixtures/generate_quant_anchor.py
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_platforms", "cpu")

from tts_max_tpu.models import llama  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "quant_anchor.npz")

CFG = dict(
    vocab_size=512,
    dim=256,
    n_layers=4,
    n_heads=4,
    n_kv_heads=2,
    head_dim=64,
    ffn_dim=512,
    rope_theta=10000.0,
    use_llama3_rope_scaling=False,
    max_seq_len=256,
    tie_embeddings=True,
)

MAPS = ((5, 17), (11, 101))  # affine maps t' = a*t + b mod V


def make_batch(rng: np.random.Generator, batch: int, seq: int, vocab: int):
    toks = np.zeros((batch, seq), dtype=np.int32)
    for i in range(batch):
        which = rng.integers(0, len(MAPS))
        a, b = MAPS[which]
        toks[i, 0] = which + 1  # map selector token
        t = int(rng.integers(3, vocab))
        for j in range(1, seq):
            toks[i, j] = t
            t = (a * t + b) % (vocab - 3) + 3
    return toks


def main():
    cfg = llama.LlamaConfig(**CFG, dtype=jnp.float32)
    params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    tx = optax.adamw(3e-4)
    opt = tx.init(params)

    def loss_fn(p, toks):
        logits = llama.forward(p, cfg, toks)  # [B, S, V]
        tgt = toks[:, 1:]
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
        nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        return nll.mean()

    @jax.jit
    def step(p, o, toks):
        loss, g = jax.value_and_grad(loss_fn)(p, toks)
        updates, o = tx.update(g, o, p)
        return optax.apply_updates(p, updates), o, loss

    rng = np.random.default_rng(0)
    for i in range(400):
        toks = jnp.asarray(make_batch(rng, 16, 96, CFG["vocab_size"]))
        params, opt, loss = step(params, opt, toks)
        if i % 50 == 0 or i == 399:
            print(f"step {i}: loss {float(loss):.4f}", flush=True)
    final = float(loss)
    assert final < 0.3, f"anchor training did not converge: {final}"

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    arrays = {}
    for path, leaf in flat:
        key = "/".join(str(p.key) for p in path)
        arrays[key] = np.asarray(leaf, dtype=np.float32)
    np.savez_compressed(OUT, __config=json.dumps(CFG), __loss=final, **arrays)
    mb = os.path.getsize(OUT) / 1e6
    print(f"wrote {OUT}: {len(arrays)} tensors, {mb:.1f} MB, loss {final:.4f}")


if __name__ == "__main__":
    main()
