"""Loader for the trained quant-quality anchor fixture (see
generate_quant_anchor.py)."""

import json
import os

import jax.numpy as jnp
import numpy as np

from tts_max_tpu.models import llama

PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "quant_anchor.npz")


def load_anchor(dtype=jnp.float32):
    data = np.load(PATH, allow_pickle=False)
    cfg_d = json.loads(str(data["__config"]))
    cfg = llama.LlamaConfig(**cfg_d, dtype=dtype)

    def build(d):
        out = {}
        for key in d.files:
            if key.startswith("__"):
                continue
            parts = key.split("/")
            node = out
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(d[key], dtype=dtype)
        return out

    return build(data), cfg


def make_anchor_prompts(batch: int, length: int, vocab_size: int, seed: int = 0):
    """Prompts drawn from the fixture's trained language (affine chains) —
    in-distribution, so next-token margins are decisive."""
    rng = np.random.default_rng(seed)
    toks = np.zeros((batch, length), dtype=np.int32)
    for i in range(batch):
        a, b = ((5, 17), (11, 101))[i % 2]
        toks[i, 0] = (i % 2) + 1
        t = int(rng.integers(3, vocab_size))
        for j in range(1, length):
            toks[i, j] = t
            t = (a * t + b) % (vocab_size - 3) + 3
    return toks
