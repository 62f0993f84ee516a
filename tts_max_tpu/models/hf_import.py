"""HF Llama checkpoint import/export for the SpeechLM.

Replaces the reference's ``AutoModelForCausalLM.from_pretrained`` +
``resize_token_embeddings`` path (/root/reference/tts/core/modeling.py:34-55):
reads safetensors/.bin shards from a local HF model directory into the
stacked-layer pytree of models/llama.py, resizes the embedding (and lm_head)
to the 193856-token speech vocab with mean-initialized new rows, and can
export back to HF-format safetensors for serving interchange
(tools/convert_checkpoint.py).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax.numpy as jnp
import numpy as np

from tts_max_tpu.models import llama


def _load_hf_state_dict(model_dir: str) -> dict[str, np.ndarray]:
    """Load all tensors from a local HF model dir (safetensors preferred)."""
    sd: dict[str, np.ndarray] = {}
    st_files = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            sd.update(load_file(os.path.join(model_dir, f)))
        return sd
    bin_files = sorted(f for f in os.listdir(model_dir) if f.endswith(".bin"))
    if not bin_files:
        raise FileNotFoundError(f"no safetensors/bin weights in {model_dir}")
    import torch

    for f in bin_files:
        ckpt = torch.load(
            os.path.join(model_dir, f), map_location="cpu", weights_only=True
        )
        sd.update({k: v.float().numpy() for k, v in ckpt.items()})
    return sd


def config_from_hf(model_dir: str, **over) -> llama.LlamaConfig:
    """Build a LlamaConfig from an HF config.json."""
    with open(os.path.join(model_dir, "config.json")) as f:
        c = json.load(f)
    rope_scaling = c.get("rope_scaling") or {}
    cfg = llama.LlamaConfig(
        vocab_size=c["vocab_size"],
        dim=c["hidden_size"],
        n_layers=c["num_hidden_layers"],
        n_heads=c["num_attention_heads"],
        n_kv_heads=c.get("num_key_value_heads", c["num_attention_heads"]),
        head_dim=c.get(
            "head_dim", c["hidden_size"] // c["num_attention_heads"]
        ),
        ffn_dim=c["intermediate_size"],
        norm_eps=c.get("rms_norm_eps", 1e-5),
        rope_theta=c.get("rope_theta", 10000.0),
        use_llama3_rope_scaling=rope_scaling.get("rope_type") == "llama3",
        max_seq_len=c.get("max_position_embeddings", 2048),
        tie_embeddings=c.get("tie_word_embeddings", False),
    )
    import dataclasses

    return dataclasses.replace(cfg, **over) if over else cfg


def import_llama(
    sd: dict[str, np.ndarray], cfg: llama.LlamaConfig
) -> Any:
    """HF Llama state dict -> stacked pytree.

    HF stores q/k weights in the half-split RoPE row order our apply_rope
    uses, so import is transposition only."""

    def g(name: str) -> np.ndarray:
        for p in ("", "model."):
            if p + name in sd:
                return np.asarray(sd[p + name], dtype=np.float32)
        raise KeyError(name)

    L = cfg.n_layers

    def stack_t(fmt: str) -> np.ndarray:
        return np.stack([g(fmt.format(i)).T for i in range(L)])

    def stack(fmt: str) -> np.ndarray:
        return np.stack([g(fmt.format(i)) for i in range(L)])

    params: dict[str, Any] = {
        "embed": {"embedding": g("embed_tokens.weight")},
        "layers": {
            "attn_norm": {"scale": stack("layers.{}.input_layernorm.weight")},
            "mlp_norm": {
                "scale": stack("layers.{}.post_attention_layernorm.weight")
            },
            "attn": {
                "wq": {"kernel": stack_t("layers.{}.self_attn.q_proj.weight")},
                "wk": {"kernel": stack_t("layers.{}.self_attn.k_proj.weight")},
                "wv": {"kernel": stack_t("layers.{}.self_attn.v_proj.weight")},
                "wo": {"kernel": stack_t("layers.{}.self_attn.o_proj.weight")},
            },
            "mlp": {
                "w_gate": {"kernel": stack_t("layers.{}.mlp.gate_proj.weight")},
                "w_up": {"kernel": stack_t("layers.{}.mlp.up_proj.weight")},
                "w_down": {"kernel": stack_t("layers.{}.mlp.down_proj.weight")},
            },
        },
        "norm": {"scale": g("norm.weight")},
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = {"kernel": g("lm_head.weight").T}
    return params


def export_llama(params: Any, cfg: llama.LlamaConfig) -> dict[str, np.ndarray]:
    """Inverse of import_llama (for HF-format serving export)."""
    sd: dict[str, np.ndarray] = {
        "model.embed_tokens.weight": np.asarray(params["embed"]["embedding"]),
        "model.norm.weight": np.asarray(params["norm"]["scale"]),
    }
    lyr = params["layers"]
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = np.asarray(lyr["attn_norm"]["scale"][i])
        sd[f"{p}.post_attention_layernorm.weight"] = np.asarray(
            lyr["mlp_norm"]["scale"][i]
        )
        for ours, hf in (
            ("wq", "q_proj"),
            ("wk", "k_proj"),
            ("wv", "v_proj"),
            ("wo", "o_proj"),
        ):
            sd[f"{p}.self_attn.{hf}.weight"] = np.asarray(
                lyr["attn"][ours]["kernel"][i]
            ).T
        for ours, hf in (
            ("w_gate", "gate_proj"),
            ("w_up", "up_proj"),
            ("w_down", "down_proj"),
        ):
            sd[f"{p}.mlp.{hf}.weight"] = np.asarray(lyr["mlp"][ours]["kernel"][i]).T
    if "lm_head" in params:
        sd["lm_head.weight"] = np.asarray(params["lm_head"]["kernel"]).T
    return sd


def resize_embeddings(
    params: Any, cfg: llama.LlamaConfig, new_vocab_size: int, seed: int = 0
) -> tuple[Any, llama.LlamaConfig]:
    """Resize embedding (+ lm_head) to ``new_vocab_size``; new rows are
    mean-initialized (HF resize_token_embeddings mean_resizing semantics,
    reference modeling.py:44-53)."""
    import dataclasses

    emb = np.asarray(params["embed"]["embedding"])
    old_v, d = emb.shape
    if new_vocab_size == old_v:
        return params, cfg
    rng = np.random.default_rng(seed)
    if new_vocab_size > old_v:
        mean = emb.mean(axis=0)
        new_rows = mean[None, :] + rng.standard_normal(
            (new_vocab_size - old_v, d)
        ).astype(emb.dtype) * 0.02
        new_emb = np.concatenate([emb, new_rows], axis=0)
    else:
        new_emb = emb[:new_vocab_size]
    params = dict(params)
    params["embed"] = {"embedding": new_emb}
    if "lm_head" in params:
        head = np.asarray(params["lm_head"]["kernel"])  # [D, V]
        if new_vocab_size > old_v:
            mean = head.mean(axis=1, keepdims=True)
            new_cols = mean + rng.standard_normal(
                (d, new_vocab_size - old_v)
            ).astype(head.dtype) * 0.02
            new_head = np.concatenate([head, new_cols], axis=1)
        else:
            new_head = head[:, :new_vocab_size]
        params["lm_head"] = {"kernel": new_head}
    return params, dataclasses.replace(cfg, vocab_size=new_vocab_size)


def load_model_from_hf_dir(
    model_dir: str, vocab_size: int | None = None, **cfg_over
) -> tuple[Any, llama.LlamaConfig]:
    """One-call load: config + weights + optional vocab resize
    (reference build_model, modeling.py:118-146)."""
    cfg = config_from_hf(model_dir, **cfg_over)
    sd = _load_hf_state_dict(model_dir)
    params = import_llama(sd, cfg)
    if vocab_size is not None and vocab_size != cfg.vocab_size:
        params, cfg = resize_embeddings(params, cfg, vocab_size)
    return params, cfg


def save_model_to_hf_dir(
    params: Any,
    cfg: llama.LlamaConfig,
    output_dir: str,
    eos_token_id: int | None = None,
    extra_config: dict | None = None,
) -> None:
    """Serving export (reference convert_checkpoint.py:104-108): HF-format
    safetensors + config.json; ``eos_token_id`` set to <|speech_end|> so
    generation stops at end-of-speech (convert_checkpoint.py:70-77)."""
    os.makedirs(output_dir, exist_ok=True)
    from safetensors.numpy import save_file

    sd = export_llama(params, cfg)
    # ascontiguousarray is LOAD-BEARING: export_llama's values are
    # F-contiguous transposed views, and safetensors' numpy writer emits
    # the base buffer's byte order under a C-order header — every layer
    # kernel came back TRANSPOSED on reload (caught round 5 when the
    # trained-draft speculative bench read garbage from a converted
    # checkpoint; pinned by test_hf_import.py::test_save_load_roundtrip).
    save_file(
        {k: np.ascontiguousarray(v, dtype=np.float32) for k, v in sd.items()},
        os.path.join(output_dir, "model.safetensors"),
        metadata={"format": "np"},
    )
    config = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.dim,
        "num_hidden_layers": cfg.n_layers,
        "num_attention_heads": cfg.n_heads,
        "num_key_value_heads": cfg.n_kv_heads,
        "head_dim": cfg.head_dim,
        "intermediate_size": cfg.ffn_dim,
        "rms_norm_eps": cfg.norm_eps,
        "rope_theta": cfg.rope_theta,
        "max_position_embeddings": cfg.max_seq_len,
        "tie_word_embeddings": cfg.tie_embeddings,
        "torch_dtype": "float32",
    }
    if cfg.use_llama3_rope_scaling:
        config["rope_scaling"] = {
            "rope_type": "llama3",
            "factor": 32.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192,
        }
    if eos_token_id is not None:
        config["eos_token_id"] = eos_token_id
    if extra_config:
        config.update(extra_config)
    with open(os.path.join(output_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)


# --- quantized serving artifacts ---------------------------------------------
# Beyond the reference (whose export is always full-precision safetensors,
# convert_checkpoint.py:104-108): pre-quantized serving dirs load int8/int4
# weights straight from disk — ~2x/4x smaller artifacts and host->device
# transfer, no on-chip quantization pass at startup.

_QUANT_MANIFEST = "quantized_config.json"


def _flatten_tree(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_tree(v, f"{prefix}{k}/"))
        return out
    out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten_tree(flat: dict[str, np.ndarray]) -> Any:
    root: dict = {}
    for path, v in flat.items():
        node = root
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return root


def save_quantized_dir(
    params: Any, cfg: llama.LlamaConfig, output_dir: str, bits: int
) -> None:
    """Write a quantized serving dir: flattened pytree safetensors (int8
    payloads / packed-uint8 "q4" nibbles / fp32 scales and norms) plus a
    manifest with the model geometry."""
    os.makedirs(output_dir, exist_ok=True)
    from safetensors.numpy import save_file

    save_file(
        _flatten_tree(params),
        os.path.join(output_dir, "model.quant.safetensors"),
        metadata={"format": "np"},
    )
    manifest = {
        "bits": bits,
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.dim,
        "num_hidden_layers": cfg.n_layers,
        "num_attention_heads": cfg.n_heads,
        "num_key_value_heads": cfg.n_kv_heads,
        "head_dim": cfg.head_dim,
        "intermediate_size": cfg.ffn_dim,
        "rms_norm_eps": cfg.norm_eps,
        "rope_theta": cfg.rope_theta,
        "max_position_embeddings": cfg.max_seq_len,
        "tie_word_embeddings": cfg.tie_embeddings,
        "use_llama3_rope_scaling": cfg.use_llama3_rope_scaling,
    }
    with open(os.path.join(output_dir, _QUANT_MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)


def is_quantized_dir(model_dir: str) -> bool:
    return os.path.exists(os.path.join(model_dir, _QUANT_MANIFEST))


def load_quantized_dir(model_dir: str) -> tuple[Any, llama.LlamaConfig]:
    from safetensors.numpy import load_file

    with open(os.path.join(model_dir, _QUANT_MANIFEST)) as f:
        m = json.load(f)
    cfg = llama.LlamaConfig(
        vocab_size=m["vocab_size"],
        dim=m["hidden_size"],
        n_layers=m["num_hidden_layers"],
        n_heads=m["num_attention_heads"],
        n_kv_heads=m["num_key_value_heads"],
        head_dim=m["head_dim"],
        ffn_dim=m["intermediate_size"],
        norm_eps=m["rms_norm_eps"],
        rope_theta=m["rope_theta"],
        max_seq_len=m["max_position_embeddings"],
        tie_embeddings=m["tie_word_embeddings"],
        use_llama3_rope_scaling=m["use_llama3_rope_scaling"],
    )
    flat = load_file(os.path.join(model_dir, "model.quant.safetensors"))
    return _unflatten_tree(flat), cfg


def load_serving_model(model_dir: str) -> tuple[Any, llama.LlamaConfig]:
    """Load either a quantized serving dir or a standard HF dir."""
    if is_quantized_dir(model_dir):
        return load_quantized_dir(model_dir)
    return load_model_from_hf_dir(model_dir)
