"""xcodec2 torch-checkpoint importer → JAX pytrees.

Maps the reference's prefix-filtered state dicts
(/root/reference/tts/core/codec/encoder.py:85-111, decoder.py:91-119) into
the channel-last JAX parameter trees of encoder.py / vocos.py:

- ``CodecEnc.*``               → acoustic encoder
- ``SemanticEncoder_module.*`` → semantic encoder
- ``fc_prior.*``               → fusion linear
- ``generator.quantizer.*``    → FSQ project_in / project_out
- ``generator.backbone.*``     → Vocos backbone (embed/prior/transformers/post)
- ``generator.head.*``         → ISTFT head
- ``fc_post_a.*``              → post-FSQ linear

Handles:
- weight-norm reparametrization (weight_g/weight_v, or the newer
  parametrizations.weight.original0/original1) fused into plain weights;
- layout transposes: torch Conv1d [Cout,Cin,K] → [K,Cin,Cout];
  ConvTranspose1d [Cin,Cout,K] → [K,Cout,Cin]; Linear [out,in] → [in,out].

The loader accepts either a raw mapping of name → array or a torch .pt file
(torch only needed in that case).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor (avoid importing torch unless needed)
    return x.detach().cpu().numpy()


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    elif "model" in ckpt:
        ckpt = ckpt["model"]
    return {k: _np(v) for k, v in ckpt.items()}


def filter_prefix(sd: Mapping[str, np.ndarray], prefix: str) -> dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def fuse_weight_norm(sd: Mapping[str, np.ndarray], base: str) -> np.ndarray:
    """Return the effective weight for ``base`` (fusing weight_g/weight_v if
    present; torch weight_norm dim=0)."""
    if f"{base}.weight" in sd:
        return _np(sd[f"{base}.weight"])
    for g_key, v_key in (
        (f"{base}.weight_g", f"{base}.weight_v"),
        (
            f"{base}.parametrizations.weight.original0",
            f"{base}.parametrizations.weight.original1",
        ),
    ):
        if g_key in sd:
            g = _np(sd[g_key]).astype(np.float64)
            v = _np(sd[v_key]).astype(np.float64)
            norm = np.sqrt(
                (v**2).sum(axis=tuple(range(1, v.ndim)), keepdims=True)
            )
            return (g * v / norm).astype(np.float32)
    raise KeyError(f"no weight found for {base} (tried .weight, weight_g/v)")


def conv_params(sd, base: str) -> dict[str, np.ndarray]:
    """torch Conv1d [Cout,Cin,K] → {"kernel": [K,Cin,Cout], "bias"?}."""
    w = fuse_weight_norm(sd, base)
    p = {"kernel": np.transpose(w, (2, 1, 0)).astype(np.float32)}
    if f"{base}.bias" in sd:
        p["bias"] = _np(sd[f"{base}.bias"]).astype(np.float32)
    return p


def conv_transpose_params(sd, base: str) -> dict[str, np.ndarray]:
    """torch ConvTranspose1d [Cin,Cout,K] → {"kernel": [K,Cout,Cin], "bias"?}."""
    w = fuse_weight_norm(sd, base)
    p = {"kernel": np.transpose(w, (2, 1, 0)).astype(np.float32)}
    if f"{base}.bias" in sd:
        p["bias"] = _np(sd[f"{base}.bias"]).astype(np.float32)
    return p


def linear_params(sd, base: str) -> dict[str, np.ndarray]:
    """torch Linear [out,in] → {"kernel": [in,out], "bias"?}."""
    p = {"kernel": _np(sd[f"{base}.weight"]).T.astype(np.float32)}
    if f"{base}.bias" in sd:
        p["bias"] = _np(sd[f"{base}.bias"]).astype(np.float32)
    return p


def norm_params(sd, base: str) -> dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{base}.weight"]).astype(np.float32),
        "bias": _np(sd[f"{base}.bias"]).astype(np.float32),
    }


def snake_params(sd, base: str) -> dict[str, np.ndarray]:
    """Activation1d(SnakeBeta) at ``base`` → {"alpha", "beta"}."""
    return {
        "alpha": _np(sd[f"{base}.act.alpha"]).astype(np.float32),
        "beta": _np(sd[f"{base}.act.beta"]).astype(np.float32),
    }


def fsq_params(sd, base: str = "") -> dict[str, Any]:
    pre = f"{base}." if base else ""
    return {
        "project_in": linear_params(sd, f"{pre}project_in"),
        "project_out": linear_params(sd, f"{pre}project_out"),
    }


def resnet_params(sd, base: str) -> dict[str, Any]:
    """Reference ResnetBlock (decoder_modules.py:162-223)."""
    p = {
        "norm1": norm_params(sd, f"{base}.norm1"),
        "conv1": conv_params(sd, f"{base}.conv1"),
        "norm2": norm_params(sd, f"{base}.norm2"),
        "conv2": conv_params(sd, f"{base}.conv2"),
    }
    if f"{base}.nin_shortcut.weight" in sd or f"{base}.nin_shortcut.weight_g" in sd:
        p["nin_shortcut"] = conv_params(sd, f"{base}.nin_shortcut")
    return p


# --- decoder ----------------------------------------------------------------


def import_decoder(sd: Mapping[str, np.ndarray], depth: int = 12,
                   upsample_factors: tuple[int, ...] = ()) -> dict[str, Any]:
    """Full xcodec2 state dict → vocos.init_decoder-shaped pytree."""
    gen = filter_prefix(sd, "generator.") if any(
        k.startswith("generator.") for k in sd
    ) else dict(sd)
    bb = "backbone"

    # stacked transformer blocks
    def stack(fn):
        return np.stack([fn(i) for i in range(depth)])

    blocks = {
        "att_norm": {
            "scale": stack(lambda i: _np(gen[f"{bb}.transformers.{i}.att_norm.weight"]))
        },
        "ffn_norm": {
            "scale": stack(lambda i: _np(gen[f"{bb}.transformers.{i}.ffn_norm.weight"]))
        },
        "att": {
            "c_attn": {
                "kernel": stack(
                    lambda i: _np(gen[f"{bb}.transformers.{i}.att.c_attn.weight"]).T
                )
            },
            "c_proj": {
                "kernel": stack(
                    lambda i: _np(gen[f"{bb}.transformers.{i}.att.c_proj.weight"]).T
                )
            },
        },
        "mlp": {
            "fc1": {
                "kernel": stack(
                    lambda i: _np(gen[f"{bb}.transformers.{i}.mlp.fc1.weight"]).T
                )
            },
            "fc2": {
                "kernel": stack(
                    lambda i: _np(gen[f"{bb}.transformers.{i}.mlp.fc2.weight"]).T
                )
            },
        },
    }

    params: dict[str, Any] = {
        "quantizer": fsq_params(gen, "quantizer"),
        "fc_post_a": linear_params(sd, "fc_post_a")
        if "fc_post_a.weight" in sd
        else linear_params(gen, "fc_post_a"),
        "backbone": {
            "embed": conv_params(gen, f"{bb}.embed"),
            "prior": [resnet_params(gen, f"{bb}.prior_net.{i}") for i in range(2)],
            "blocks": blocks,
            "post": [resnet_params(gen, f"{bb}.post_net.{i}") for i in range(2)],
            "final_norm": norm_params(gen, f"{bb}.final_layer_norm"),
        },
        "head": {"out": linear_params(gen, "head.out")},
    }
    if upsample_factors:
        ups = filter_prefix(sd, "upsampler.")
        layers = []
        for i in range(len(upsample_factors)):
            layers.append(
                {
                    "up": conv_transpose_params(ups, f"upsample_layers.{i}"),
                    "resnet": resnet_params(ups, f"resnet_blocks.{i}"),
                }
            )
        params["upsampler"] = {
            "layers": layers,
            "out_proj": linear_params(ups, "out_proj"),
        }
    return params


# --- encoder ----------------------------------------------------------------


def _residual_unit_params(sd, base: str) -> dict[str, Any]:
    """ResidualUnit.block = Sequential(Act1d, wn-conv, Act1d, wn-conv1x1)."""
    return {
        "act1": snake_params(sd, f"{base}.block.0"),
        "conv1": conv_params(sd, f"{base}.block.1"),
        "act2": snake_params(sd, f"{base}.block.2"),
        "conv2": conv_params(sd, f"{base}.block.3"),
    }


def _encoder_block_params(sd, base: str, n_units: int = 3) -> dict[str, Any]:
    """EncoderBlock.block = Sequential(units..., Act1d, wn-strided-conv)."""
    return {
        "units": [
            _residual_unit_params(sd, f"{base}.block.{i}") for i in range(n_units)
        ],
        "act": snake_params(sd, f"{base}.block.{n_units}"),
        "down": conv_params(sd, f"{base}.block.{n_units + 1}"),
    }


def import_encoder(sd: Mapping[str, np.ndarray], n_blocks: int = 5,
                   n_units: int = 3) -> dict[str, Any]:
    """Full xcodec2 state dict → encoder.init_encoder-shaped pytree."""
    ac = filter_prefix(sd, "CodecEnc.")
    se = filter_prefix(sd, "SemanticEncoder_module.")
    return {
        "acoustic": {
            "initial": conv_params(ac, "conv_blocks.0"),
            "blocks": [
                _encoder_block_params(ac, f"conv_blocks.{i + 1}", n_units)
                for i in range(n_blocks)
            ],
            "final_act": snake_params(ac, "conv_final_block.0"),
            "final": conv_params(ac, "conv_final_block.1"),
        },
        "semantic": {
            "initial": conv_params(se, "initial_conv"),
            "res1": conv_params(se, "residual_blocks.1"),
            "res2": conv_params(se, "residual_blocks.3"),
            "final": conv_params(se, "final_conv"),
        },
        "fusion": linear_params(sd, "fc_prior"),
        "quantizer": fsq_params(filter_prefix(sd, "generator.quantizer.")),
    }
