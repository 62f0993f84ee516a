"""ECAPA-TDNN speaker-verification embedder — JAX, channel-last.

Re-design of the reference's third-party ECAPA-TDNN
(/root/reference/tts/training/rlhf/ecapa_tdnn.py, reward-only model):
Res2Net SE blocks (scale 8, dilations 2/3/4), multi-layer feature
concatenation, attentive statistics pooling, 256-d embedding.

Feature input is pluggable like the reference's ``feat_type``:
- "fbank": log-mel filterbanks computed here (dependency-free path);
- external features (e.g. WavLM hidden states) can be passed directly to
  :func:`embed_features`.

BatchNorms run in inference mode (running statistics) — the model is used
frozen for the similarity reward. A torch state-dict importer maps UniSpeech
ECAPA checkpoints into the pytree.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tts_max_tpu.models.codec.vocos import conv1d
from tts_max_tpu.ops.stft import mel_spectrogram


@dataclass(frozen=True)
class ECAPAConfig:
    feat_dim: int = 80
    channels: int = 512
    emb_dim: int = 256
    scale: int = 8
    se_bottleneck_dim: int = 128
    attention_channels: int = 128
    cat_channels: int = 1536  # conv output before pooling

    @property
    def width(self) -> int:
        return self.channels // self.scale


def tiny_ecapa_config() -> ECAPAConfig:
    return ECAPAConfig(feat_dim=16, channels=32, emb_dim=8, scale=4,
                       se_bottleneck_dim=8, attention_channels=8,
                       cat_channels=48)


# --- init -------------------------------------------------------------------


def _conv_bn(key, cin, cout, k, dtype=jnp.float32):
    return {
        "conv": {
            "kernel": (jax.random.normal(key, (k, cin, cout)) * (cin * k) ** -0.5
                       ).astype(dtype),
            "bias": jnp.zeros((cout,), dtype),
        },
        "bn": {
            "scale": jnp.ones((cout,), dtype),
            "bias": jnp.zeros((cout,), dtype),
            "mean": jnp.zeros((cout,), dtype),
            "var": jnp.ones((cout,), dtype),
        },
    }


def init_params(rng: jax.Array, cfg: ECAPAConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(rng, 64))
    C, W = cfg.channels, cfg.width

    def se_res2_block(k):
        keys = jax.random.split(k, cfg.scale + 4)
        return {
            "conv1": _conv_bn(keys[0], C, C, 1, dtype),
            "res2": {
                "convs": [
                    _conv_bn(keys[1 + i], W, W, 3, dtype)
                    for i in range(cfg.scale - 1)
                ]
            },
            "conv2": _conv_bn(keys[cfg.scale], C, C, 1, dtype),
            "se": {
                "linear1": {
                    "kernel": (jax.random.normal(keys[cfg.scale + 1],
                                                 (C, cfg.se_bottleneck_dim))
                               * C**-0.5).astype(dtype),
                    "bias": jnp.zeros((cfg.se_bottleneck_dim,), dtype),
                },
                "linear2": {
                    "kernel": (jax.random.normal(keys[cfg.scale + 2],
                                                 (cfg.se_bottleneck_dim, C))
                               * cfg.se_bottleneck_dim**-0.5).astype(dtype),
                    "bias": jnp.zeros((C,), dtype),
                },
            },
        }

    CC = cfg.cat_channels
    return {
        "layer1": _conv_bn(next(ks), cfg.feat_dim, C, 5, dtype),
        "layer2": se_res2_block(next(ks)),
        "layer3": se_res2_block(next(ks)),
        "layer4": se_res2_block(next(ks)),
        "conv": {
            "kernel": (jax.random.normal(next(ks), (1, 3 * C, CC))
                       * (3 * C) ** -0.5).astype(dtype),
            "bias": jnp.zeros((CC,), dtype),
        },
        "pooling": {
            "linear1": {
                "kernel": (jax.random.normal(next(ks),
                                             (1, CC, cfg.attention_channels))
                           * CC**-0.5).astype(dtype),
                "bias": jnp.zeros((cfg.attention_channels,), dtype),
            },
            "linear2": {
                "kernel": (jax.random.normal(next(ks),
                                             (1, cfg.attention_channels, CC))
                           * cfg.attention_channels**-0.5).astype(dtype),
                "bias": jnp.zeros((CC,), dtype),
            },
        },
        "bn": {
            "scale": jnp.ones((2 * CC,), dtype),
            "bias": jnp.zeros((2 * CC,), dtype),
            "mean": jnp.zeros((2 * CC,), dtype),
            "var": jnp.ones((2 * CC,), dtype),
        },
        "linear": {
            "kernel": (jax.random.normal(next(ks), (2 * CC, cfg.emb_dim))
                       * (2 * CC) ** -0.5).astype(dtype),
            "bias": jnp.zeros((cfg.emb_dim,), dtype),
        },
    }


# --- forward ----------------------------------------------------------------


def _bn(x, p, eps=1e-5):
    """Inference-mode BatchNorm over the channel (last) axis."""
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps) * p["scale"] + p["bias"]


def _conv_relu_bn(x, p, padding=0, dilation=1):
    """conv -> relu -> bn (reference Conv1dReluBn, ecapa_tdnn.py:74-94)."""
    x = conv1d(x, p["conv"], padding=padding, dilation=dilation)
    return _bn(jax.nn.relu(x), p["bn"])


def _res2(x, p, cfg: ECAPAConfig, padding, dilation):
    """Res2Net hierarchy (reference Res2Conv1dReluBn, :13-68)."""
    spx = jnp.split(x, cfg.scale, axis=-1)
    out = []
    sp = None
    for i, cp in enumerate(p["convs"]):
        sp = spx[i] if i == 0 else sp + spx[i]
        sp = conv1d(sp, cp["conv"], padding=padding, dilation=dilation)
        sp = _bn(jax.nn.relu(sp), cp["bn"])
        out.append(sp)
    out.append(spx[-1])
    return jnp.concatenate(out, axis=-1)


def _se(x, p):
    """Squeeze-excitation (reference SE_Connect, :97-110)."""
    s = jnp.mean(x, axis=1)  # [B, C]
    s = jax.nn.relu(s @ p["linear1"]["kernel"] + p["linear1"]["bias"])
    s = jax.nn.sigmoid(s @ p["linear2"]["kernel"] + p["linear2"]["bias"])
    return x * s[:, None, :]


def _se_res2_block(x, p, cfg: ECAPAConfig, padding, dilation):
    residual = x  # in==out channels in this topology
    x = _conv_relu_bn(x, p["conv1"])
    x = _res2(x, p["res2"], cfg, padding, dilation)
    x = _conv_relu_bn(x, p["conv2"])
    x = _se(x, p["se"])
    return x + residual


def _attentive_stats_pool(x, p):
    """Attentive weighted mean/std pooling (reference :174-210).
    x: [B, T, C] -> [B, 2C]."""
    alpha = jnp.tanh(conv1d(x, p["linear1"]))
    alpha = jax.nn.softmax(conv1d(alpha, p["linear2"]), axis=1)
    mean = jnp.sum(alpha * x, axis=1)
    var = jnp.sum(alpha * x**2, axis=1) - mean**2
    std = jnp.sqrt(jnp.maximum(var, 1e-9))
    return jnp.concatenate([mean, std], axis=-1)


def embed_features(params, feats: jnp.ndarray, cfg: ECAPAConfig) -> jnp.ndarray:
    """feats [B, T, feat_dim] (instance-normalized log features) ->
    embeddings [B, emb_dim]."""
    # instance norm over time per channel (reference instance_norm)
    mean = jnp.mean(feats, axis=1, keepdims=True)
    var = jnp.var(feats, axis=1, keepdims=True)
    x = (feats - mean) * jax.lax.rsqrt(var + 1e-5)

    out1 = _conv_relu_bn(x, params["layer1"], padding=2)
    out2 = _se_res2_block(out1, params["layer2"], cfg, padding=2, dilation=2)
    out3 = _se_res2_block(out2, params["layer3"], cfg, padding=3, dilation=3)
    out4 = _se_res2_block(out3, params["layer4"], cfg, padding=4, dilation=4)
    out = jnp.concatenate([out2, out3, out4], axis=-1)
    out = jax.nn.relu(conv1d(out, params["conv"]))
    out = _bn(_attentive_stats_pool(out, params["pooling"]), params["bn"])
    return out @ params["linear"]["kernel"] + params["linear"]["bias"]


def fbank_features(wav: jnp.ndarray, sample_rate: int = 16000,
                   n_mels: int = 80) -> jnp.ndarray:
    """log-mel fbank features [B, T, n_mels] (reference feat_type='fbank')."""
    mel = mel_spectrogram(wav, sample_rate, 400, 160, n_mels, power=2.0)
    return jnp.swapaxes(jnp.log(mel + 1e-6), 1, 2)


def make_embed_fn(params=None, cfg: ECAPAConfig | None = None,
                  rng_seed: int = 0):
    """``embed_fn(audio [n]) -> [emb_dim]`` for SimilarityRewardFunc."""
    cfg = cfg or ECAPAConfig()
    if params is None:
        params = init_params(jax.random.PRNGKey(rng_seed), cfg)
    run = jax.jit(lambda p, f: embed_features(p, f, cfg))

    def embed(audio: np.ndarray) -> np.ndarray:
        feats = fbank_features(
            jnp.asarray(audio, jnp.float32)[None], n_mels=cfg.feat_dim
        )
        return np.asarray(run(params, feats))[0]

    return embed


def make_wavlm_embed_fn(
    wavlm_params,
    wavlm_cfg,
    ecapa_params=None,
    ecapa_cfg: ECAPAConfig | None = None,
    feature_weight=None,
    rng_seed: int = 0,
):
    """``embed_fn(audio [n]) -> [emb_dim]`` over WavLM hidden states — the
    reference's default similarity path (ecapa_tdnn.py:220-258,344-360:
    feat_type='wavlm_large', all hidden states combined with
    softmax-learned layer weights, then ECAPA-TDNN).

    ``feature_weight``: [num_layers+1] logits (zeros = uniform, the
    reference's init; UniSpeech checkpoints carry trained values)."""
    from tts_max_tpu.models import wavlm as wavlm_mod

    ecapa_cfg = ecapa_cfg or ECAPAConfig(feat_dim=wavlm_cfg.hidden_size)
    if ecapa_params is None:
        ecapa_params = init_params(jax.random.PRNGKey(rng_seed), ecapa_cfg)
    if feature_weight is None:
        feature_weight = jnp.zeros((wavlm_cfg.num_layers + 1,), jnp.float32)
    feature_weight = jnp.asarray(feature_weight, jnp.float32)

    @jax.jit
    def run(audio):
        stack = wavlm_mod.encode(wavlm_params, wavlm_cfg, audio)  # [L+1,B,T,D]
        w = jax.nn.softmax(feature_weight)
        feats = jnp.einsum("l,lbtd->btd", w, stack.astype(jnp.float32))
        return embed_features(ecapa_params, feats, ecapa_cfg)

    def embed(audio: np.ndarray) -> np.ndarray:
        return np.asarray(run(jnp.asarray(audio, jnp.float32)[None]))[0]

    return embed


def load_wavlm_similarity_embedder(
    wavlm_dir: str, ecapa_checkpoint: str | None = None
):
    """Build the reference similarity backend from local files: an HF WavLM
    dir (+ optionally a UniSpeech ECAPA_TDNN_SMALL torch checkpoint, which
    also carries the trained ``feature_weight`` layer logits)."""
    from tts_max_tpu.models import wavlm as wavlm_mod

    wavlm_params, wavlm_cfg = wavlm_mod.load_wavlm(wavlm_dir)
    ecapa_cfg = ECAPAConfig(feat_dim=wavlm_cfg.hidden_size)
    ecapa_params = None
    feature_weight = None
    if ecapa_checkpoint:
        import torch

        sd = torch.load(ecapa_checkpoint, map_location="cpu", weights_only=True)
        sd = sd.get("model", sd)
        sd = {k.removeprefix("module."): v for k, v in sd.items()}
        ecapa_params = jax.tree.map(
            jnp.asarray, import_torch_state_dict(sd, ecapa_cfg)
        )
        if "feature_weight" in sd:
            feature_weight = np.asarray(sd["feature_weight"].float())
    return make_wavlm_embed_fn(
        wavlm_params, wavlm_cfg, ecapa_params, ecapa_cfg, feature_weight
    )


# --- torch checkpoint import ------------------------------------------------


def import_torch_state_dict(sd, cfg: ECAPAConfig) -> dict:
    """UniSpeech/reference ECAPA state dict -> pytree (channel-last)."""

    def g(name):
        v = sd[name]
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    def conv_bn(base):
        return {
            "conv": {
                "kernel": np.transpose(g(f"{base}.conv.weight"), (2, 1, 0)),
                "bias": g(f"{base}.conv.bias"),
            },
            "bn": {
                "scale": g(f"{base}.bn.weight"),
                "bias": g(f"{base}.bn.bias"),
                "mean": g(f"{base}.bn.running_mean"),
                "var": g(f"{base}.bn.running_var"),
            },
        }

    def res2(base):
        convs = []
        for i in range(cfg.scale - 1):
            convs.append(
                {
                    "conv": {
                        "kernel": np.transpose(
                            g(f"{base}.convs.{i}.weight"), (2, 1, 0)
                        ),
                        "bias": g(f"{base}.convs.{i}.bias"),
                    },
                    "bn": {
                        "scale": g(f"{base}.bns.{i}.weight"),
                        "bias": g(f"{base}.bns.{i}.bias"),
                        "mean": g(f"{base}.bns.{i}.running_mean"),
                        "var": g(f"{base}.bns.{i}.running_var"),
                    },
                }
            )
        return {"convs": convs}

    def linear(base):
        return {"kernel": g(f"{base}.weight").T, "bias": g(f"{base}.bias")}

    def se_block(base):
        return {
            "conv1": conv_bn(f"{base}.Conv1dReluBn1"),
            "res2": res2(f"{base}.Res2Conv1dReluBn"),
            "conv2": conv_bn(f"{base}.Conv1dReluBn2"),
            "se": {
                "linear1": linear(f"{base}.SE_Connect.linear1"),
                "linear2": linear(f"{base}.SE_Connect.linear2"),
            },
        }

    return {
        "layer1": conv_bn("layer1"),
        "layer2": se_block("layer2"),
        "layer3": se_block("layer3"),
        "layer4": se_block("layer4"),
        "conv": {
            "kernel": np.transpose(g("conv.weight"), (2, 1, 0)),
            "bias": g("conv.bias"),
        },
        "pooling": {
            "linear1": {
                "kernel": np.transpose(g("pooling.linear1.weight"), (2, 1, 0)),
                "bias": g("pooling.linear1.bias"),
            },
            "linear2": {
                "kernel": np.transpose(g("pooling.linear2.weight"), (2, 1, 0)),
                "bias": g("pooling.linear2.bias"),
            },
        },
        "bn": {
            "scale": g("bn.weight"),
            "bias": g("bn.bias"),
            "mean": g("bn.running_mean"),
            "var": g("bn.running_var"),
        },
        "linear": linear("linear"),
    }
