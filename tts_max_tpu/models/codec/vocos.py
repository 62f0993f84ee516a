"""Vocos-style codec decoder (FSQ codes → waveform) — channel-last JAX.

Re-design of the reference generator (/root/reference/tts/core/codec/
decoder_modules.py:317-464, decoder.py:14-119): FSQ index lookup →
``fc_post_a`` 2048→1024 → conv embed (k=7) → 2 prior ResnetBlocks → 12
RoPE transformer layers (dim 1024, 16 heads, interleaved-rope dim 64,
non-causal) → 2 post ResnetBlocks → LayerNorm → ISTFT head
(n_fft = 4·hop, same-padding overlap-add).

All tensors are [B, T, C] (NWC) — TPU conv layout; the torch importer
transposes NCW weights. Transformer layers are stacked + lax.scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from tts_max_tpu.models.codec import fsq
from tts_max_tpu.ops.attention import full_attention
from tts_max_tpu.ops.norms import group_norm, layer_norm, rms_norm
from tts_max_tpu.ops.rope import apply_rope_interleaved, rope_table
from tts_max_tpu.ops.stft import istft_same


@dataclass(frozen=True)
class VocosConfig:
    hidden_dim: int = 1024
    depth: int = 12
    heads: int = 16
    rope_dim: int = 64  # pos_meb_dim
    hop_length: int = 320
    vq_dim: int = 2048
    fsq: fsq.FSQConfig = field(default_factory=fsq.FSQConfig)
    resnet_groups: int = 32
    dropout: float = 0.1
    # upsampler (only for >16 kHz codecs, reference upsampler.py)
    upsample_factors: tuple[int, ...] = ()
    upsample_kernel_sizes: tuple[int, ...] = ()

    @property
    def n_fft(self) -> int:
        return self.hop_length * 4

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.heads


def tiny_vocos_config() -> VocosConfig:
    """CPU-testable miniature (keeps all structural invariants)."""
    return VocosConfig(
        hidden_dim=32,
        depth=2,
        heads=2,
        rope_dim=16,
        hop_length=320,
        vq_dim=64,
        fsq=fsq.FSQConfig(dim=64),
        resnet_groups=4,
    )


# --- primitive helpers ------------------------------------------------------


def conv1d(x: jnp.ndarray, p, stride: int = 1, padding: int = 0, dilation: int = 1,
           groups: int = 1) -> jnp.ndarray:
    """NWC conv1d; p = {"kernel": [K, Cin/groups, Cout], "bias": [Cout]?}."""
    k = p["kernel"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv_transpose1d(x: jnp.ndarray, p, stride: int, padding: int = 0) -> jnp.ndarray:
    """NWC transposed conv matching torch ConvTranspose1d semantics.

    p["kernel"]: [K, Cout, Cin] (torch layout [Cin, Cout, K] transposed by the
    importer to [K, Cout, Cin]); output length = (T-1)*stride + K - 2*padding.
    """
    k = p["kernel"].astype(x.dtype)
    y = jax.lax.conv_transpose(
        x,
        k,  # [K, Cout, Cin] + transpose_kernel=True matches torch exactly
        strides=(stride,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        transpose_kernel=True,
    )
    if padding:
        y = y[:, padding:-padding]
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def linear(x: jnp.ndarray, p) -> jnp.ndarray:
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def swish(x):
    return x * jax.nn.sigmoid(x)


# --- init helpers -----------------------------------------------------------


def _trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return (jax.random.truncated_normal(key, -2.0, 2.0, shape) * std).astype(dtype)


def init_conv(key, ksize, cin, cout, bias=True, dtype=jnp.float32, std=0.02):
    p = {"kernel": _trunc_normal(key, (ksize, cin, cout), std, dtype)}
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


def init_linear(key, cin, cout, bias=True, dtype=jnp.float32):
    p = {"kernel": (jax.random.normal(key, (cin, cout)) * cin**-0.5).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


# --- ResnetBlock (reference decoder_modules.py:162-223) ---------------------


def init_resnet_block(key, cin, cout=None, dtype=jnp.float32):
    cout = cout or cin
    ks = jax.random.split(key, 3)
    p = {
        "norm1": {"scale": jnp.ones((cin,), dtype), "bias": jnp.zeros((cin,), dtype)},
        "conv1": init_conv(ks[0], 3, cin, cout, dtype=dtype),
        "norm2": {"scale": jnp.ones((cout,), dtype), "bias": jnp.zeros((cout,), dtype)},
        "conv2": init_conv(ks[1], 3, cout, cout, dtype=dtype),
    }
    if cin != cout:
        p["nin_shortcut"] = init_conv(ks[2], 1, cin, cout, dtype=dtype)
    return p


def resnet_block(x, p, groups: int, dropout: float = 0.0, rng=None):
    h = group_norm(x, p["norm1"]["scale"], p["norm1"]["bias"], groups, eps=1e-6)
    h = swish(h)
    h = conv1d(h, p["conv1"], padding=1)
    h = group_norm(h, p["norm2"]["scale"], p["norm2"]["bias"], groups, eps=1e-6)
    h = swish(h)
    if dropout > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout, h.shape)
        h = jnp.where(keep, h / (1.0 - dropout), 0.0).astype(h.dtype)
    h = conv1d(h, p["conv2"], padding=1)
    if "nin_shortcut" in p:
        x = conv1d(x, p["nin_shortcut"])
    return x + h


# --- transformer block (stacked, reference decoder_modules.py:254-314) ------


def init_transformer_blocks(key, cfg: VocosConfig, dtype=jnp.float32):
    d, L = cfg.hidden_dim, cfg.depth
    ks = jax.random.split(key, 4)

    def dense(k, shape, fan_in):
        return (jax.random.normal(k, shape) * fan_in**-0.5).astype(dtype)

    return {
        "att_norm": {"scale": jnp.ones((L, d), dtype)},
        "ffn_norm": {"scale": jnp.ones((L, d), dtype)},
        "att": {
            "c_attn": {"kernel": dense(ks[0], (L, d, 3 * d), d)},
            "c_proj": {"kernel": dense(ks[1], (L, d, d), d)},
        },
        "mlp": {
            "fc1": {"kernel": dense(ks[2], (L, d, 4 * d), d)},
            "fc2": {"kernel": dense(ks[3], (L, 4 * d, d), 4 * d)},
        },
    }


def transformer_stack(x, stacked, cfg: VocosConfig):
    b, t, d = x.shape
    cos, sin = rope_table(cfg.rope_dim, t, theta=10000.0)

    def block(h, lp):
        y = rms_norm(h, lp["att_norm"]["scale"], eps=1e-6)
        qkv = y @ lp["att"]["c_attn"]["kernel"].astype(y.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, cfg.heads, cfg.head_dim)
        k = k.reshape(b, t, cfg.heads, cfg.head_dim)
        v = v.reshape(b, t, cfg.heads, cfg.head_dim)
        q = apply_rope_interleaved(q, cos, sin)
        k = apply_rope_interleaved(k, cos, sin)
        o = full_attention(q, k, v).reshape(b, t, d)
        h = h + o @ lp["att"]["c_proj"]["kernel"].astype(y.dtype)
        y = rms_norm(h, lp["ffn_norm"]["scale"], eps=1e-6)
        y = jax.nn.silu(y @ lp["mlp"]["fc1"]["kernel"].astype(y.dtype))
        h = h + y @ lp["mlp"]["fc2"]["kernel"].astype(y.dtype)
        return h, None

    x, _ = jax.lax.scan(block, x, stacked)
    return x


# --- backbone ---------------------------------------------------------------


def init_backbone(key, cfg: VocosConfig, dtype=jnp.float32):
    d = cfg.hidden_dim
    ks = jax.random.split(key, 6)
    return {
        "embed": init_conv(ks[0], 7, d, d, dtype=dtype),
        "prior": [
            init_resnet_block(ks[1], d, dtype=dtype),
            init_resnet_block(ks[2], d, dtype=dtype),
        ],
        "blocks": init_transformer_blocks(ks[3], cfg, dtype),
        "post": [
            init_resnet_block(ks[4], d, dtype=dtype),
            init_resnet_block(ks[5], d, dtype=dtype),
        ],
        "final_norm": {
            "scale": jnp.ones((d,), dtype),
            "bias": jnp.zeros((d,), dtype),
        },
    }


def backbone(x, p, cfg: VocosConfig, dropout_rng=None):
    """x: [B, T, hidden] -> [B, T, hidden]."""
    rngs = (
        jax.random.split(dropout_rng, 4) if dropout_rng is not None else [None] * 4
    )
    x = conv1d(x, p["embed"], padding=3)
    for i, rp in enumerate(p["prior"]):
        x = resnet_block(x, rp, cfg.resnet_groups, cfg.dropout, rngs[i])
    x = transformer_stack(x, p["blocks"], cfg)
    for i, rp in enumerate(p["post"]):
        x = resnet_block(x, rp, cfg.resnet_groups, cfg.dropout, rngs[2 + i])
    return layer_norm(x, p["final_norm"]["scale"], p["final_norm"]["bias"], eps=1e-6)


# --- ISTFT head (reference decoder_modules.py:96-148) -----------------------


def init_istft_head(key, cfg: VocosConfig, dim: int | None = None, dtype=jnp.float32):
    return {"out": init_linear(key, dim or cfg.hidden_dim, cfg.n_fft + 2, dtype=dtype)}


def istft_head(x, p, cfg: VocosConfig) -> jnp.ndarray:
    """x: [B, T, H] -> wav [B, T * hop]."""
    pred = linear(x.astype(jnp.float32), p["out"])  # [B, T, n_fft+2]
    pred = jnp.swapaxes(pred, 1, 2)  # [B, n_fft+2, T]
    mag, phase = jnp.split(pred, 2, axis=1)
    mag = jnp.minimum(jnp.exp(mag), 1e2)  # safeguard (reference :135-137)
    spec = mag * (jnp.cos(phase) + 1j * jnp.sin(phase))
    return istft_same(spec, cfg.n_fft, cfg.hop_length)


# --- upsampler (reference upsampler.py:9-69) --------------------------------


def init_upsampler(key, cfg: VocosConfig, dtype=jnp.float32):
    cin = cfg.hidden_dim
    layers = []
    ks = jax.random.split(key, 2 * len(cfg.upsample_factors) + 1)
    for i, (k, u) in enumerate(zip(cfg.upsample_kernel_sizes, cfg.upsample_factors)):
        c_in, c_out = cin // (2**i), cin // (2 ** (i + 1))
        layers.append(
            {
                # ConvTranspose1d weight [Cin, Cout, K] -> stored [K, Cout, Cin]
                "up": {
                    "kernel": _trunc_normal(ks[2 * i], (k, c_out, c_in), 0.02, dtype),
                    "bias": jnp.zeros((c_out,), dtype),
                },
                "resnet": init_resnet_block(ks[2 * i + 1], c_out, dtype=dtype),
            }
        )
    c_final = cin // (2 ** len(cfg.upsample_factors))
    return {"layers": layers, "out_proj": init_linear(ks[-1], c_final, cin, dtype=dtype)}


def upsampler(x, p, cfg: VocosConfig) -> jnp.ndarray:
    """x: [B, T, C] -> [B, T * prod(factors), hidden_dim]."""
    for layer, k, u in zip(p["layers"], cfg.upsample_kernel_sizes, cfg.upsample_factors):
        x = conv_transpose1d(x, layer["up"], stride=u, padding=(k - u) // 2)
        x = resnet_block(x, layer["resnet"], cfg.resnet_groups)
    return swish(linear(x, p["out_proj"]))


# --- full decoder (reference decoder.py:14-89) ------------------------------


def init_decoder(key, cfg: VocosConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    p = {
        "quantizer": fsq.init_params(ks[0], cfg.fsq, dtype),
        "fc_post_a": init_linear(ks[1], cfg.vq_dim, cfg.hidden_dim, dtype=dtype),
        "backbone": init_backbone(ks[2], cfg, dtype),
        "head": init_istft_head(ks[3], cfg, dtype=dtype),
    }
    if cfg.upsample_factors:
        p["upsampler"] = init_upsampler(ks[4], cfg, dtype)
    return p


def decode(params, codes: jnp.ndarray, cfg: VocosConfig, dropout_rng=None) -> jnp.ndarray:
    """FSQ indices [B, T] -> waveform [B, T * hop * prod(upsample_factors)]."""
    emb = fsq.decode_indices(params["quantizer"], codes, cfg.fsq)  # [B, T, vq_dim]
    h = linear(emb, params["fc_post_a"])
    h = backbone(h, params["backbone"], cfg, dropout_rng)
    if "upsampler" in params:
        h = upsampler(h, params["upsampler"], cfg)
    return istft_head(h, params["head"], cfg)
