# -*- coding: utf-8 -*-
"""Generate the full-graph codec golden fixtures (tests/fixtures/codec_golden.npz).

Builds the reference codec's FULL encoder (wav -> FSQ codes) and decoder
(codes -> wav) graphs in plain torch (NCW layout, torch-native ops:
weight-normed Conv1d, conv_transpose/conv anti-aliased resampling, SDPA
attention, irfft+fold ISTFT), with random weights at tiny shapes, and saves

  - the torch state_dict in xcodec2 key format (what torch_import consumes),
  - the inputs (wav, semantic features / codes),
  - the outputs (codes / waveform) plus intermediates for localization.

The JAX graphs (models/codec/{encoder,vocos}.py, NWC + XLA convs + our own
kaiser/ISTFT/FSQ) must reproduce these outputs after torch_import — this is
the checked-in end-to-end numerical gate the env-gated real-weight tests
(XCODEC2_CHECKPOINT) can't provide on an air-gapped image.

Graph structure follows the reference architecture:
  encoder:  /root/reference/tts/core/codec/encoder.py:17-83,
            encoder_modules.py:20-213, activations.py:8-110, filters.py:15-135
  decoder:  /root/reference/tts/core/codec/decoder.py:14-89,
            decoder_modules.py:19-148,162-464

Run once (torch CPU):  python tests/fixtures/generate_codec_golden.py
"""

import math
import os
import sys

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

torch.manual_seed(0)
torch.set_default_dtype(torch.float32)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "codec_golden.npz")

# tiny shapes matching encoder.tiny_encoder_config / vocos.tiny_vocos_config
GEN_FEATURES = 4
UP_RATIOS = (2, 2, 4, 4, 5)
DILATIONS = (1, 3, 9)
ACOUSTIC_DIM = 32
SEM_IN, SEM_DIM = 8, 32
FSQ_LEVELS = (4,) * 8

DEC_HIDDEN = 32
DEC_DEPTH = 2
DEC_HEADS = 2
DEC_ROPE = 16
HOP = 320
VQ_DIM = 64
GROUPS = 4
N_FFT = 4 * HOP


# --- alias-free DSP (reference filters.py:15-135, activations.py:44-110) -----


def kaiser_beta(half_size: int, half_width: float) -> float:
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        return 0.1102 * (a - 8.7)
    if a >= 21.0:
        return 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    return 0.0


def kaiser_taps(cutoff: float, half_width: float, K: int) -> torch.Tensor:
    half = K // 2
    beta = kaiser_beta(half, half_width)
    win = torch.kaiser_window(K, beta=beta, periodic=False, dtype=torch.float64)
    if K % 2 == 0:
        time = torch.arange(-half, half, dtype=torch.float64) + 0.5
    else:
        time = torch.arange(K, dtype=torch.float64) - half
    taps = 2 * cutoff * win * torch.sinc(2 * cutoff * time)
    taps = taps / taps.sum()
    return taps.float()


class SnakeBeta(nn.Module):
    def __init__(self, c: int):
        super().__init__()
        self.alpha = nn.Parameter(torch.randn(c) * 0.2)
        self.beta = nn.Parameter(torch.randn(c) * 0.2)

    def forward(self, x):  # [B, C, T]
        a = torch.exp(self.alpha)[None, :, None]
        b = torch.exp(self.beta)[None, :, None]
        return x + (1.0 / (b + 1e-9)) * torch.sin(x * a) ** 2


class Activation1d(nn.Module):
    """up-2x -> SnakeBeta -> down-2x (reference activations.py:85-110)."""

    RATIO, K = 2, 12

    def __init__(self, c: int):
        super().__init__()
        self.act = SnakeBeta(c)
        r, K = self.RATIO, self.K
        self.up_taps = kaiser_taps(0.5 / r, 0.6 / r, K)
        self.down_taps = kaiser_taps(0.5 / r, 0.6 / r, K)
        self.up_pad = K // r - 1
        self.up_left = self.up_pad * r + (K - r) // 2
        self.up_right = self.up_pad * r + (K - r + 1) // 2
        self.dn_left = K // 2 - 1  # even K
        self.dn_right = K // 2

    def forward(self, x):  # [B, C, T]
        c = x.shape[1]
        w = self.up_taps.view(1, 1, -1).expand(c, 1, -1)
        h = F.pad(x, (self.up_pad, self.up_pad), mode="replicate")
        h = self.RATIO * F.conv_transpose1d(h, w, stride=self.RATIO, groups=c)
        h = h[..., self.up_left : -self.up_right]
        h = self.act(h)
        h = F.pad(h, (self.dn_left, self.dn_right), mode="replicate")
        w = self.down_taps.view(1, 1, -1).expand(c, 1, -1)
        return F.conv1d(h, w, stride=self.RATIO, groups=c)


# --- acoustic / semantic encoders (reference encoder_modules.py) -------------


def wn(conv):
    return torch.nn.utils.weight_norm(conv)


class ResidualUnit(nn.Module):
    def __init__(self, c: int, dilation: int):
        super().__init__()
        pad = ((7 - 1) * dilation) // 2
        self.block = nn.Sequential(
            Activation1d(c),
            wn(nn.Conv1d(c, c, 7, dilation=dilation, padding=pad)),
            Activation1d(c),
            wn(nn.Conv1d(c, c, 1)),
        )

    def forward(self, x):
        return x + self.block(x)


class EncoderBlock(nn.Module):
    def __init__(self, cout: int, stride: int):
        super().__init__()
        cin = cout // 2
        pad = stride // 2 + stride % 2
        self.block = nn.Sequential(
            *[ResidualUnit(cin, d) for d in DILATIONS],
            Activation1d(cin),
            wn(nn.Conv1d(cin, cout, 2 * stride, stride=stride, padding=pad)),
        )

    def forward(self, x):
        return self.block(x)


class CodecEnc(nn.Module):
    def __init__(self):
        super().__init__()
        d = GEN_FEATURES
        blocks = [wn(nn.Conv1d(1, d, 7, padding=3))]
        for s in UP_RATIOS:
            d *= 2
            blocks.append(EncoderBlock(d, s))
        self.conv_blocks = nn.Sequential(*blocks)
        self.conv_final_block = nn.Sequential(
            Activation1d(d), wn(nn.Conv1d(d, ACOUSTIC_DIM, 3, padding=1))
        )

    def forward(self, wav):  # [B, L] -> [B, T, C]
        x = self.conv_blocks(wav[:, None, :])
        x = self.conv_final_block(x)
        return x.transpose(1, 2)


class SemanticEncoderModule(nn.Module):
    def __init__(self):
        super().__init__()
        self.initial_conv = nn.Conv1d(SEM_IN, SEM_DIM, 3, padding=1, bias=False)
        self.residual_blocks = nn.Sequential(
            nn.ReLU(),
            nn.Conv1d(SEM_DIM, SEM_DIM, 3, padding=1),
            nn.ReLU(),
            nn.Conv1d(SEM_DIM, SEM_DIM, 3, padding=1),
        )
        self.final_conv = nn.Conv1d(SEM_DIM, SEM_DIM, 3, padding=1, bias=False)

    def forward(self, feats):  # [B, T, C]
        x = self.initial_conv(feats.transpose(1, 2))
        x = x + self.residual_blocks(x)
        return self.final_conv(x).transpose(1, 2)


# --- FSQ (levels [4]*8; vector_quantize_pytorch semantics) -------------------


class FSQ(nn.Module):
    EPS = 1e-3

    def __init__(self, dim: int):
        super().__init__()
        cd = len(FSQ_LEVELS)
        self.project_in = nn.Linear(dim, cd)
        self.project_out = nn.Linear(cd, dim)
        self.levels = torch.tensor(FSQ_LEVELS, dtype=torch.float32)
        self.basis = torch.tensor(
            np.concatenate([[1], np.cumprod(FSQ_LEVELS[:-1])]).astype(np.int64)
        )

    def bound(self, z):
        half_l = (self.levels - 1) * (1 + self.EPS) / 2
        offset = torch.where(self.levels % 2 == 0, 0.5, 0.0)
        shift = torch.atanh(offset / half_l)
        return torch.tanh(z + shift) * half_l - offset

    def quantize(self, z):
        bounded = self.bound(z)
        rounded = torch.round(bounded)
        half_width = self.levels // 2
        return rounded / half_width, bounded

    def codes_to_indices(self, codes):
        half_width = self.levels // 2
        digits = codes * half_width + half_width
        return torch.round((digits * self.basis).sum(-1)).long()

    def indices_to_codes(self, idx):
        digits = (idx[..., None] // self.basis) % self.levels.long()
        half_width = self.levels // 2
        return (digits.float() - half_width) / half_width

    def encode(self, x):
        z = self.project_in(x)
        codes, bounded = self.quantize(z)
        idx = self.codes_to_indices(codes)
        return self.project_out(codes), idx, bounded

    def decode(self, idx):
        return self.project_out(self.indices_to_codes(idx))


# --- decoder: Vocos backbone + ISTFT head ------------------------------------


class ResnetBlock(nn.Module):
    def __init__(self, c: int):
        super().__init__()
        self.norm1 = nn.GroupNorm(GROUPS, c, eps=1e-6)
        self.conv1 = nn.Conv1d(c, c, 3, padding=1)
        self.norm2 = nn.GroupNorm(GROUPS, c, eps=1e-6)
        self.conv2 = nn.Conv1d(c, c, 3, padding=1)

    def forward(self, x):  # [B, C, T]
        h = F.silu(self.norm1(x))
        h = self.conv1(h)
        h = F.silu(self.norm2(h))
        return x + self.conv2(h)


class RMSNorm(nn.Module):
    def __init__(self, c: int):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(c))

    def forward(self, x):
        var = x.pow(2).mean(-1, keepdim=True)
        return x * torch.rsqrt(var + 1e-6) * self.weight


def rope_interleaved(x, theta=10000.0):
    """x: [B, H, T, D]; torchtune interleaved-pair convention."""
    b, h, t, d = x.shape
    freqs = 1.0 / (
        theta ** (torch.arange(0, d, 2, dtype=torch.float64) / d)
    )
    ang = torch.outer(torch.arange(t, dtype=torch.float64), freqs)
    cos = ang.cos().float()[None, None]  # [1,1,T,D/2]
    sin = ang.sin().float()[None, None]
    xp = x.reshape(b, h, t, d // 2, 2)
    x1, x2 = xp[..., 0], xp[..., 1]
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    return torch.stack([o1, o2], dim=-1).reshape(b, h, t, d)


class Attention(nn.Module):
    def __init__(self, d: int):
        super().__init__()
        self.c_attn = nn.Linear(d, 3 * d, bias=False)
        self.c_proj = nn.Linear(d, d, bias=False)

    def forward(self, x):  # [B, T, D]
        b, t, d = x.shape
        hd = d // DEC_HEADS
        q, k, v = self.c_attn(x).split(d, dim=-1)
        q = q.view(b, t, DEC_HEADS, hd).transpose(1, 2)
        k = k.view(b, t, DEC_HEADS, hd).transpose(1, 2)
        v = v.view(b, t, DEC_HEADS, hd).transpose(1, 2)
        q, k = rope_interleaved(q), rope_interleaved(k)
        o = F.scaled_dot_product_attention(q, k, v)  # non-causal
        return self.c_proj(o.transpose(1, 2).reshape(b, t, d))


class MLP(nn.Module):
    def __init__(self, d: int):
        super().__init__()
        self.fc1 = nn.Linear(d, 4 * d, bias=False)
        self.fc2 = nn.Linear(4 * d, d, bias=False)

    def forward(self, x):
        return self.fc2(F.silu(self.fc1(x)))


class TransformerBlock(nn.Module):
    def __init__(self, d: int):
        super().__init__()
        self.att_norm = RMSNorm(d)
        self.ffn_norm = RMSNorm(d)
        self.att = Attention(d)
        self.mlp = MLP(d)

    def forward(self, x):
        x = x + self.att(self.att_norm(x))
        return x + self.mlp(self.ffn_norm(x))


class Backbone(nn.Module):
    def __init__(self):
        super().__init__()
        d = DEC_HIDDEN
        self.embed = nn.Conv1d(d, d, 7, padding=3)
        self.prior_net = nn.Sequential(ResnetBlock(d), ResnetBlock(d))
        self.transformers = nn.Sequential(
            *[TransformerBlock(d) for _ in range(DEC_DEPTH)]
        )
        self.post_net = nn.Sequential(ResnetBlock(d), ResnetBlock(d))
        self.final_layer_norm = nn.LayerNorm(d, eps=1e-6)

    def forward(self, x):  # [B, T, D]
        x = self.embed(x.transpose(1, 2))
        x = self.prior_net(x)
        x = self.transformers(x.transpose(1, 2))
        x = self.post_net(x.transpose(1, 2)).transpose(1, 2)
        return self.final_layer_norm(x)


class ISTFTHead(nn.Module):
    def __init__(self):
        super().__init__()
        self.out = nn.Linear(DEC_HIDDEN, N_FFT + 2)

    def forward(self, x):  # [B, T, D] -> [B, T*hop]
        pred = self.out(x).transpose(1, 2)  # [B, n_fft+2, T]
        mag, phase = pred.chunk(2, dim=1)
        mag = torch.exp(mag).clamp(max=1e2)
        spec = mag * (torch.cos(phase) + 1j * torch.sin(phase))
        return istft_same(spec, N_FFT, HOP)


def istft_same(spec, n_fft, hop):
    """Reference 'same-padding' ISTFT (decoder_modules.py:19-93)."""
    window = torch.hann_window(n_fft)
    B, _, T = spec.shape
    ifft = torch.fft.irfft(spec, n_fft, dim=1)  # [B, n_fft, T]
    frames = ifft * window[None, :, None]
    out_len = (T - 1) * hop + n_fft
    y = F.fold(
        frames, output_size=(1, out_len), kernel_size=(1, n_fft), stride=(1, hop)
    )[:, 0, 0, :]
    env = F.fold(
        (window**2)[None, :, None].expand(1, n_fft, T),
        output_size=(1, out_len), kernel_size=(1, n_fft), stride=(1, hop),
    )[:, 0, 0, :]
    pad = (n_fft - hop) // 2
    y = y[:, pad:-pad]
    env = env[:, pad:-pad].clamp(min=1e-11)
    return y / env


class Generator(nn.Module):
    def __init__(self):
        super().__init__()
        self.quantizer = FSQ(VQ_DIM)
        self.backbone = Backbone()
        self.head = ISTFTHead()


class FullModel(nn.Module):
    """State-dict container in xcodec2 key format."""

    def __init__(self):
        super().__init__()
        self.CodecEnc = CodecEnc()
        self.SemanticEncoder_module = SemanticEncoderModule()
        # fused dim == vq_dim: the ONE generator.quantizer is shared by the
        # encode and decode paths, exactly as in xcodec2 checkpoints
        self.fc_prior = nn.Linear(SEM_DIM + ACOUSTIC_DIM, VQ_DIM)
        self.generator = Generator()
        self.fc_post_a = nn.Linear(VQ_DIM, DEC_HIDDEN)


def main():
    model = FullModel().eval()
    # non-degenerate norm/linear params (defaults are ones/zeros)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.ndim == 1 and ("norm" in name or "alpha" in name
                                or "beta" in name):
                continue  # keep norm scales / snake params as initialized
        # randomize norm scales slightly so fusion bugs can't hide behind 1.0
        for m in model.modules():
            if isinstance(m, (nn.GroupNorm, nn.LayerNorm)):
                m.weight.mul_(0.0).add_(torch.randn_like(m.weight) * 0.2 + 1.0)
                m.bias.add_(torch.randn_like(m.bias) * 0.1)
            elif isinstance(m, RMSNorm):
                m.weight.mul_(0.0).add_(torch.randn_like(m.weight) * 0.2 + 1.0)

    B, T = 2, 10
    L = T * int(np.prod(UP_RATIOS))
    g = torch.Generator().manual_seed(7)
    wav = torch.rand((B, L), generator=g) * 1.6 - 0.8
    feats = torch.randn((B, T, SEM_IN), generator=g)

    with torch.no_grad():
        ac = model.CodecEnc(wav)  # [B, T, Ca]
        se = model.SemanticEncoder_module(feats)  # [B, T, Cs]
        t = min(ac.shape[1], se.shape[1])
        fused = model.fc_prior(torch.cat([se[:, :t], ac[:, :t]], dim=-1))
        _, codes, bounded = model.generator.quantizer.encode(fused)
        # rounding-boundary margin: regenerate with a new seed if fragile
        margin = (bounded - torch.round(bounded)).abs()
        margin = (0.5 - margin).abs().min().item()
        assert margin > 1e-3, f"FSQ rounding margin too small: {margin}"

        dec_codes = torch.randint(
            0, int(np.prod(FSQ_LEVELS)), (B, T), generator=g
        )
        emb = model.generator.quantizer.decode(dec_codes)  # [B, T, vq]
        h = model.fc_post_a(emb)
        bb = model.generator.backbone(h)
        wav_out = model.generator.head(bb)

    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    np.savez_compressed(
        OUT,
        __wav=wav.numpy(),
        __feats=feats.numpy(),
        __enc_acoustic=ac.numpy(),
        __enc_semantic=se.numpy(),
        __enc_fused=fused.numpy(),
        __enc_codes=codes.numpy().astype(np.int32),
        __enc_margin=np.float32(margin),
        __dec_codes=dec_codes.numpy().astype(np.int32),
        __dec_emb=emb.numpy(),
        __dec_backbone=bb.numpy(),
        __dec_wav=wav_out.numpy(),
        **sd,
    )
    print(f"wrote {OUT}: {len(sd)} tensors, margin {margin:.4f}, "
          f"wav_out std {wav_out.std():.4f}")


if __name__ == "__main__":
    sys.exit(main())
