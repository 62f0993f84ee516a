"""Alias-free DSP blocks: Kaiser-windowed sinc resampling + Snake activations.

Re-design of the reference's alias-free-torch stack
(/root/reference/tts/core/codec/filters.py:15-135, activations.py:8-110):
an anti-aliased up-2×/activation/down-2× sandwich around periodic
Snake/SnakeBeta activations, all channel-last ([B, T, C]) depthwise XLA convs.

Filter taps are computed host-side (numpy) once per (ratio, kernel_size) and
closed over as constants — XLA folds them into the conv.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def kaiser_beta(half_size: int, half_width: float) -> float:
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        return 0.1102 * (a - 8.7)
    if a >= 21.0:
        return 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    return 0.0


@functools.lru_cache(maxsize=64)
def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Windowed-sinc low-pass taps, sum-normalized. Returns [kernel_size].

    Mirrors reference filters.py:15-46 (incl. the guard for cutoff == 0,
    never hit with the ratios in use).
    """
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    beta = kaiser_beta(half_size, half_width)
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, dtype=np.float32)
    taps = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    taps /= taps.sum()
    return taps.astype(np.float32)


def _depthwise_conv(x: jnp.ndarray, taps: np.ndarray, stride: int) -> jnp.ndarray:
    """x: [B, T, C]; same taps applied per channel (grouped conv)."""
    c = x.shape[-1]
    k = jnp.asarray(taps)[:, None, None] * jnp.ones((1, 1, c), x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        k.astype(x.dtype),
        window_strides=(stride,),
        padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c,
    )


def lowpass1d(
    x: jnp.ndarray,
    cutoff: float = 0.5,
    half_width: float = 0.6,
    stride: int = 1,
    kernel_size: int = 12,
) -> jnp.ndarray:
    """Replicate-padded low-pass (reference LowPassFilter1d, filters.py:49-84)."""
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    taps = kaiser_sinc_filter1d(cutoff, half_width, kernel_size)
    return _depthwise_conv(x, taps, stride)


def upsample1d(x: jnp.ndarray, ratio: int = 2, kernel_size: int | None = None) -> jnp.ndarray:
    """Anti-aliased ratio× upsample (reference UpSample1d, filters.py:87-115).

    CPU fast path for ratio 2: polyphase decomposition — two half-length
    depthwise convs on the UNdilated signal, interleaved (half the MACs,
    1.6x on CPU; verified exactly equivalent). On TPU the Mosaic-lowered
    lhs-dilated conv is faster than the extra relayouts, so it stays default
    (measured: 350 vs 186 audio-sec/s on the full acoustic encoder).
    """
    kernel_size = kernel_size or int(6 * ratio // 2) * 2
    if ratio == 2 and kernel_size % 2 == 0 and jax.default_backend() == "cpu":
        return _polyphase_upsample2x(x, kernel_size)
    stride = ratio
    pad = kernel_size // ratio - 1
    pad_left = pad * stride + (kernel_size - stride) // 2
    pad_right = pad * stride + (kernel_size - stride + 1) // 2
    taps = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    c = x.shape[-1]
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    # conv_transpose == lhs-dilated conv with flipped taps (taps are symmetric
    # only for odd sizes; flip explicitly to match conv_transpose semantics)
    k = jnp.asarray(taps[::-1].copy())[:, None, None] * jnp.ones((1, 1, c), x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        k.astype(x.dtype),
        window_strides=(1,),
        padding=[(kernel_size - 1, kernel_size - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c,
    )
    y = ratio * y
    return y[:, pad_left:-pad_right]


def _polyphase_upsample2x(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Polyphase 2× upsample, exactly matching the dilated-conv formulation.

    With flipped taps t_f and edge pad p = K/2 - 1, full-padding convs of the
    two tap phases align to output parities at offsets (K/2+1, K/2+2):
      out[0::2] = 2 * conv(xp, t_f[0::2])[K/2+1 : ...]
      out[1::2] = 2 * conv(xp, t_f[1::2])[K/2+2 : ...]
    (offsets derived from the crop arithmetic of the reference; equality
    is pinned by tests across shapes/channels).
    """
    pad = kernel_size // 2 - 1
    taps = kaiser_sinc_filter1d(0.25, 0.3, kernel_size)
    t_f = taps[::-1].copy()
    c = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    L = 2 * x.shape[1]
    half = kernel_size // 2

    def phase(taps1d):
        k = jnp.asarray(taps1d)[:, None, None] * jnp.ones((1, 1, c), x.dtype)
        return jax.lax.conv_general_dilated(
            xp,
            k.astype(x.dtype),
            window_strides=(1,),
            padding=[(half - 1, half - 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=c,
        )
    y_even = 2.0 * phase(t_f[0::2])
    y_odd = 2.0 * phase(t_f[1::2])
    # phase offsets under full (half-1) padding: half+1 and half+2
    oe = half + 1
    oo = half + 2
    ev = y_even[:, oe : oe + L // 2]
    od = y_odd[:, oo : oo + L // 2]
    # interleave by stacking (cheap reshape, not a strided scatter)
    return jnp.stack([ev, od], axis=2).reshape(x.shape[0], L, c)


def downsample1d(x: jnp.ndarray, ratio: int = 2, kernel_size: int | None = None) -> jnp.ndarray:
    """Anti-aliased ratio× downsample (reference DownSample1d, filters.py:118-135)."""
    kernel_size = kernel_size or int(6 * ratio // 2) * 2
    return lowpass1d(
        x, cutoff=0.5 / ratio, half_width=0.6 / ratio, stride=ratio, kernel_size=kernel_size
    )


# --- snake activations (reference activations.py:8-82) ----------------------


def snake(x: jnp.ndarray, alpha: jnp.ndarray, logscale: bool = True) -> jnp.ndarray:
    """x + (1/α)·sin²(αx); alpha per-channel [C], x [B, T, C]."""
    a = jnp.exp(alpha) if logscale else alpha
    a = a.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    y = xf + (1.0 / (a + 1e-9)) * jnp.square(jnp.sin(xf * a))
    return y.astype(x.dtype)


def _snake_impl() -> str:
    import os

    return os.environ.get("TTS_MAX_SNAKE_IMPL", "")


def snake_beta(
    x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray, logscale: bool = True
) -> jnp.ndarray:
    """x + (1/β)·sin²(αx) (SnakeBeta, activations.py:44-82).

    The round-5 encoder trace (tools/xplane_summary.py on
    bench_logs/xprof_encode) attributed 58% of acoustic-encode time to
    this elementwise op: at the early stages' 48/96 channels the NWC
    layout leaves the TPU VPU's 128 lanes 37% utilized and the fp32 sin
    is transcendental-bound. ``TTS_MAX_SNAKE_IMPL`` selects measured
    experiments: ``bf16`` computes the sin in bf16 (|err| <= ~1e-2 on
    unit-scale activations — the downstream FSQ quantizes to 4 levels per
    dim, far coarser), ``transpose`` evaluates in [B, C, T] layout
    (length in the 128-lane minor dim), ``bf16t`` both."""
    a = jnp.exp(alpha) if logscale else alpha
    b = jnp.exp(beta) if logscale else beta
    impl = _snake_impl()
    if impl in ("bf16", "bf16t"):
        dt = jnp.bfloat16
        xt = x.astype(dt)
        at = a.astype(dt)
        inv_b = (1.0 / (b.astype(jnp.float32) + 1e-9)).astype(dt)
        if impl == "bf16t":
            xt = xt.swapaxes(-1, -2)  # [B, C, T]
            y = xt + inv_b[:, None] * jnp.square(jnp.sin(xt * at[:, None]))
            return y.swapaxes(-1, -2).astype(x.dtype)
        y = xt + inv_b * jnp.square(jnp.sin(xt * at))
        return y.astype(x.dtype)
    if impl == "transpose":
        xf = x.astype(jnp.float32).swapaxes(-1, -2)  # [B, C, T]
        af = a.astype(jnp.float32)[:, None]
        inv_b = (1.0 / (b.astype(jnp.float32) + 1e-9))[:, None]
        y = xf + inv_b * jnp.square(jnp.sin(xf * af))
        return y.swapaxes(-1, -2).astype(x.dtype)
    xf = x.astype(jnp.float32)
    y = xf + (1.0 / (b.astype(jnp.float32) + 1e-9)) * jnp.square(
        jnp.sin(xf * a.astype(jnp.float32))
    )
    return y.astype(x.dtype)


def init_snake_beta(channels: int, dtype=jnp.float32):
    """Log-scale init: zeros (reference activations.py:55-57)."""
    return {"alpha": jnp.zeros((channels,), dtype), "beta": jnp.zeros((channels,), dtype)}


def _pallas_act1d_enabled() -> bool:
    import os

    return os.environ.get("TTS_MAX_PALLAS_ACT1D", "0") == "1"


def activation1d(x: jnp.ndarray, p, up_ratio: int = 2, down_ratio: int = 2,
                 up_kernel: int = 12, down_kernel: int = 12,
                 fused: bool | None = None) -> jnp.ndarray:
    """Anti-aliased activation: up-2× → SnakeBeta → down-2×
    (reference Activation1d, activations.py:85-110).

    For the (2, 2, 12, 12) configuration, ``fused=None`` picks per backend:
    the single-fusion polyphase formulation below on CPU (8.1× — XLA:CPU is
    terrible at tiny depthwise convs), the dilated-conv composition on TPU
    (Mosaic's native conv lowering beats the slice chains: 397 vs 293
    audio-sec/s on the full acoustic encoder, measured). Equivalence is
    pinned by tests.

    ``TTS_MAX_PALLAS_ACT1D=1`` routes the TPU path through the fused Pallas
    kernel (ops/pallas_act1d.py: one VMEM pass, no 2×-rate HBM round-trips)
    — inference-only (no VJP)."""
    standard = (up_ratio == 2 and down_ratio == 2 and up_kernel == 12
                and down_kernel == 12)
    if fused is None:
        backend = jax.default_backend()
        fused = backend == "cpu"
        if (standard and x.ndim == 3 and backend != "cpu"
                and _pallas_act1d_enabled()):
            from tts_max_tpu.ops.pallas_act1d import activation1d_pallas

            return activation1d_pallas(x, p)
    if fused and standard:
        return activation1d_fused(x, p)
    x = upsample1d(x, up_ratio, up_kernel)
    x = snake_beta(x, p["alpha"], p["beta"])
    return downsample1d(x, down_ratio, down_kernel)


def activation1d_fused(x: jnp.ndarray, p) -> jnp.ndarray:
    """up-2× → SnakeBeta → down-2× as ONE fused elementwise pass (K=12).

    The anti-aliased sandwich is HBM-bound: as three convs it writes and
    re-reads a 2×-rate intermediate twice (~9 T·C element transfers). Both
    rate changers are polyphase-decomposed here into static tap-shifted
    sums, so the whole op becomes slice·mul·add chains + the Snake
    nonlinearity — one XLA fusion with no conv ops and no 2×-rate buffer
    round-trips.

    Index algebra (pinned by exact-equality tests vs the unfused path):
    with xp = edge_pad(x, 5) and t = kaiser(0.25, 0.3, 12) (the up and down
    filters are identical at ratio 2), the up stream at even/odd parity is
        E[n] = 2·Σₘ t[11-2m]·xp[n+m+2],  O[n] = 2·Σₘ t[10-2m]·xp[n+m+3]
    (m ∈ [0,6)); Snake applies to each stream; the down conv's edge padding
    of the 2×-rate signal clamps to up[0] = E[0] on the left and
    up[2T-1] = O[T-1] on the right REGARDLESS of parity, giving
        E_ext = [E₀, E₀, E, O_{T-1}×3],  O_ext = [E₀×3, O, O_{T-1}×2]
        y[n] = Σₘ t[2m]·O_ext[n+m] + t[2m+1]·E_ext[n+m].
    """
    t = kaiser_sinc_filter1d(0.25, 0.3, 12)
    T = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (5, 5), (0, 0)), mode="edge")

    def tapsum(base, offs, taps):
        acc = taps[0] * base[:, offs : offs + T]
        for m in range(1, 6):
            acc = acc + taps[m] * base[:, offs + m : offs + m + T]
        return acc

    te = [2.0 * float(t[11 - 2 * m]) for m in range(6)]
    to = [2.0 * float(t[10 - 2 * m]) for m in range(6)]
    e = snake_beta(tapsum(xp, 2, te), p["alpha"], p["beta"])
    o = snake_beta(tapsum(xp, 3, to), p["alpha"], p["beta"])

    e_ext = jnp.concatenate(
        [jnp.repeat(e[:, :1], 2, axis=1), e,
         jnp.repeat(o[:, T - 1 :], 3, axis=1)], axis=1,
    )
    o_ext = jnp.concatenate(
        [jnp.repeat(e[:, :1], 3, axis=1), o,
         jnp.repeat(o[:, T - 1 :], 2, axis=1)], axis=1,
    )
    td_e = [float(t[2 * m + 1]) for m in range(6)]
    td_o = [float(t[2 * m]) for m in range(6)]
    return tapsum(e_ext, 0, td_e) + tapsum(o_ext, 0, td_o)
