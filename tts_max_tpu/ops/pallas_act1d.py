"""Fused anti-aliased Snake activation as ONE Pallas TPU kernel.

The codec's alias-free activation (reference activations.py:85-110) is the
sandwich up-2x -> SnakeBeta -> down-2x around every encoder activation. As
XLA convs it round-trips a 2x-rate intermediate through HBM twice (~9 T*C
element transfers per call); `filters.activation1d_fused` already collapses
it to tap-shifted sums for CPU, but on TPU the slice chains lost to
Mosaic's conv lowering (BENCHMARKS.md). This kernel runs the SAME algebra
as one VMEM-resident pass:

  - layout [T, B*C]: time in sublanes (so the 6-tap shifted sums are cheap
    sublane slices), batch x channels folded into lanes (the acoustic
    encoder's early blocks have C = 4..64 — folding B in keeps the VPU's
    128 lanes busy where a [T, C] layout would idle 32x);
  - grid over T blocks; each step DMAs one (TB + 16)-row halo window from
    HBM, computes the up-2x even/odd polyphase streams, applies Snake, and
    reduces them through the down-2x taps — HBM traffic is exactly one
    read + one write of the signal;
  - sequence-edge semantics (replicate padding of both resamplers) are
    reproduced uniformly with iota selects: rows whose global index falls
    before 0 take E[0], rows at/after T take O[T-1], matching
    `activation1d_fused`'s E_ext/O_ext construction bit-for-bit in
    structure (pinned by tests against the unfused path).

Index algebra (from filters.activation1d_fused, ratio 2, K = 12, taps
t = kaiser(0.25, 0.3, 12); xs is the halo window, xs[k] = x[n0 + k - 6]
edge-clamped):

  E[j_local] = sum_m 2*t[11-2m] * xs[j_local + m]      (j = n0 - 3 + j_local)
  O[j_local] = sum_m 2*t[10-2m] * xs[j_local + 1 + m]
  y[n_local] = sum_m t[2m+1] * E[n_local + m + 1] + t[2m] * O[n_local + m]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tts_max_tpu.models.codec.filters import kaiser_sinc_filter1d

_HALO = 16  # 6 left + 5 right + sublane-alignment slack


def _taps():
    t = kaiser_sinc_filter1d(0.25, 0.3, 12)
    te = [2.0 * float(t[11 - 2 * m]) for m in range(6)]
    to = [2.0 * float(t[10 - 2 * m]) for m in range(6)]
    td_e = [float(t[2 * m + 1]) for m in range(6)]
    td_o = [float(t[2 * m]) for m in range(6)]
    return te, to, td_e, td_o


def _kernel(x_hbm, alpha_ref, beta_ref, out_ref, xs, sem, *, tb: int, t: int):
    i = pl.program_id(0)
    n0 = i * tb
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(n0, tb + _HALO), :], xs, sem
    )
    cp.start()
    te, to, td_e, td_o = _taps()
    a = jnp.exp(alpha_ref[:])  # [1, D]
    inv_b = 1.0 / (jnp.exp(beta_ref[:]) + 1e-9)
    cp.wait()

    ne = tb + 6  # E/O stream rows per block

    def tapsum(base, offs, taps):
        acc = taps[0] * base[pl.ds(offs, ne), :]
        for m in range(1, 6):
            acc = acc + taps[m] * base[pl.ds(offs + m, ne), :]
        return acc

    def snake(z):
        s = jnp.sin(z * a)
        return z + inv_b * (s * s)

    e = snake(tapsum(xs, 0, te))  # [ne, D]
    o = snake(tapsum(xs, 1, to))

    # replicate-edge semantics of the down-2x resampler over the up-sampled
    # sequence: rows before the sequence take E[0], rows at/after T take
    # O[T-1]. Off-boundary blocks never trigger the selects (jglob stays in
    # range), so the substitute rows are arbitrary there.
    jglob = n0 - 3 + jax.lax.broadcasted_iota(jnp.int32, (ne, 1), 0)
    e0 = e[3:4, :]  # global row 0 when this is the first block
    e = jnp.where(jglob < 0, e0, e)
    o = jnp.where(jglob < 0, e0, o)
    q = jnp.clip(t - 1 - n0 + 3, 0, ne - 1)  # row of O[T-1] in this block
    # dynamic_slice of a value doesn't lower on this Mosaic; select the row
    # with a masked reduction instead
    rows = jax.lax.broadcasted_iota(jnp.int32, (ne, 1), 0)
    olast = jnp.sum(jnp.where(rows == q, o, 0.0), axis=0, keepdims=True)
    e = jnp.where(jglob >= t, olast, e)
    o = jnp.where(jglob >= t, olast, o)

    acc = td_e[0] * e[1 : 1 + tb, :] + td_o[0] * o[0:tb, :]
    for m in range(1, 6):
        acc = acc + td_e[m] * e[m + 1 : m + 1 + tb, :]
        acc = acc + td_o[m] * o[m : m + tb, :]
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("tb", "interpret"))
def _act1d_2d(x2, alpha2, beta2, tb: int = 512, interpret: bool = False):
    """x2: [T, D] float32 -> [T, D]; alpha2/beta2: [D] snake params."""
    t, d = x2.shape
    # the manual HBM->VMEM DMA slices require a 128-aligned lane dim
    # (Mosaic memref_slice tiling); pad channels with zeros — snake(0)=0 and
    # the taps act along time only, so the pad stays inert
    pad_d = (-d) % 128
    if pad_d:
        out = _act1d_2d(
            jnp.pad(x2, ((0, 0), (0, pad_d))),
            jnp.pad(alpha2, (0, pad_d)),
            jnp.pad(beta2, (0, pad_d)),
            tb=tb, interpret=interpret,
        )
        return out[:, :d]
    nblk = pl.cdiv(t, tb)
    # halo window: 6 rows of left edge-pad; right edge-pad + slack so every
    # DMA window (tb + _HALO rows from n0) is in bounds
    pad_r = nblk * tb + _HALO - 6 - t
    x_ext = jnp.concatenate(
        [
            jnp.broadcast_to(x2[:1], (6, d)),
            x2,
            jnp.broadcast_to(x2[-1:], (pad_r, d)),
        ],
        axis=0,
    )
    kernel = functools.partial(_kernel, tb=tb, t=t)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t, d), jnp.float32),
        grid=(nblk,),
        in_specs=[
            # pin to HBM: under ANY this platform's Mosaic may place the
            # whole extended input in VMEM and blow the 16 MB scoped stack
            # at production widths (d=6144 after the lane fold — the round-4
            # on-chip failure mode; paged_attention.py hit the same)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, d), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((tb + _HALO, d), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_ext, alpha2[None], beta2[None])


def activation1d_pallas(
    x: jnp.ndarray, p, tb: int = 512, interpret: bool = False
) -> jnp.ndarray:
    """Drop-in fused Activation1d (ratio 2, K = 12) for [B, T, C] float32.

    Folds (B, C) into the lane dimension so small-channel encoder blocks
    still fill the VPU; time lives in sublanes for the tap shifts.
    """
    b, t, c = x.shape
    x2 = jnp.swapaxes(x, 0, 1).reshape(t, b * c).astype(jnp.float32)
    alpha2 = jnp.tile(p["alpha"].astype(jnp.float32), b)
    beta2 = jnp.tile(p["beta"].astype(jnp.float32), b)
    # scoped-VMEM budget: the E/O streams + scratch + pipelined in/out
    # blocks cost ~8x tb*d floats; tb=512 at d=768 overflowed the 16 MB
    # stack by 0.7 MB on the real chip, so scale tb down with lane width
    d_pad = b * c + ((-(b * c)) % 128)
    tb = min(tb, max(64, (200_000 // max(d_pad, 1)) // 8 * 8))
    tb = min(tb, max(8, (t + 7) // 8 * 8))
    y2 = _act1d_2d(x2, alpha2, beta2, tb=tb, interpret=interpret)
    return y2.reshape(t, b, c).swapaxes(0, 1).astype(x.dtype)
