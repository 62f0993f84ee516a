"""DNSMOS speech-quality scoring — native pipeline over ONNX weights.

The reference scores completions with torchmetrics' DNSMOS
(/root/reference/tts/training/rlhf/reward_utils.py:123-137: ``personalized=
True``, returning ``mos_ovr`` = element 3 of [p808, sig, bak, ovr]). The
published DNSMOS weights exist only as ONNX graphs (``sig_bak_ovr.onnx`` and
``model_v8.onnx`` from the Microsoft DNS-Challenge), so this module executes
them with the in-repo interpreter (utils/onnx_lite.py — no onnx/onnxruntime
deps) and reimplements the surrounding DNS-Challenge pipeline exactly:

- 9.01 s segments hopping 1 s (clip repeated until it fills one segment);
- primary model input = raw 16 kHz segment [1, 144160];
- P.808 model input = log-power mel (n_fft 321, hop 160, 120 mels,
  ``(power_to_db(ref=max) + 40) / 40``) of the segment minus its last hop;
- per-segment raw scores mapped through the published polynomial fits
  (personalized or not), then averaged across segments.

Weights are env-gated (zero-egress image): point ``DNSMOS_ONNX_DIR`` at a
directory holding the ONNX files, or pass explicit paths to
``load_dnsmos``.
"""

from __future__ import annotations

import math
import os
from typing import Callable

import jax.numpy as jnp
import numpy as np
from scipy.signal import resample_poly

from tts_max_tpu.ops import stft as stft_ops
from tts_max_tpu.utils import onnx_lite

SAMPLE_RATE = 16000
INPUT_LENGTH_S = 9.01
SEGMENT_SAMPLES = int(INPUT_LENGTH_S * SAMPLE_RATE)  # 144160

# np.poly1d coefficient vectors from the DNS-Challenge dnsmos_local.py
# (highest power first).
_POLY = {
    False: {
        "ovr": [-0.06766283, 1.11546468, 0.04602535],
        "sig": [-0.08397278, 1.22083953, 0.0052439],
        "bak": [-0.13166888, 1.60915514, -0.39604546],
    },
    True: {
        "ovr": [-0.00533021, 0.005101, 1.18058466, -0.11236046],
        "sig": [-0.01019296, 0.02751166, 1.19576786, -0.24348726],
        "bak": [-0.04976499, 0.44276479, -0.1644611, 0.96883132],
    },
}


def audio_melspec(audio: np.ndarray) -> np.ndarray:
    """DNS-Challenge mel features: librosa.feature.melspectrogram(n_fft=321,
    hop=160, n_mels=120, power=2, center=True, pad zeros), then
    ``(power_to_db(ref=max) + 40) / 40``. audio: [n] -> [T, 120]."""
    n_fft, hop, n_mels = 321, 160, 120
    spec = stft_ops.stft(
        jnp.asarray(audio, dtype=jnp.float32)[None],
        n_fft,
        hop,
        center=True,
        pad_mode="constant",
    )  # [1, F, T]
    power = np.asarray(jnp.abs(spec)) ** 2
    fb = stft_ops.mel_filterbank(SAMPLE_RATE, n_fft, n_mels)  # [F, n_mels]
    mel = np.einsum("ft,fm->mt", power[0], fb)  # [n_mels, T]
    # librosa.power_to_db(ref=np.max, amin=1e-10, top_db=80)
    ref = max(mel.max(), 1e-10)
    db = 10.0 * np.log10(np.maximum(mel, 1e-10)) - 10.0 * np.log10(ref)
    db = np.maximum(db, db.max() - 80.0)
    return ((db + 40.0) / 40.0).T.astype(np.float32)  # [T, n_mels]


def _poly(coeffs, x):
    y = 0.0
    for c in coeffs:
        y = y * x + c
    return y


class DNSMOS:
    """Callable matching the reference's eval_dnsmos contract:
    ``dnsmos(audio [n], sample_rate) -> mos_ovr`` (plus ``.score`` for all
    four numbers: p808, sig, bak, ovr)."""

    def __init__(
        self,
        primary_graph: onnx_lite.Graph | None,
        p808_graph: onnx_lite.Graph | None,
        personalized: bool = True,
    ):
        if primary_graph is None and p808_graph is None:
            raise ValueError("need at least one DNSMOS ONNX graph")
        self._primary = primary_graph
        self._p808 = p808_graph
        self._personalized = personalized

    def score(self, audio: np.ndarray, sample_rate: int) -> dict[str, float]:
        audio = np.asarray(audio, dtype=np.float32).reshape(-1)
        if sample_rate != SAMPLE_RATE:
            g = math.gcd(int(sample_rate), SAMPLE_RATE)
            audio = resample_poly(audio, SAMPLE_RATE // g, sample_rate // g)
            audio = audio.astype(np.float32)
        while audio.shape[0] < SEGMENT_SAMPLES:
            audio = np.concatenate([audio, audio])
        num_hops = int(np.floor(audio.shape[0] / SAMPLE_RATE) - INPUT_LENGTH_S) + 1
        per_seg: list[dict[str, float]] = []
        for idx in range(max(num_hops, 1)):
            seg = audio[idx * SAMPLE_RATE : idx * SAMPLE_RATE + SEGMENT_SAMPLES]
            if seg.shape[0] < SEGMENT_SAMPLES:
                continue
            rec: dict[str, float] = {}
            if self._p808 is not None:
                feats = audio_melspec(seg[:-160])[None]  # [1, T, 120]
                (p808_out,) = onnx_lite.run(
                    self._p808, {self._p808.feed_names[0]: feats}
                )
                rec["p808"] = float(np.asarray(p808_out).reshape(-1)[0])
            if self._primary is not None:
                (raw,) = onnx_lite.run(
                    self._primary, {self._primary.feed_names[0]: seg[None]}
                )
                sig_r, bak_r, ovr_r = np.asarray(raw).reshape(-1)[:3]
                p = _POLY[self._personalized]
                rec["sig"] = float(_poly(p["sig"], sig_r))
                rec["bak"] = float(_poly(p["bak"], bak_r))
                rec["ovr"] = float(_poly(p["ovr"], ovr_r))
            per_seg.append(rec)
        keys = per_seg[0].keys()
        return {k: float(np.mean([r[k] for r in per_seg])) for k in keys}

    def __call__(self, audio: np.ndarray, sample_rate: int) -> float:
        s = self.score(audio, sample_rate)
        # reference consumes mos_ovr (reward_utils.py:137); fall back to p808
        # when only the P.808 model is available
        return s.get("ovr", s.get("p808", 1.0))


def load_dnsmos(
    primary_path: str | None = None,
    p808_path: str | None = None,
    personalized: bool = True,
) -> Callable[[np.ndarray, int], float]:
    """Build a ``dnsmos_fn`` from local ONNX files. With no explicit paths,
    looks in ``$DNSMOS_ONNX_DIR`` for ``sig_bak_ovr.onnx`` / ``model_v8.onnx``."""
    if primary_path is None and p808_path is None:
        d = os.environ.get("DNSMOS_ONNX_DIR", "")
        if d:
            cand = os.path.join(d, "sig_bak_ovr.onnx")
            primary_path = cand if os.path.exists(cand) else None
            cand = os.path.join(d, "model_v8.onnx")
            p808_path = cand if os.path.exists(cand) else None
    primary = onnx_lite.load_model(primary_path) if primary_path else None
    p808 = onnx_lite.load_model(p808_path) if p808_path else None
    return DNSMOS(primary, p808, personalized=personalized)
