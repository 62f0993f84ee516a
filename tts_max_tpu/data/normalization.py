"""Text normalization (reference text_normalization.py:53-135).

The reference uses NVIDIA NeMo normalizers + lingua language detection +
unidecode. Those are heavyweight optional deps; here:

- ``BasicTextNormalizer``: dependency-free normalization (NFKC, ascii
  transliteration for English, whitespace collapse) — the default.
- ``NemoTextNormalizer``: used when nemo_text_processing is importable.
- ``NoOpTextNormalizer``.
"""

from __future__ import annotations

import abc
import re
import unicodedata


class TextNormalizer(abc.ABC):
    @abc.abstractmethod
    def normalize_with_language(self, text: str, language: str) -> str:
        ...


class NoOpTextNormalizer(TextNormalizer):
    def normalize_with_language(self, text: str, language: str) -> str:
        return text


_WS = re.compile(r"\s+")


class BasicTextNormalizer(TextNormalizer):
    """NFKC + numeral/currency/time verbalization + (for English) ascii
    transliteration + whitespace collapse.

    The verbalization passes (data/verbalize.py for en,
    data/verbalize_multi.py for es/fr/de/zh/ja) cover the NeMo capability
    the reference relies on for all six supported languages
    (text_normalization.py:53-127) so that on an air-gapped image
    "123 dollars" never trains or serves as raw digits."""

    def normalize_with_language(self, text: str, language: str) -> str:
        text = unicodedata.normalize("NFKC", text)
        if language == "en":
            from tts_max_tpu.data.verbalize import expand_en

            text = expand_en(text)
            text = (
                unicodedata.normalize("NFKD", text)
                .encode("ascii", "ignore")
                .decode("ascii")
            )
        elif language in ("es", "fr", "de", "zh", "ja"):
            from tts_max_tpu.data.verbalize_multi import expand

            text = expand(text, language)
        return _WS.sub(" ", text).strip()


class NemoTextNormalizer(TextNormalizer):
    """NeMo-backed normalizer (en/ja/zh/es/fr/de), lazy per-language."""

    SUPPORTED = ("en", "ja", "zh", "es", "fr", "de")

    def __init__(self) -> None:
        self._normalizers: dict[str, object] = {}
        self._fallback = BasicTextNormalizer()

    def _get(self, language: str):
        if language not in self._normalizers:
            from nemo_text_processing.text_normalization.normalize import Normalizer

            self._normalizers[language] = Normalizer(
                input_case="cased", lang=language
            )
        return self._normalizers[language]

    def normalize_with_language(self, text: str, language: str) -> str:
        if language not in self.SUPPORTED:
            return self._fallback.normalize_with_language(text, language)
        try:
            out = self._get(language).normalize(text)
        except Exception:
            return self._fallback.normalize_with_language(text, language)
        if language == "en":
            out = self._fallback.normalize_with_language(out, "en")
        return out


def create(enable: bool = True) -> TextNormalizer:
    """Factory (reference text_normalization.py:130-135): NeMo when available,
    otherwise the dependency-free normalizer."""
    if not enable:
        return NoOpTextNormalizer()
    try:
        import nemo_text_processing  # noqa: F401

        return NemoTextNormalizer()
    except Exception:
        return BasicTextNormalizer()
