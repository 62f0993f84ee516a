"""Language detection routing for text normalization (VERDICT r3 item 10).

The reference routes free text by *detected* language (lingua,
reference text_normalization.py:73-90); on the air-gapped image the
dependency-free heuristic (script detection for zh/ja, stopword + diacritic
scoring for en/es/fr/de) must route serving-time text the same way.
"""

import sys

sys.path.insert(0, "/root/repo")

from tts_max_tpu.data.normalization import (
    BasicTextNormalizer,
    detect_language,
)


def test_detect_language_scripts():
    assert detect_language("我有123个苹果，你有多少个？") == "zh"
    # any kana present means Japanese even with han characters mixed in
    assert detect_language("これはテストです。123個のりんごがあります。") == "ja"
    assert detect_language("日本語のテキストです") == "ja"


def test_detect_language_latin():
    assert detect_language(
        "The quick brown fox jumps over the lazy dog and it is great"
    ) == "en"
    assert detect_language(
        "El perro es muy grande y está en la casa con los niños"
    ) == "es"
    assert detect_language(
        "Le chien est dans la maison avec les enfants et il est très grand"
    ) == "fr"
    assert detect_language(
        "Der Hund ist nicht in dem Haus und die Katze ist auch nicht da"
    ) == "de"


def test_detect_language_default():
    assert detect_language("") == "en"
    assert detect_language("12345 !!!") == "en"
    assert detect_language("xyzzy plugh", default="en") == "en"


def test_normalize_autodetect_routes_verbalization():
    n = BasicTextNormalizer()
    # zh digits get zh verbalization without any language tag
    assert n.normalize("我有123个苹果") == "我有一百二十三个苹果"
    # an explicit tag still wins
    assert n.normalize("I have 12 apples", "en") == "I have twelve apples"
    # en autodetected
    assert (
        n.normalize("The box holds 12 apples and it is heavy")
        == "The box holds twelve apples and it is heavy"
    )


def test_serve_http_prepare_normalizes_by_detection():
    """A zh sentence posted without a language tag reaches the prompt
    compiler verbalized as zh (the round-3 gap: it was normalized as en)."""
    from tools.serve_http import TtsServer

    class _StubEngine:
        def has_work(self):
            return False

    server = TtsServer.__new__(TtsServer)  # skip worker-thread startup
    server.engine = _StubEngine()
    server.normalizer = BasicTextNormalizer()
    server.sv = None
    server.encoder = None
    server.decoder = None
    server.default_max_tokens = 8
    server.max_len = 256

    class _Tok:
        def encode(self, prompt, add_special_tokens=True):
            _Tok.last_prompt = prompt
            return [1, 2, 3]

    server.tokenizer = _Tok()
    input_ids, budget, sampling, speech_ids = server._prepare(
        {"text": "我有123个苹果"}
    )
    assert "一百二十三" in _Tok.last_prompt
    # and the explicit tag routes too
    server._prepare({"text": "12 apples", "language": "en"})
    assert "twelve apples" in _Tok.last_prompt
