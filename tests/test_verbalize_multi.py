# -*- coding: utf-8 -*-
"""Multilingual verbalization (data/verbalize_multi.py): es/fr/de/zh/ja
numeral expansion for the air-gapped fallback normalizer, covering the
reference's NeMo language set (text_normalization.py:53-127)."""

import pytest

from tts_max_tpu.data.normalization import BasicTextNormalizer
from tts_max_tpu.data.verbalize_multi import (
    de_int,
    de_year,
    es_int,
    expand,
    fr_int,
    ja_int,
    zh_int,
)


class TestSpanishCardinals:
    @pytest.mark.parametrize("n,want", [
        (0, "cero"), (16, "dieciséis"), (21, "veintiuno"),
        (31, "treinta y uno"), (100, "cien"), (101, "ciento uno"),
        (500, "quinientos"), (777, "setecientos setenta y siete"),
        (1000, "mil"), (1999, "mil novecientos noventa y nueve"),
        (21000, "veintiún mil"), (31000, "treinta y un mil"),
        (1000000, "un millón"), (2000000, "dos millones"),
        (-5, "menos cinco"),
    ])
    def test_cardinal(self, n, want):
        assert es_int(n) == want


class TestFrenchCardinals:
    @pytest.mark.parametrize("n,want", [
        (0, "zéro"), (17, "dix-sept"), (21, "vingt et un"),
        (70, "soixante-dix"), (71, "soixante et onze"),
        (72, "soixante-douze"), (80, "quatre-vingts"),
        (81, "quatre-vingt-un"), (90, "quatre-vingt-dix"),
        (92, "quatre-vingt-douze"), (100, "cent"), (200, "deux cents"),
        (201, "deux cent un"), (1000, "mille"),
        (80000, "quatre-vingt mille"),
        (1999, "mille neuf cent quatre-vingt-dix-neuf"),
        (1000000, "un million"), (3000000, "trois millions"),
        (-4, "moins quatre"),
    ])
    def test_cardinal(self, n, want):
        assert fr_int(n) == want


class TestGermanCardinals:
    @pytest.mark.parametrize("n,want", [
        (0, "null"), (1, "eins"), (12, "zwölf"), (21, "einundzwanzig"),
        (30, "dreißig"), (100, "einhundert"), (101, "einhunderteins"),
        (121, "einhunderteinundzwanzig"),
        (1234, "eintausendzweihundertvierunddreißig"),
        (1000000, "eine Million"), (2000000, "zwei Millionen"),
        (-7, "minus sieben"),
    ])
    def test_cardinal(self, n, want):
        assert de_int(n) == want

    def test_year_hundreds_convention(self):
        assert de_year(1999) == "neunzehnhundertneunundneunzig"
        assert de_year(1806) == "achtzehnhundertsechs"
        assert de_year(2025) == "zweitausendfünfundzwanzig"


class TestChineseCardinals:
    @pytest.mark.parametrize("n,want", [
        (0, "零"), (10, "十"), (14, "十四"), (20, "二十"),
        (105, "一百零五"), (110, "一百一十"), (1000, "一千"),
        (10505, "一万零五百零五"), (20005, "二万零五"),
        (100000000, "一亿"), (120000, "十二万"),
        (-5, "负五"),
    ])
    def test_cardinal(self, n, want):
        assert zh_int(n) == want


class TestJapaneseCardinals:
    @pytest.mark.parametrize("n,want", [
        (0, "〇"), (11, "十一"), (300, "三百"), (1000, "千"),
        (2025, "二千二十五"), (10000, "一万"), (123456, "十二万三千四百五十六"),
    ])
    def test_cardinal(self, n, want):
        assert ja_int(n) == want


class TestTextExpansion:
    @pytest.mark.parametrize("text,lang,want", [
        # es: comma decimals, $ cents, years as full cardinals
        ("Tengo 3,14 euros", "es", "Tengo tres coma uno cuatro euros"),
        ("Cuesta $3,50", "es", "Cuesta tres dólares con cincuenta"),
        ("Nació en 1999.", "es",
         "Nació en mil novecientos noventa y nueve."),
        ("al 45%", "es", "al cuarenta y cinco por ciento"),
        # fr
        ("Il a 81 ans.", "fr", "Il a quatre-vingt-un ans."),
        ("Ça coûte 3,50 €.", "fr", "Ça coûte trois euros cinquante."),
        ("En 1999, il partit.", "fr",
         "En mille neuf cent quatre-vingt-dix-neuf, il partit."),
        # de: year hundreds convention, dot thousands grouping
        ("Es war 1999.", "de", "Es war neunzehnhundertneunundneunzig."),
        ("45% fertig.", "de", "fünfundvierzig Prozent fertig."),
        ("Das kostet 3,50 €.", "de", "Das kostet drei Euro fünfzig."),
        ("1.234 Stück", "de", "eintausendzweihundertvierunddreißig Stück"),
        # zh: CJK neighbours must not block matches (\w matches ideographs)
        ("我有25个苹果。", "zh", "我有二十五个苹果。"),
        ("完成了45%。", "zh", "完成了百分之四十五。"),
        ("2024年很好", "zh", "二零二四年很好"),
        ("温度是-5度", "zh", "温度是负五度"),
        # ja: digit-wise years before 年, 点 decimals
        ("1999年に生まれた。", "ja", "一九九九年に生まれた。"),
        ("3.5パーセント", "ja", "三点五パーセント"),
        ("りんごが25個ある", "ja", "りんごが二十五個ある"),
        # unknown language passes through
        ("123 abc", "ko", "123 abc"),
    ])
    def test_expand(self, text, lang, want):
        assert expand(text, lang) == want


def test_basic_normalizer_dispatches_all_languages():
    norm = BasicTextNormalizer()
    assert norm.normalize_with_language("Il a 81 ans.", "fr") == (
        "Il a quatre-vingt-un ans."
    )
    assert norm.normalize_with_language("我有25个苹果。", "zh") == (
        "我有二十五个苹果。"
    )
    # en path unchanged
    assert norm.normalize_with_language("I have 3.", "en") == "I have three."
