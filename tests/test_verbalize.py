"""English verbalization fallback (VERDICT r1 item 9; reference NeMo
capability at text_normalization.py:53-127)."""

import pytest

from tts_max_tpu.data.normalization import BasicTextNormalizer
from tts_max_tpu.data.verbalize import (
    expand_en,
    int_to_words,
    ordinal_to_words,
    year_to_words,
)


@pytest.mark.parametrize(
    "n,words",
    [
        (0, "zero"),
        (7, "seven"),
        (15, "fifteen"),
        (20, "twenty"),
        (42, "forty-two"),
        (100, "one hundred"),
        (101, "one hundred one"),
        (999, "nine hundred ninety-nine"),
        (1000, "one thousand"),
        (1234, "one thousand two hundred thirty-four"),
        (1000000, "one million"),
        (2500007, "two million five hundred thousand seven"),
        (-3, "minus three"),
    ],
)
def test_int_to_words(n, words):
    assert int_to_words(n) == words


@pytest.mark.parametrize(
    "n,words",
    [
        (1, "first"), (2, "second"), (3, "third"), (4, "fourth"),
        (5, "fifth"), (8, "eighth"), (9, "ninth"), (12, "twelfth"),
        (20, "twentieth"), (21, "twenty-first"), (23, "twenty-third"),
        (100, "one hundredth"), (101, "one hundred first"),
    ],
)
def test_ordinals(n, words):
    assert ordinal_to_words(n) == words


@pytest.mark.parametrize(
    "y,words",
    [
        (1999, "nineteen ninety-nine"),
        (1900, "nineteen hundred"),
        (1906, "nineteen oh six"),
        (2000, "two thousand"),
        (2005, "two thousand five"),
        (2025, "twenty twenty-five"),
        (1776, "seventeen seventy-six"),
    ],
)
def test_years(y, words):
    assert year_to_words(y) == words


@pytest.mark.parametrize(
    "text,expected",
    [
        ("I have 3 cats", "I have three cats"),
        ("pi is 3.14", "pi is three point one four"),
        ("it was -5 degrees", "it was minus five degrees"),
        ("That costs $123", "That costs one hundred twenty-three dollars"),
        ("pay $3.50 now", "pay three dollars and fifty cents now"),
        ("a $1 coin", "a one dollar coin"),
        ("about £5", "about five pounds"),
        ("45% done", "forty-five percent done"),
        ("the 2nd try", "the second try"),
        ("her 21st birthday", "her twenty-first birthday"),
        ("in 1999 we met", "in nineteen ninety-nine we met"),
        ("the 1990s were fun", "the nineteen nineties were fun"),
        ("meet at 3:30", "meet at three thirty"),
        ("at 3:05pm sharp", "at three oh five p m sharp"),
        ("at 12:00 noon", "at twelve o'clock noon"),
        ("1,234 items", "one thousand two hundred thirty-four items"),
        ("no digits here", "no digits here"),
        ("version v2 stays", "version v2 stays"),  # word-attached digits kept
    ],
)
def test_expand_en(text, expected):
    assert expand_en(text) == expected


def test_basic_normalizer_applies_verbalization():
    norm = BasicTextNormalizer()
    out = norm.normalize_with_language("Convert the text to speech: 123 dollars", "en")
    assert out == "Convert the text to speech: one hundred twenty-three dollars"
    # other reference languages verbalize too (data/verbalize_multi.py)
    assert norm.normalize_with_language("123 euros", "fr") == (
        "cent vingt-trois euros"
    )


class TestSentenceFinalAndPunctuation:
    """Advisor round-2 findings: sentence-final numbers/years must verbalize
    and list commas must survive."""

    def test_sentence_final_number(self):
        assert expand_en("I have 3.") == "I have three."

    def test_sentence_final_year(self):
        assert expand_en("We met in 1999.") == "We met in nineteen ninety-nine."

    def test_year_before_clause_comma(self):
        assert expand_en("In 1999, we left.") == "In nineteen ninety-nine, we left."

    def test_list_comma_preserved(self):
        assert expand_en("buy 2, get 1 free") == "buy two, get one free"

    def test_sentence_final_decimal(self):
        assert expand_en("pi is 3.14.") == "pi is three point one four."

    def test_version_string_untouched(self):
        assert expand_en("version 3.5.2 shipped") == "version 3.5.2 shipped"

    def test_sentence_final_decade(self):
        assert expand_en("the 1990s.") == "the nineteen nineties."

    def test_thousands_separator_still_grouped(self):
        assert expand_en("1,234 items") == (
            "one thousand two hundred thirty-four items"
        )
