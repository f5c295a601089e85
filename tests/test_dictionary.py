"""Phonetic dictionary tests: IPA conversion rules, dictionary lookups on
the real public-domain assets, fallback G2P, model-unit canonicalization."""

import warnings

import pytest

from mdd_tpu.lexicon.dictionary import (
    Phonetic,
    character_normalize,
    default_asset_dir,
    fallback_g2p,
    ipa_normalize,
    ipa_to_phones39,
    phones39_to_ipa,
    strip_stress_keep_reduced,
    stress_normalize,
)


def test_character_normalize():
    assert character_normalize("ɹɛd") == "red"
    assert character_normalize("bɚd") == "bərd"
    assert character_normalize("ɡɑt", "us") == "gat"
    # br folds a->ae but restores the diphthongs
    assert character_normalize("haʊs", "br") == "haʊs"


def test_stress_normalize_rules():
    assert stress_normalize("ˈæpl") == "æpl"        # leading -> dropped
    assert stress_normalize("əˈbaʊt") == "əˈbaʊt"   # after vowel -> kept
    assert stress_normalize("bəˈnænə") == "bəˈnænə"
    # before first vowel -> dropped
    assert stress_normalize("grˈeɪt") == "greɪt"


def test_ipa_to_phones39_basic():
    assert ipa_to_phones39("kæt") == ["K", "AE0", "T"]
    assert ipa_to_phones39("tʃiz") == ["CH", "IY0", "Z"]
    # stress digit attaches to the following symbol (reference quirk,
    # phonetic_dict.py:331-339) and AH0/ER0 keep their own digit
    assert ipa_to_phones39("əˈbaʊt") == ["AH0", "B1", "AW0", "T"]
    assert ipa_to_phones39("ər") == ["ER0"]
    # long mark dropped
    assert ipa_to_phones39("iː") == ["IY0"]


def test_phones39_to_ipa_roundtrip():
    out = phones39_to_ipa(["K", "AE1", "T"], stress=False)
    assert out == ["k", "æ", "t"]
    # stress inserted before the stressed vowel's onset consonant
    out = phones39_to_ipa(["AH0", "B", "AW1", "T"], stress=True)
    assert "ˈ" in "".join(out)


def test_strip_stress_keep_reduced():
    assert strip_stress_keep_reduced(["AE1", "AH0", "ER0", "T"]) == \
        ["AE", "AH0", "ER0", "T"]


def test_fallback_g2p_is_total():
    for w in ["zxqj", "blorptastic", "a", ""]:
        phones = fallback_g2p(w)
        assert isinstance(phones, list)
    assert fallback_g2p("ship")[0] == "SH"
    assert fallback_g2p("church")[0] == "CH"


@pytest.fixture(scope="module")
def phonetic():
    if default_asset_dir() is None:
        pytest.skip("dictionary assets unavailable")
    return Phonetic()


def test_cmudict_lookup(phonetic):
    assert phonetic.cmu_dict("cat") == "K AE1 T"
    assert phonetic.cmu_dict("zzzzxq") is None


def test_ipa_dict_lookup(phonetic):
    ipa = phonetic.ipa_dict("cat")
    assert ipa is not None and "æ" in ipa


def test_api_word_phones_cmu_demo_words(phonetic):
    """The 20 demo prompt words must all resolve to non-empty phones whose
    sil-stripped model units lie in the model vocabulary."""
    words = ["vocabulary", "gather", "about", "through", "rough", "content",
             "magazine", "accept", "talked", "bananas"]
    vocab_units = {
        "aa", "ae", "ah", "ao", "aw", "ay", "eh", "er", "ey", "ih", "iy",
        "ow", "oy", "uh", "uw", "ah0", "er0", "b", "ch", "d", "dh", "f",
        "g", "hh", "jh", "k", "l", "m", "n", "ng", "p", "r", "s", "sh",
        "t", "th", "v", "w", "y", "z", "zh"}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for w in words:
            units = phonetic.canonical_model_phones(w)
            assert units, w
            assert set(units) <= vocab_units, (w, units)


def test_api_word_phonetic_format(phonetic):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        s = phonetic.api_word_phonetic("about")
    assert s.startswith("英: /") and "美: /" in s


def test_translation_empty_without_ecdict(phonetic):
    assert phonetic.api_word_translation("cat") == ""
