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


def test_ecdict_translation_from_csv(tmp_path):
    """ECDICT wiring: a 3-row csv drives api_word_translation
    (reference dict/phonetic_dict.py:168-242)."""
    from mdd_tpu.lexicon.dictionary import Phonetic

    csv_path = tmp_path / "ecdict.csv"
    csv_path.write_text(
        "word,phonetic,definition,translation\n"
        "gather,'gæðə,v. collect,v. 聚集；收集\n"
        "vocabulary,və'kæbjuləri,n. words,n. 词汇；单词表\n"
        "about,ə'baut,adv. around,adv. 大约\\nprep. 关于\n",
        encoding="utf-8")
    p = Phonetic(ecdict_csv=str(csv_path))
    assert p.api_word_translation("gather") == "v. 聚集；收集"
    assert p.api_word_translation("VOCABULARY") == "n. 词汇；单词表"
    # multi-class entries keep every headline class on its own line
    assert p.api_word_translation("about") == "adv. 大约\nprep. 关于"
    assert p.api_word_translation("nosuchword") == ""


def test_ecdict_missing_csv_is_empty():
    from mdd_tpu.lexicon.dictionary import Phonetic

    p = Phonetic(ecdict_csv="/nonexistent/ecdict.csv")
    assert p.api_word_translation("gather") == ""


def test_api_word_phonics(reference_dir):
    """phonics_engine.csv consumption: letter-group -> IPA breakdown."""
    from mdd_tpu.lexicon.dictionary import Phonetic, default_asset_dir

    if default_asset_dir() is None:
        pytest.skip("dictionary assets unavailable")
    p = Phonetic()
    entry = p.api_word_phonics("African")
    assert entry is not None
    assert entry["phonetic"] == "ˈæfrɪkən"
    assert ("a", "æ") in entry["mapping"]
    assert p.api_word_phonics("zzzznotaword") is None


def test_espeak_backend_gated(phonetic):
    """The phonemizer/espeak backend is import-gated: absent in this
    environment, espeak_ipa/espeak_phones return None and the canonical
    policy falls through to the IPA-dict conversion without error.  If
    the package ever appears, the cross-check policy prefers it
    (phonetic_dict.py:481-498)."""
    ipa = phonetic.espeak_ipa("cat")
    phones = phonetic.espeak_phones("cat")
    try:
        import phonemizer  # noqa: F401

        has_backend = True
    except ImportError:
        has_backend = False
    if has_backend and phonetic._phonemizer:
        assert isinstance(ipa, str) and ipa
        assert phonetic.api_word_phones_cmu("cat") == phones
    else:
        assert ipa is None and phones is None
        # policy falls back to the IPA-dict answer
        assert phonetic.api_word_phones_cmu("cat")


def test_validate_assets_eager_errors(tmp_path):
    """validate_assets fails fast with setup guidance: unset dir and
    missing CMUdict files both raise at construction time (the engine
    calls this), not at the first word lookup."""
    p = Phonetic(asset_dir=None)
    p.asset_dir = None            # defeat the reference-mount fallback
    with pytest.raises(FileNotFoundError, match="MDD_DICT_DIR"):
        p.validate_assets()
    with pytest.raises(FileNotFoundError, match="cmudict"):
        Phonetic(asset_dir=str(tmp_path)).validate_assets()
    if default_asset_dir() is not None:
        Phonetic().validate_assets()   # real assets pass
