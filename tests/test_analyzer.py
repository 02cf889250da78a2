"""Analyzer chain + Porter stemmer tests.

The Porter vectors are from the published algorithm description
(Porter 1980) — the same algorithm behind the reference's `english`
analyzer (mappings/hugo.json:7)."""

import pytest

from docs_indexer_ray.functions.analyzer import (
    Analyzer,
    STOPWORDS_EN,
    strip_possessive,
    tokenize_simple,
    tokenize_standard,
)
from docs_indexer_ray.functions.porter import porter_stem

PORTER_VECTORS = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"), ("rational", "ration"),
    ("valenci", "valenc"), ("hesitanci", "hesit"), ("digitizer", "digit"),
    ("conformabli", "conform"), ("radicalli", "radic"),
    ("differentli", "differ"), ("vileli", "vile"), ("analogousli", "analog"),
    ("vietnamization", "vietnam"), ("predication", "predic"),
    ("operator", "oper"), ("feudalism", "feudal"),
    ("decisiveness", "decis"), ("hopefulness", "hope"),
    ("callousness", "callous"), ("formaliti", "formal"),
    ("sensitiviti", "sensit"), ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"), ("formative", "form"), ("formalize", "formal"),
    ("electriciti", "electr"), ("electrical", "electr"), ("hopeful", "hope"),
    ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"), ("communism", "commun"), ("activate", "activ"),
    ("angulariti", "angular"), ("homologous", "homolog"),
    ("effective", "effect"), ("bowdlerize", "bowdler"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
]


@pytest.mark.parametrize("word,expected", PORTER_VECTORS)
def test_porter_vectors(word, expected):
    assert porter_stem(word) == expected


def test_porter_short_words_unchanged():
    for w in ("a", "is", "go", ""):
        assert porter_stem(w) == w


def test_tokenize_standard():
    assert tokenize_standard("Don't split 3.14 or u.s.a tokens") == [
        "Don't", "split", "3.14", "or", "u.s.a", "tokens"]
    assert tokenize_standard("hyphen-ated") == ["hyphen", "ated"]


def test_tokenize_simple_sql_replicable():
    assert tokenize_simple("Hello, WORLD 42!") == ["hello", "world", "42"]


def test_possessive():
    assert strip_possessive("dog's") == "dog"
    assert strip_possessive("dog’s") == "dog"
    assert strip_possessive("its") == "its"


def test_english_chain():
    an = Analyzer("english")
    # stopwords removed, possessive stripped, stemming conflates
    assert an("The cats and the dog's toys") == ["cat", "dog", "toi"]
    # inflected forms conflate to the same stem
    assert an("running runs")[0] == an("runs run")[0] == "run"
    # a pure-stopword query analyzes to empty
    assert an("the and of to") == []


def test_standard_chain_keeps_stopwords():
    assert Analyzer("standard")("The Cats") == ["the", "cats"]


def test_trigram_chain():
    out = Analyzer("trigram")("alpha beta gamma")
    assert "alpha" in out
    assert "alpha beta" in out
    assert "alpha beta gamma" in out
    assert "beta gamma" in out


def test_reverse_chain():
    assert Analyzer("reverse")("Abc xyz") == ["cba", "zyx"]


def test_stopword_set_is_lucene_default():
    assert len(STOPWORDS_EN) == 33
    assert "the" in STOPWORDS_EN and "with" in STOPWORDS_EN


def test_edge_chain_search_as_you_type():
    """edge chain = edge n-grams 2..15 per simple token (OpenSearch
    edge_ngram; a typed prefix is an exact term in this chain)."""
    from docs_indexer_ray.functions.analyzer import Analyzer

    a = Analyzer("edge")
    assert a("Value!") == ["va", "val", "valu", "value"]
    assert a("a ab") == ["ab"]  # len-1 tokens emit nothing
    out = a("extraordinarily")  # 15 chars: capped at 15
    assert out == ["extraordinarily"[:g] for g in range(2, 16)]
    assert a("") == []
