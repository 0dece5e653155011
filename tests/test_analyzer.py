"""Golden-token analyzer tests.

Fixtures ported from the reference
`src/test/java/io/anserini/analysis/EnglishStemmingAnalyzerTest.java:28-58`
and Porter's published vocabulary examples.
"""

from anserini_ray.analysis import (
    Analyzer,
    ENGLISH_STOP_WORDS,
    porter_stem,
    strip_possessive,
    tokenize,
)

INPUT = "City buses are running on schedule."


def test_porter_stop_default():
    a = Analyzer(stemmer="porter")
    assert a.analyze(INPUT) == ["citi", "buse", "run", "schedul"]


def test_porter_stop_custom():
    a = Analyzer(stemmer="porter", stopwords=frozenset(["are"]))
    assert a.analyze(INPUT) == ["citi", "buse", "run", "on", "schedul"]


def test_porter_nostop():
    a = Analyzer(stemmer="porter", stopwords=frozenset())
    assert a.analyze(INPUT) == ["citi", "buse", "ar", "run", "on", "schedul"]


def test_nostem_stop_default():
    a = Analyzer(stemmer=None)
    assert a.analyze(INPUT) == ["city", "buses", "running", "schedule"]


def test_nostem_nostop():
    a = Analyzer(stemmer=None, stopwords=frozenset())
    assert a.analyze(INPUT) == [
        "city", "buses", "are", "running", "on", "schedule",
    ]


def test_stop_set_is_lucene_33():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "with" in ENGLISH_STOP_WORDS


def test_porter_known_pairs():
    # Pairs from Porter's paper / the reference goldens.
    pairs = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
        "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "bled": "bled", "motoring": "motor", "sing": "sing",
        "conflated": "conflat", "troubled": "troubl", "sized": "size",
        "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
        "fizzed": "fizz", "failing": "fail", "filing": "file",
        "happy": "happi", "sky": "sky",
        "relational": "relat", "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
        "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
        "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
        "predication": "predic", "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
        "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
        "defensible": "defens", "irritant": "irrit", "replacement": "replac",
        "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
        "homologou": "homolog", "communism": "commun", "activate": "activ",
        "angulariti": "angular", "homologous": "homolog", "effective": "effect",
        "bowdlerize": "bowdler",
        "probate": "probat", "rate": "rate", "cease": "ceas",
        "controll": "control", "roll": "roll",
    }
    for word, want in pairs.items():
        assert porter_stem(word) == want, f"{word} -> {porter_stem(word)} != {want}"


def test_tokenizer_uax29_cases():
    assert tokenize("can't stop won't stop") == ["can't", "stop", "won't", "stop"]
    assert tokenize("3.14 1,000 U.S.A. end.") == ["3.14", "1,000", "U.S.A", "end"]
    assert tokenize("a,b c:d 1:2") == ["a", "b", "c:d", "1", "2"]
    assert tokenize("foo_bar x1y2") == ["foo_bar", "x1y2"]
    assert tokenize("  hello---world  ") == ["hello", "world"]
    assert tokenize("") == []
    assert tokenize("...") == []


def test_possessive():
    assert strip_possessive("city's") == "city"
    assert strip_possessive("CITY'S") == "CITY"
    assert strip_possessive("city’s") == "city"
    assert strip_possessive("its") == "its"
    assert strip_possessive("'s") == ""


def test_analyze_possessive_end_to_end():
    a = Analyzer()
    assert a.analyze("The city's buses") == ["citi", "buse"]


def test_max_token_length_split():
    long = "x" * 600
    toks = tokenize(long)
    assert [len(t) for t in toks] == [255, 255, 90]
