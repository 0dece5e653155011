"""Krovetz stemming goldens — mirrors the reference
`T/analysis/EnglishStemmingAnalyzerTest.java` exactly (porter / krovetz /
nostem x default-stop / custom-stop / no-stop on the same input)."""

from anserini_ray.analysis.analyzer import Analyzer
from anserini_ray.analysis.kstem import kstem

INPUT = "City buses are running on schedule."

PORTER_STOP_DEFAULT = ["citi", "buse", "run", "schedul"]
PORTER_STOP_CUSTOM = ["citi", "buse", "run", "on", "schedul"]
PORTER_NOSTOP = ["citi", "buse", "ar", "run", "on", "schedul"]

KROVETZ_STOP_DEFAULT = ["city", "bus", "running", "schedule"]
KROVETZ_STOP_CUSTOM = ["city", "bus", "running", "on", "schedule"]
KROVETZ_NOSTOP = ["city", "bus", "are", "running", "on", "schedule"]

NOSTEM_STOP_DEFAULT = ["city", "buses", "running", "schedule"]
NOSTEM_STOP_CUSTOM = ["city", "buses", "running", "on", "schedule"]
NOSTEM_NOSTOP = ["city", "buses", "are", "running", "on", "schedule"]


def test_porter_matrix():
    assert Analyzer().analyze(INPUT) == PORTER_STOP_DEFAULT
    assert Analyzer(stemmer="porter").analyze(INPUT) == PORTER_STOP_DEFAULT
    assert (
        Analyzer(stemmer="porter", stopwords=frozenset(["are"])).analyze(INPUT)
        == PORTER_STOP_CUSTOM
    )
    assert (
        Analyzer(stemmer="porter", stopwords=frozenset()).analyze(INPUT)
        == PORTER_NOSTOP
    )


def test_krovetz_matrix():
    assert Analyzer(stemmer="krovetz").analyze(INPUT) == KROVETZ_STOP_DEFAULT
    assert (
        Analyzer(stemmer="krovetz", stopwords=frozenset(["are"])).analyze(INPUT)
        == KROVETZ_STOP_CUSTOM
    )
    assert (
        Analyzer(stemmer="krovetz", stopwords=frozenset()).analyze(INPUT)
        == KROVETZ_NOSTOP
    )


def test_nostem_matrix():
    assert Analyzer(stemmer="none").analyze(INPUT) == NOSTEM_STOP_DEFAULT
    assert (
        Analyzer(stemmer="none", stopwords=frozenset(["are"])).analyze(INPUT)
        == NOSTEM_STOP_CUSTOM
    )
    assert (
        Analyzer(stemmer="none", stopwords=frozenset()).analyze(INPUT)
        == NOSTEM_NOSTOP
    )


def test_kstem_behavior():
    # conservative inflectional stemming: headwords unchanged, plurals /
    # past tense / aspect reduced only onto known roots
    cases = {
        "running": "running",  # headword -> untouched (vs Porter 'run')
        "buses": "bus",
        "cities": "city",
        "flies": "fly",
        "walked": "walk",
        "planned": "plan",
        "hoping": "hope",
        "windows": "window",
        "news": "news",  # headword, no s-strip
        "this": "this",
        "series": "series",  # no known root -> unchanged
        "children": "child",  # exception list
        "indices": "index",
    }
    for w, want in cases.items():
        assert kstem(w) == want, (w, kstem(w), want)


def test_make_analyzer_krovetz():
    from anserini_ray.analysis.analyzer import make_analyzer

    an = make_analyzer({"stemmer": "krovetz"})
    assert an.analyze(INPUT) == KROVETZ_STOP_DEFAULT
    assert "krovetz" in an.config_fingerprint()
