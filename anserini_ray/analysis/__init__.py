from .analyzer import (
    Analyzer,
    ENGLISH_STOP_WORDS,
    DEFAULT_ANALYZER_CONFIG,
    make_analyzer,
    strip_possessive,
    tokenize,
)
from .porter import porter_stem

__all__ = [
    "Analyzer",
    "ENGLISH_STOP_WORDS",
    "DEFAULT_ANALYZER_CONFIG",
    "make_analyzer",
    "strip_possessive",
    "tokenize",
    "porter_stem",
]
