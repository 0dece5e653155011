"""Lucene-semantics English analysis chain, reimplemented in pure Python.

Pipeline parity target (reference `DefaultEnglishAnalyzer.java:51-74`):

    StandardTokenizer (UAX#29 word break, maxTokenLength=255)
      → EnglishPossessiveFilter   (strip trailing 's / 'S, all apostrophe forms)
      → LowerCaseFilter
      → StopFilter                (Lucene English stop set, 33 words)
      → PorterStemFilter          (default; "krovetz"/"none" variants exist in
                                   the reference — we support "porter"/"none")

`AnalyzerUtils.analyze` (reference `AnalyzerUtils.java:31-55`) additionally
drops empty tokens; `analyze()` here is its equivalent and is used for both
documents and queries.

Tokenizer: a practical UAX#29 subset adequate for transcript text —
- word chars: Unicode ``\\w`` (letters, digits, underscore per ExtendNumLet);
- a single MidLetter (``:`` ``·``) joins letter–letter;
- a single MidNum (``,`` ``;``) joins digit–digit;
- a single MidNumLet (``.`` ``'`` ``’``) joins letter–letter or digit–digit;
- CJK ideographs emit one token per character (Lucene <IDEOGRAPHIC>);
- tokens longer than 255 chars are split (StandardTokenizer maxTokenLength).

Golden-token fixtures ported from the reference
`EnglishStemmingAnalyzerTest.java:28-40` live in tests/test_analyzer.py.
"""

from __future__ import annotations

import re
from typing import Iterable

from .porter import porter_stem

# Lucene's EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (33 words) — referenced by
# DefaultEnglishAnalyzer.newDefaultInstance (DefaultEnglishAnalyzer.java:87-89).
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

MAX_TOKEN_LENGTH = 255

_APOSTROPHES = "'’＇"
_MID_LETTER = ":·״"
_MID_NUM = ",;"
_MID_NUM_LET = ".'’＇․﹒．"
_ALL_MIDS = _MID_LETTER + _MID_NUM + _MID_NUM_LET

# Candidate token span: word chars optionally joined by single mid chars.
_CANDIDATE = re.compile(r"\w+(?:[%s]\w+)*" % re.escape(_ALL_MIDS), re.UNICODE)
_SIMPLE = re.compile(r"^\w+$", re.UNICODE)

_CJK = (
    "⺀-⻿　-〿㐀-䶿一-鿿"
    "豈-﫿぀-ヿ"  # incl. Hiragana/Katakana-ish single emits
)
_CJK_RE = re.compile("[%s]" % _CJK)


def _split_candidate(span: str) -> Iterable[str]:
    """Validate mid-characters inside a candidate span per UAX#29 classes;
    split the span wherever a mid char joins incompatible classes."""
    parts: list[str] = []
    cur: list[str] = []
    segs = re.split("([%s])" % re.escape(_ALL_MIDS), span)
    # segs alternates word-chunk, mid, word-chunk, ...
    i = 0
    while i < len(segs):
        chunk = segs[i]
        if chunk:
            cur.append(chunk)
        if i + 2 < len(segs):
            mid, nxt = segs[i + 1], segs[i + 2]
            prev_c, next_c = chunk[-1] if chunk else "", nxt[0] if nxt else ""
            ok = False
            if prev_c and next_c:
                p_alpha, n_alpha = prev_c.isalpha(), next_c.isalpha()
                p_dig, n_dig = prev_c.isdigit(), next_c.isdigit()
                if mid in _MID_NUM_LET and ((p_alpha and n_alpha) or (p_dig and n_dig)):
                    ok = True
                elif mid in _MID_LETTER and p_alpha and n_alpha:
                    ok = True
                elif mid in _MID_NUM and p_dig and n_dig:
                    ok = True
            if ok:
                cur.append(mid)
            else:
                if cur:
                    parts.append("".join(cur))
                    cur = []
        i += 2
    if cur:
        parts.append("".join(cur))
    return parts


# Fast-path guard: a text of ONLY ASCII alphanumerics and whitespace
# tokenizes identically to str.split() (every candidate run is a _SIMPLE
# span with no CJK and no mid-token punctuation), so the per-candidate
# regex machinery can be skipped wholesale. Token-length chunking still
# applies, so the fast path additionally requires no run longer than
# MAX_TOKEN_LENGTH (checked after the split). Texts with any other
# character take the full UAX#29 path unchanged.
_FAST_TEXT = re.compile(r"[A-Za-z0-9\s]*\Z")


def tokenize(text: str) -> list[str]:
    """UAX#29-subset word tokenization (Lucene StandardTokenizer parity on
    the supported character classes)."""
    if _FAST_TEXT.fullmatch(text):
        toks = text.split()
        if not toks or max(map(len, toks)) <= MAX_TOKEN_LENGTH:
            return toks
    out: list[str] = []
    for m in _CANDIDATE.finditer(text):
        span = m.group(0)
        if _SIMPLE.match(span):
            pieces: Iterable[str] = (span,)
        else:
            pieces = _split_candidate(span)
        for piece in pieces:
            # CJK ideographs: one token per char, split out of the piece.
            if _CJK_RE.search(piece):
                buf: list[str] = []
                for ch in piece:
                    if _CJK_RE.match(ch):
                        if buf:
                            out.append("".join(buf))
                            buf = []
                        out.append(ch)
                    else:
                        buf.append(ch)
                if buf:
                    out.append("".join(buf))
            elif len(piece) > MAX_TOKEN_LENGTH:
                out.extend(
                    piece[i : i + MAX_TOKEN_LENGTH]
                    for i in range(0, len(piece), MAX_TOKEN_LENGTH)
                )
            else:
                out.append(piece)
    return out


def strip_possessive(token: str) -> str:
    """EnglishPossessiveFilter: drop trailing <apostrophe>[sS]."""
    if len(token) >= 2 and token[-1] in "sS" and token[-2] in _APOSTROPHES:
        return token[:-2]
    return token


class Analyzer:
    """Reusable analyzer with a per-instance stem memo (Zipfian vocabularies
    make the cache hit rate very high; build one per actor, not per batch)."""

    def __init__(
        self,
        stemmer: str | None = "porter",
        stopwords: frozenset[str] | None = ENGLISH_STOP_WORDS,
    ):
        if stemmer not in ("porter", "krovetz", None, "none"):
            raise ValueError(
                f"unsupported stemmer: {stemmer!r} (porter|krovetz|none)"
            )
        self.stemmer = stemmer if stemmer != "none" else None
        self.stopwords = stopwords if stopwords is not None else frozenset()
        # raw token -> fully processed token (possessive+lower+stop+stem), or
        # None when the token is dropped; Zipfian vocab → very high hit rate
        self._memo: dict[str, str | None] = {}

    def config_fingerprint(self) -> str:
        return f"std+poss+lower+stop{len(self.stopwords)}+{self.stemmer or 'nostem'}"

    def _process(self, raw: str) -> str | None:
        tok = strip_possessive(raw).lower()
        if not tok or tok in self.stopwords:
            return None
        if self.stemmer == "porter":
            tok = porter_stem(tok)
            if not tok:
                return None
        elif self.stemmer == "krovetz":
            from .kstem import kstem

            tok = kstem(tok)
            if not tok:
                return None
        return tok

    def analyze(self, text: str) -> list[str]:
        memo = self._memo
        out: list[str] = []
        _MISS = False  # sentinel distinct from None (None == dropped token)
        for raw in tokenize(text):
            tok = memo.get(raw, _MISS)
            if tok is _MISS:
                tok = self._process(raw)
                if len(memo) < 2_000_000:  # bound actor memory
                    memo[raw] = tok
            if tok is not None:
                out.append(tok)
        return out


    def analyze_with_positions(self, text: str) -> tuple[list[str], list[int]]:
        """Like analyze(), but also returns each emitted token's position in
        the ORIGINAL token stream — dropped tokens (stopwords, empty stems)
        still consume a position, matching Lucene's StopFilter position
        increments (enablePositionIncrements=true default)."""
        memo = self._memo
        out: list[str] = []
        pos: list[int] = []
        _MISS = False
        for p, raw in enumerate(tokenize(text)):
            tok = memo.get(raw, _MISS)
            if tok is _MISS:
                tok = self._process(raw)
                if len(memo) < 2_000_000:
                    memo[raw] = tok
            if tok is not None:
                out.append(tok)
                pos.append(p)
        return out, pos


DEFAULT_ANALYZER_CONFIG = {"stemmer": "porter", "stopwords": "lucene-english"}


class TweetAnalyzer:
    """Reference `TweetAnalyzer.java:36-45`: WhitespaceTokenizer →
    TweetLowerCaseEntityPreservingFilter (+ Porter unless stemming=False).
    The 264-line entity-preserving filter is approximated: @mentions,
    #hashtags and URLs pass through lowercased-whole; other tokens lowercase
    and split on non-alphanumerics (apostrophes kept) before stemming. No
    stop filter (the reference has none). Golden-validated on the
    reference's tweet fixture."""

    def __init__(self, stemming: bool = True):
        self.stemming = stemming
        self._memo: dict[str, str] = {}

    def config_fingerprint(self) -> str:
        return f"tweet+{'porter' if self.stemming else 'nostem'}"

    _SPLIT = re.compile(r"[^a-z0-9']+")

    def analyze(self, text: str) -> list[str]:
        out: list[str] = []
        for raw in text.split():
            low = raw.lower()
            if low.startswith(("@", "#", "http://", "https://")):
                out.append(low)
                continue
            for piece in self._SPLIT.split(low):
                piece = piece.strip("'")
                if not piece:
                    continue
                if self.stemming:
                    s = self._memo.get(piece)
                    if s is None:
                        s = porter_stem(piece)
                        self._memo[piece] = s
                    piece = s
                if piece:
                    out.append(piece)
        return out

    def analyze_with_positions(self, text: str):
        toks = self.analyze(text)
        return toks, list(range(len(toks)))


class SLRAnalyzer:
    """Sparse Latent Retrieval analyzer — reference `SLRGenerator.java:120-133`
    + `SLRTokenizer.java:183-196` (the fork's signature subsystem, README.md:
    63-133): document contents are whitespace-separated activation values of
    a sparse vector; nonzero dimension i becomes latent term zfill(i, 5)
    with term frequency = the first `precision` decimal digits of the
    activation (i.e. trunc(activation * 10^p); activations assumed in
    [0, 1)). Scientific notation is normalized first
    (`normalizeFloatFormat`, SLRGenerator.java:104-118)."""

    TOKEN_LENGTH = 5

    def __init__(self, precision: int = 2):
        self.precision = precision

    def config_fingerprint(self) -> str:
        return f"slr+p{self.precision}"

    @staticmethod
    def _normalize(val: str) -> str:
        v = val.lower()
        if "e" not in v:
            return v
        mantissa, _, exp = v.partition("e")
        e = int(exp)
        digits = mantissa.replace(".", "").lstrip("-")
        if e >= 0:  # reference handles only negative exponents; mirror that
            return v
        return "0." + "0" * (-e - 1) + digits

    def analyze_with_tfs(self, text: str) -> tuple[list[str], list[int]]:
        terms: list[str] = []
        tfs: list[int] = []
        for i, raw in enumerate(text.split()):
            try:
                if float(raw) == 0.0:
                    continue
            except ValueError:
                continue
            dec = self._normalize(raw)
            _, _, frac = dec.partition(".")
            frac = "".join(ch if ch.isdigit() else "0" for ch in frac)
            frac = (frac + "0" * self.precision)[: self.precision]
            tf = int(frac) if frac else 0
            if tf >= 1:
                terms.append(str(i).zfill(self.TOKEN_LENGTH))
                tfs.append(tf)
        return terms, tfs

    def analyze(self, text: str) -> list[str]:
        return self.analyze_with_tfs(text)[0]

    def analyze_with_positions(self, text: str):
        toks = self.analyze(text)
        return toks, list(range(len(toks)))


def make_analyzer(config: dict | None = None):
    """Build an analyzer from a plain-dict config (picklable across tasks).
    config["type"]: "english" (default chain) or "tweet"."""
    if config and config.get("type") == "tweet":
        return TweetAnalyzer(stemming=config.get("stemming", True))
    if config and config.get("type") == "slr":
        return SLRAnalyzer(precision=config.get("precision", 2))
    if config and config.get("language") not in (None, "en"):
        # reference -language flag (IndexCollection.java:755-769)
        from .lang import make_language_analyzer

        return make_language_analyzer(
            config["language"], config.get("stopwords")
        )
    config = dict(DEFAULT_ANALYZER_CONFIG, **(config or {}))
    config.pop("type", None)
    stop = config["stopwords"]
    if stop == "lucene-english":
        stopset = ENGLISH_STOP_WORDS
    elif stop in (None, "none"):
        stopset = frozenset()
    elif isinstance(stop, (set, frozenset, list, tuple)):
        stopset = frozenset(stop)
    else:
        raise ValueError(f"bad stopwords config: {stop!r}")
    return Analyzer(stemmer=config["stemmer"], stopwords=stopset)
