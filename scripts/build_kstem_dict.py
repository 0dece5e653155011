"""Build the KStem headword dictionary (`anserini_ray/analysis/kstem_words.txt`).

Lucene's KStemFilter ships a ~30K-entry headword lexicon (KStemData1..8)
that is not reproducible here; the Krovetz algorithm only needs MEMBERSHIP
(R. Krovetz, SIGIR 1993), so this script derives an equivalent-scale lexicon
from public English prose available in the build environment: Debian package
documentation (/usr/share/doc) and English man pages (/usr/share/man,
locale subtrees excluded).

Pipeline:
  1. tokenize [a-z]{3,24} after stripping troff escapes (\\fB etc.);
  2. keep words with total frequency >= 20 seen in >= 5 distinct files
     (drops typos and one-off identifiers), with a vowel, non-hex-like;
  3. BOOTSTRAP-EXCLUDE inflected surface forms: a word ending in
     -s/-es/-ies/-ed/-ied/-ing whose candidate root (per the stemmer's own
     gates) is itself in the vocabulary is an inflection, not a headword —
     keeping it would freeze it unstemmed at dictionary lookup;
  4. protect a curated list of lexicalized forms that LOOK inflected but are
     dictionary words ("news", "series", "morning", "building", ...), and
     drop contraction stubs ("doesn", "isn", ...).

The output file is committed; rerunning this script only matters when the
build environment's doc corpus changes. The stemmer unions this file with
the curated core list in `analysis/kstem.py` (golden-critical entries live
there and are never excluded).
"""

from __future__ import annotations

import collections
import gzip
import os
import re
import sys

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "anserini_ray", "analysis", "kstem_words.txt",
)

WORD = re.compile(rb"[a-z]{3,24}")
# Strip BEFORE lowercasing: \fB / \f(CW font selectors etc. would otherwise
# leave their selector letter glued to the next word ("\fBuse" -> "buse").
TROFF_ESC = re.compile(rb"\\f\(..|\\\*\(..|\\f[A-Z0-9a-z]|\\[a-zA-Z&%.-]")
LOCALE_DIR = re.compile(
    r"/(cs|da|de|es|fi|fr|hr|hu|id|it|ja|ko|nl|pl|pt|pt_BR|ro|ru|sl|sr|sv|tr"
    r"|zh|zh_CN|zh_TW|uk|el|gl|ca|eu|vi|nb|nn|he|ar|fa|hi|bn|ta|te|th)(/|$)"
)
SKIP_EXT = re.compile(r".*\.(png|jpg|jpeg|gif|svg|pdf|mo|db|css|ico|woff2?)$")

MIN_TF, MIN_DF = 20, 5
VOWELS = frozenset("aeiouy")

# Lexicalized forms that look inflected but are headwords in their own right
# — Lucene's lexicon carries these too (inflectional stemming leaves them).
PROTECT = frozenset("""
news always perhaps whereas besides towards upwards downwards afterwards
unless across series species physics mathematics economics politics
statistics athletics electronics analytics graphics dynamics mechanics
ethics basics semantics diagnostics heuristics genetics linguistics
logistics optics robotics morning evening during nothing anything
everything something building meeting feeling willing interesting being
wedding ceiling clothing outstanding does united headquarters means
premises proceedings savings earnings belongings surroundings findings
civics gymnastics acoustics aerobics ceramics classics cosmetics
""".split())

# Contraction stubs the tokenizer produces from "doesn't" etc. — not words.
CONTRACTION_STUBS = frozenset(
    "hadn doesn isn wasn weren wouldn couldn shouldn aren didn hasn needn "
    "mustn shan oughtn".split()
)

# Real English words whose letters all fall in the hex range a-f (the
# hex-like filter below would otherwise drop them).
HEX_SAFE = frozenset(
    "dead deed beef cafe face fade feed bead deaf abed cede babe dade".split()
)


def _acceptable(w: str) -> bool:
    if w in CONTRACTION_STUBS:
        return False
    if not any(c in VOWELS for c in w):
        return False
    if len(w) >= 4 and w not in HEX_SAFE and all(c in "abcdef" for c in w):
        return False  # hex dump artifact
    return True


def candidate_roots(w: str) -> list[str]:
    """Roots the stemmer could reduce `w` to — mirrors kstem.py's plural /
    past-tense / aspect gates (NOT the derivational steps: -ly/-ness/... words
    are legitimate dictionary entries for an inflectional stemmer)."""
    roots: list[str] = []
    if w.endswith("ies") and len(w) >= 5:
        roots += [w[:-3] + "y", w[:-1]]
    elif w.endswith("es") and len(w) >= 4:
        roots += [w[:-1], w[:-2]]
    elif w.endswith("s") and len(w) >= 4 and not w.endswith(("ss", "us", "ous", "is")):
        roots += [w[:-1]]
    if w.endswith("ied") and len(w) >= 5:
        roots += [w[:-3] + "y", w[:-1]]
    elif w.endswith("ed") and len(w) >= 5:
        r = w[:-2]
        roots += [w[:-1], r]
        if len(r) >= 2 and r[-1] == r[-2] and r[-1] not in VOWELS:
            roots += [r[:-1]]
    if w.endswith("ing") and len(w) >= 6:
        r = w[:-3]
        roots += [r + "e", r]
        if len(r) >= 2 and r[-1] == r[-2] and r[-1] not in VOWELS:
            roots += [r[:-1]]
    return roots


def mine(roots=("/usr/share/doc", "/usr/share/man")):
    tf: collections.Counter = collections.Counter()
    df: collections.Counter = collections.Counter()
    n_files = 0
    for top in roots:
        for dirpath, dirs, files in os.walk(top):
            if LOCALE_DIR.search(dirpath):
                dirs[:] = []
                continue
            for f in files:
                if SKIP_EXT.match(f):
                    continue
                p = os.path.join(dirpath, f)
                try:
                    if f.endswith(".gz"):
                        with gzip.open(p, "rb") as fh:
                            data = fh.read(2_000_000)
                    else:
                        with open(p, "rb") as fh:
                            data = fh.read(2_000_000)
                except Exception:
                    continue
                n_files += 1
                data = TROFF_ESC.sub(b" ", data).lower()
                words = WORD.findall(data)
                tf.update(words)
                df.update(set(words))
    return tf, df, n_files


def main() -> int:
    tf, df, n_files = mine()
    vocab = {
        w.decode()
        for w, c in tf.items()
        if c >= MIN_TF and df[w] >= MIN_DF and _acceptable(w.decode())
    }
    headwords, dropped = set(), 0
    for w in sorted(vocab):
        if w in PROTECT:
            headwords.add(w)
            continue
        roots = candidate_roots(w)
        if roots and any(r in vocab for r in roots):
            dropped += 1  # inflection of a known word — not a headword
        else:
            headwords.add(w)
    headwords |= PROTECT
    with open(OUT, "w") as fh:
        fh.write(
            "# KStem headword lexicon — generated by scripts/build_kstem_dict.py\n"
            f"# from {n_files} public doc/man files; tf>={MIN_TF}, df>={MIN_DF}; "
            f"{dropped} inflected surface forms bootstrap-excluded.\n"
        )
        for w in sorted(headwords):
            fh.write(w + "\n")
    print(
        f"files={n_files} vocab={len(vocab)} dropped_inflections={dropped} "
        f"headwords={len(headwords)} -> {OUT}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
