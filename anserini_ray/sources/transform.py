"""Document string transforms — the reference's `StringTransform` surface
(`J/collection/StringTransform.java`, `J/collection/JsoupStringTransform.java`:
`Jsoup.parse(s).text()`).

`jsoup_string_transform` is the Python analog of Jsoup's text extraction:
script/style/comment content dropped, tags removed, entities unescaped,
whitespace collapsed to single spaces (Jsoup `Element.text()` semantics —
exact DOM-level parity is unverifiable without a JVM; the behavior is
golden-tested on representative HTML in tests/)."""

from __future__ import annotations

import html as _html
import re

_SCRIPT_STYLE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG = re.compile(r"<[^>]+>")


def jsoup_string_transform(s: str) -> str:
    """Plain text out of an HTML string (JsoupStringTransform analog)."""
    if not s:
        return ""
    no_script = _SCRIPT_STYLE.sub(" ", s)
    no_comment = _COMMENT.sub(" ", no_script)
    no_tags = _TAG.sub(" ", no_comment)
    return " ".join(_html.unescape(no_tags).split())


def identity_transform(s: str) -> str:
    """The reference's default (no-op) StringTransform."""
    return s
