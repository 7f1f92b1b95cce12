"""Pure text functions shared by the Spark pUDFs, the oracle, and the
fixture generator (SURVEY.md O2/O3; FIXTURES.md F1).

``extract_text`` is the reference extractor: the per-row invariant
``extract_text(html) == text`` must hold byte-identically per url
(BASELINE.json input_hint). ``render_html`` is its exact inverse for
whitespace-normalized input: extract_text(render_html(t)) ==
normalize_ws(t) (property-tested, SURVEY.md §5.2).

No pyspark imports here — this module must load in the oracle and in
Arrow worker processes alike.
"""

from __future__ import annotations

import html as _html
import re

_WS_RE = re.compile(r"[ \t\r\n]+")
_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")
_BODY_RE = re.compile(r"<body\b[^>]*>(.*)</body\s*>", re.IGNORECASE | re.DOTALL)


def normalize_ws(text: str) -> str:
    """Collapse every run of [ \\t\\r\\n]+ to one space, then strip.

    Mirrors the Spark-side ``regexp_replace(text,'[ \\t\\r\\n]+',' ')``
    + ``trim`` exactly (both operate on Unicode code points).
    """
    return _WS_RE.sub(" ", text).strip()


def normalize_text(text: str) -> str:
    """Full O3 normalization: lower → collapse whitespace → strip.

    Input is assumed NFC (fixtures are; guarded by a sampled is-NFC
    check in the pipeline). Pinned vs Spark's F.lower/F.regexp_replace
    /F.trim by tests on the real corpus texts (SURVEY.md §2.1).
    """
    return normalize_ws(text.lower())


def extract_text(html_bytes: bytes) -> str:
    """Reference extractor: body text of an HTML page, whitespace-normalized.

    Pinned semantics (SURVEY.md O2):
      1. decode UTF-8 (errors='replace' — fixtures are valid UTF-8)
      2. take the first <body>...</body> span (whole doc if absent)
      3. drop <script>/<style> elements and <!-- comments -->
      4. strip remaining tags (replaced with '', not space — block
         separation is carried by in-paragraph whitespace, which
         render_html preserves; this is what makes the round-trip
         byte-exact)
      5. unescape HTML entities (&amp;, &#x4e2d;, ...)
      6. collapse [ \\t\\r\\n]+ to one space, strip
    """
    doc = html_bytes.decode("utf-8", errors="replace")
    m = _BODY_RE.search(doc)
    if m:
        doc = m.group(1)
    doc = _COMMENT_RE.sub("", doc)
    doc = _SCRIPT_RE.sub("", doc)
    doc = _STYLE_RE.sub("", doc)
    doc = _TAG_RE.sub("", doc)
    doc = _html.unescape(doc)
    return normalize_ws(doc)


_HTML_HEAD = (
    "<!doctype html><html><head>"
    '<meta charset="utf-8"><title>T</title>'
    "<style>body{}</style><script>var x=1;</script>"
    "</head><body>"
)
_HTML_TAIL = "</body></html>"


def render_html(text: str) -> bytes:
    """Fixture page renderer — the exact inverse of extract_text
    (FIXTURES.md F1).

    Splits ``text`` into sentence paragraphs on '. ', keeping the
    separator attached to the preceding paragraph so plain
    concatenation of paragraph texts reproduces the input byte-wise.
    """
    parts = text.split(". ")
    paras = [p + ". " for p in parts[:-1]] + [parts[-1]]
    body = "".join(f"<p>{_html.escape(p, quote=False)}</p>" for p in paras)
    return (_HTML_HEAD + body + _HTML_TAIL).encode("utf-8")


def char_shingles(norm_text: str, k: int = 5) -> list[str]:
    """Distinct character k-shingles, first-occurrence order.

    Docs shorter than k yield one shingle = the whole text
    (SURVEY.md §2.1). Mirrors the Spark-side
    transform(sequence(1, greatest(1, len-k+1)), i -> substring(t,i,k)).
    """
    n = len(norm_text)
    if n <= k:
        return [norm_text]
    seen: dict[str, None] = {}
    for i in range(n - k + 1):
        seen.setdefault(norm_text[i : i + k])
    return list(seen)
