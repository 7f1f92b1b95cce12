"""Extraction + normalization invariants (SURVEY.md §5.2, O2/O3).

The per-row invariant extract_text(render_html(t)) == normalize_ws(t)
is the pinned byte-identical contract (BASELINE.json input_hint).
"""

import string

from hypothesis import given, settings, strategies as st

from miekki.textproc import char_shingles, extract_text, normalize_ws, render_html

CASES = [
    "hello world",
    "Sentence one. Sentence two. Three",
    "entities & ampersand < less > greater",
    "中文内容，没有空格。标点符号！",
    "mixed 中文 and english. Multi. Dots. Here",
    "trailing dot.",
    ". leading",
    "a",
    "",
    "tabs\tand\nnewlines\r\ncrlf",
    "double  spaces   collapse",
    "x" * 5000,
]


def test_roundtrip_cases():
    for t in CASES:
        assert extract_text(render_html(t)) == normalize_ws(t), repr(t)


def test_head_content_dropped():
    html = render_html("body text only")
    # title 'T', style body, script body must not leak into extraction
    assert extract_text(html) == "body text only"


def test_entities():
    assert extract_text(b"<html><body><p>a &amp; b &#x4e2d;</p></body></html>") == "a & b 中"


def test_script_style_dropped():
    raw = (b"<body>keep<script>drop this;</script> and"
           b"<style>p{color:red}</style> this</body>")
    assert extract_text(raw) == "keep and this"


def test_no_body_tag_falls_back_to_whole_doc():
    assert extract_text(b"<p>free floating</p>") == "free floating"


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.ascii_letters + string.digits + " .,&<>中文éß", min_size=0, max_size=400))
def test_roundtrip_property(t):
    assert extract_text(render_html(t)) == normalize_ws(t)


def test_shingles_short_doc():
    assert char_shingles("abc", 5) == ["abc"]
    assert char_shingles("", 5) == [""]
    assert char_shingles("abcde", 5) == ["abcde"]
    assert char_shingles("abcdef", 5) == ["abcde", "bcdef"]


def test_shingles_distinct():
    assert char_shingles("aaaaaaaa", 5) == ["aaaaa"]
