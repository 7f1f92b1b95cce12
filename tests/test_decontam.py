"""X17/X18 (miekki/decontam.py): URL canonicalization pinned-spec
cases + benchmark decontamination with planted overlaps, including
hash-gram vs string-gram parity (the production/driver mode split)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from miekki.decontam import (
    canonical_url_col,
    canonical_url_duck,
    canonical_url_py,
    decontaminate,
)

# (input, pinned expected canonical) — expectations are hand-derived
# from the spec in decontam.py, NOT from any implementation.
URL_CASES = [
    ("HTTPS://WWW.Example.COM:443/Path/To/Page/?utm_source=x&b=2&a=1#frag",
     "https://example.com/Path/To/Page?a=1&b=2"),
    ("http://example.com:8080/a//",            # non-default port kept
     "http://example.com:8080/a"),
    ("Http://Sub.WWW.Example.com:80/x",        # www stripped only at front
     "http://sub.www.example.com/x"),
    ("https://example.com",                    # empty path -> '/'
     "https://example.com/"),
    ("https://example.com/?utm_a=1&utm_b=2&fbclid=z",  # only tracking
     "https://example.com/"),
    ("https://example.com/p?ref=abc&refresh=1&b=",  # ref out, refresh kept
     "https://example.com/p?b=&refresh=1"),
    ("https://example.com/x?a=1&a=0",          # dup keys byte-sorted
     "https://example.com/x?a=0&a=1"),
    ("http://example.com:443/x",               # 443 on http is NOT default
     "http://example.com:443/x"),
    ("example.com/NoScheme?x=1",               # not absolute -> lower(trim)
     "example.com/noscheme?x=1"),
    ("  https://EXAMPLE.com/x  ",              # surrounding whitespace
     "https://example.com/x"),
]


def test_canonical_url_py_pinned_cases():
    for url, want in URL_CASES:
        assert canonical_url_py(url) == want, url


def test_canonical_url_spark_matches_pinned(spark):
    df = spark.createDataFrame([(u,) for u, _ in URL_CASES], "url string")
    got = [r.c for r in
           df.select(canonical_url_col("url").alias("c")).collect()]
    assert got == [want for _, want in URL_CASES]


def test_canonical_url_duckdb_matches_pinned():
    con = duckdb.connect()
    for url, want in URL_CASES:
        expr = canonical_url_duck("'" + url.replace("'", "''") + "'")
        got = con.execute(f"SELECT {expr}").fetchone()[0]
        assert got == want, url


DOCS = [
    # doc 0 is benchmark (pmod(doc_id, 97) == 0)
    (0, "alpha beta gamma delta epsilon zeta eta theta iota"),
    (1, "alpha beta gamma delta epsilon zeta eta theta"),   # 1 shared gram
    (2, "totally unrelated words that overlap with nothing here at all"),
    (97, "one two three four five six seven eight"),        # benchmark
    (3, "one two three four five six seven eight nine"),    # 1 shared gram
    (4, "tiny text"),                                       # short doc
]
EXPECT = {1: 1, 2: 0, 3: 1, 4: 0}


@pytest.mark.parametrize("hash_grams", [True, False])
def test_decontaminate_planted(spark, hash_grams):
    docs = spark.createDataFrame(DOCS, "doc_id long, norm string")
    out = decontaminate(docs, n=8, hash_grams=hash_grams)
    rows = {r.doc_id: (r.n_hit_grams, r.contaminated)
            for r in out.collect()}
    assert set(rows) == set(EXPECT)           # bench docs excluded
    for doc_id, n_hits in EXPECT.items():
        assert rows[doc_id] == (n_hits, n_hits > 0), doc_id


def test_decontaminate_hash_vs_string_parity(spark):
    """Production (xxhash64 grams) and portable (string grams) modes
    agree row-for-row on real corpus text — hashing is a pure
    transport optimization, not a semantic change."""
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .limit(400).select("doc_id", F.lower("text").alias("norm")))
    a = decontaminate(docs, n=8, hash_grams=True)
    b = decontaminate(docs, n=8, hash_grams=False)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_decontaminate_broadcast_plan(spark):
    """The benchmark gram side must be broadcast — the corpus side
    never shuffles for the join at any scale."""
    docs = spark.createDataFrame(DOCS, "doc_id long, norm string")
    plan = (decontaminate(docs, n=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


# =====================================================================
# X46 — URL-level dedup
# =====================================================================

def test_url_dedup_collapses_recrawls_keeps_richest(spark):
    """Captures that canonicalize identically form one group with
    exactly one winner — the longest text, ties to the larger doc_id;
    distinct canonical forms (non-default port, different path) stay
    separate."""
    from miekki.decontam import url_dedup

    rows = [
        # page A: three captures, tracking-param/scheme-case mess only
        (1, "https://www.a.com/p?utm_source=x", 100),
        (2, "HTTPS://A.COM:443/p", 300),
        (3, "https://a.com/p/#frag", 300),      # tie on len -> doc 3
        # page B: one capture
        (4, "http://b.com/q", 50),
        # page A on a NON-default port: its own group
        (5, "https://a.com:8080/p", 999),
    ]
    out = {r["doc_id"]: r for r in
           url_dedup(spark.createDataFrame(
               rows, "doc_id long, url string, n_chars long")).collect()}
    assert out[1]["canon_url"] == out[2]["canon_url"] == out[3]["canon_url"]
    assert out[1]["n_dups"] == 3
    assert (out[1]["kept"], out[2]["kept"], out[3]["kept"]) == \
        (False, False, True)
    assert out[4]["kept"] and out[4]["n_dups"] == 1
    assert out[5]["kept"] and out[5]["n_dups"] == 1
    assert out[5]["canon_url"] != out[1]["canon_url"]


def test_url_dedup_exactly_one_winner_per_group(spark):
    """Randomized: every canonical group keeps exactly one capture."""
    from miekki.decontam import url_dedup

    rows = [(i, f"https://s{i % 9}.com/page{i % 17}?utm_c={i}&z=1",
             (i * 13) % 40) for i in range(400)]
    out = url_dedup(spark.createDataFrame(
        rows, "doc_id long, url string, n_chars long")).toPandas()
    g = out.groupby("canon_url")
    assert (g["kept"].sum() == 1).all()
    assert (g["n_dups"].nunique() == 1).all()
    assert (g.size().values == out.groupby("canon_url")["n_dups"]
            .first().values).all()


def test_url_dedup_plan_no_window_partial_agg(spark):
    """groupBy+join shape: the giant recrawl group collapses map-side;
    never a window over raw captures."""
    from miekki.decontam import url_dedup

    docs = spark.createDataFrame(
        [(1, "https://a.com/p", 10)], "doc_id long, url string, n_chars long")
    plan = url_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # max(struct(...)) compiles to SortAggregate (structs are not
    # hash-aggregatable) — still a partial + final pair, so the hot
    # group collapses map-side before the exchange
    n_aggs = plan.count("HashAggregate") + plan.count("SortAggregate")
    assert n_aggs >= 2, plan
