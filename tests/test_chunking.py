"""X34 passage chunking unit pins (miekki/chunking.py).

The driver key `chunk_passages` cross-checks full per-row outputs
against the DuckDB twin at sf0.01; these tests pin the SPEC
(n_chunks arithmetic, overlap, the empty-doc pin, coverage) and the
map-only plan shape.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from miekki.chunking import chunk_duck_sql, chunk_passages

L, S = 8, 4
DOCS = [(1, "abcdefghij"),       # 10 chars -> 2 chunks
        (2, ""),                 # empty -> 1 empty chunk (pinned)
        (3, "abc"),              # short -> 1 whole chunk
        (4, "abcdefghijklmnop"),  # exact multiple -> 3 chunks
        (5, None)]               # NULL == empty (pinned)


@pytest.fixture(scope="module")
def chunks(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, norm string")
    out = chunk_passages(df, chunk_len=L, stride=S).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for v in by_doc.values():
        v.sort(key=lambda r: r["chunk_idx"])
    return by_doc


def test_hand_computed(chunks):
    assert [r["chunk"] for r in chunks[1]] == ["abcdefgh", "efghij"]
    assert [r["chunk"] for r in chunks[4]] == [
        "abcdefgh", "efghijkl", "ijklmnop"]
    assert [r["n_chars"] for r in chunks[1]] == [8, 6]


def test_empty_and_null_pin(chunks):
    for d in (2, 5):
        assert len(chunks[d]) == 1
        assert chunks[d][0]["chunk"] == "" and chunks[d][0]["n_chars"] == 0


def test_coverage_and_overlap(chunks):
    """Every char position covered; consecutive chunks overlap by
    exactly L - S except the clipped tail; chunk 0 starts at 0."""
    for doc_id, text in DOCS:
        if not text:
            continue
        rows = chunks[doc_id]
        covered = set()
        for r in rows:
            start = r["chunk_idx"] * S
            assert text[start:start + L] == r["chunk"]
            covered.update(range(start, start + len(r["chunk"])))
        assert covered == set(range(len(text)))


def test_duckdb_twin_parity(spark):
    rows = [(i, "x" * (i % 37) + "abcdefg"[: i % 7]) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, norm string")
    out = sorted(tuple(r) for r in
                 chunk_passages(df, chunk_len=16, stride=10).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, norm VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    duck = sorted(tuple(r) for r in con.sql(chunk_duck_sql(
        "SELECT doc_id, norm FROM d", chunk_len=16,
        stride=10)).fetchall())
    assert out == duck


def test_map_only_plan(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, norm string")
    plan = chunk_passages(df, chunk_len=L, stride=S) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" in plan           # posexplode, codegen'd
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stride_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, norm string")
    with pytest.raises(ValueError, match="stride"):
        chunk_passages(df, chunk_len=8, stride=9)


# ---------------- token-space windows (chunk_tokens) ----------------


def test_tokens_coverage_overlap_and_empty_pin(spark):
    from miekki.chunking import chunk_tokens

    rows = [(i, [f"t{j}" for j in range(0, (i * 37) % 53)])
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    L, S = 8, 6
    out = chunk_tokens(df, chunk_len=L, stride=S).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, tok in rows:
        got = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        if not tok:
            assert len(got) == 1 and got[0]["chunk"] == [] \
                and got[0]["n_tok"] == 0          # pinned empty chunk
            continue
        covered = []
        for i, r in enumerate(got):
            assert r["chunk"] == tok[i * S: i * S + L]
            covered.extend(range(i * S, i * S + len(r["chunk"])))
        assert set(covered) == set(range(len(tok)))   # full coverage
        if len(got) > 1:                              # exact overlap
            assert got[0]["chunk"][S:] == got[1]["chunk"][:L - S]


def test_tokens_map_only_plan(spark):
    from miekki.chunking import chunk_tokens

    df = spark.createDataFrame([(1, ["a", "b"])],
                               "doc_id long, tokens array<string>")
    plan = chunk_tokens(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tokens_duckdb_twin_parity(spark):
    import pandas as pd

    import duckdb
    from pyspark.sql import functions as F

    from miekki.chunking import chunk_tokens, chunk_tokens_duck_sql

    rows = [(i, [f"t{j}" for j in range(0, (i * 37) % 53)])
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    got = (chunk_tokens(df, chunk_len=8, stride=6)
           .withColumn("chunk", F.concat_ws(" ", "chunk"))
           .toPandas().sort_values(["doc_id", "chunk_idx"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("d", pd.DataFrame(rows, columns=["doc_id", "toks"]))
    duck = (con.sql(chunk_tokens_duck_sql(
        "SELECT doc_id, toks FROM d", chunk_len=8, stride=6)).df()
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    cols = sorted(got.columns)
    assert got[cols].astype(str).equals(duck[cols].astype(str))
