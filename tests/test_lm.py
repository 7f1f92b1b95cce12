"""X30 unigram-LM scoring unit pins (miekki/lm.py).

The driver key `lm_score` cross-checks full outputs against the
DuckDB twin at sf0.01; these tests pin the SPEC on a hand-computed
corpus (smoothing arithmetic, OOV handling, the vocab tie-break at
the V boundary, the empty-doc pin) and run the Spark-vs-DuckDB twin
on crafted rows so a shared misreading of the spec can't hide.
"""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from miekki.lm import lm_score, lm_score_duck_sql

DOCS = [(1, "a b a"), (2, "a c"), (3, "")]


@pytest.fixture(scope="module")
def lm_out(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "norm"])
    return {r["doc_id"]: r for r in lm_score(df, v=2).collect()}


def test_hand_computed_values(lm_out):
    # tokens: a b a | a c  -> counts a:3 b:1 c:1, N=5; vocab top-2 by
    # (count DESC, token ASC) = {a, b} (b beats c on the tie); denom =
    # N + V + 1 = 8; logp(a)=ln(4/8) logp(b)=ln(2/8) oov=ln(1/8)
    d1 = lm_out[1]
    assert d1["n_tok"] == 3 and d1["n_oov"] == 0
    expect1 = round((2 * math.log(0.5) + math.log(0.25)) / 3, 4)
    assert d1["mean_logp"] == expect1
    assert d1["ppl"] == round(math.exp(-expect1), 2)

    d2 = lm_out[2]          # "a c": c is OOV despite count == b's
    assert d2["n_tok"] == 2 and d2["n_oov"] == 1
    expect2 = round((math.log(0.5) + math.log(1 / 8)) / 2, 4)
    assert d2["mean_logp"] == expect2


def test_empty_doc_pin(lm_out):
    d3 = lm_out[3]
    assert (d3["n_tok"], d3["n_oov"]) == (0, 0)
    assert d3["mean_logp"] == 0.0 and d3["ppl"] == 1.0
    assert d3["lm_bucket"] == "head"


def test_duckdb_twin_parity(spark):
    """Spark and the DuckDB twin agree row-for-row on a corpus that
    exercises vocab ties, OOV, repeats and empty docs."""
    rows = [(i, " ".join(f"w{(i * j) % 7}" for j in range(i % 11)))
            for i in range(60)]
    out = sorted(
        lm_score(spark.createDataFrame(rows, ["doc_id", "norm"]),
                 v=5).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, norm VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    twin = sorted(con.execute(
        lm_score_duck_sql("SELECT doc_id, norm FROM d", v=5)).fetchall())
    assert [tuple(r) for r in out] == twin


def test_scoring_join_is_broadcast(spark):
    """The V-row model must reach the exploded corpus via broadcast —
    a shuffle join on `token` would hot-spot on Zipfian tokens."""
    df = spark.createDataFrame(DOCS, ["doc_id", "norm"])
    plan = lm_score(df, v=2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # only the scoring JOIN is constrained — the vocab-fit
    # groupBy(token) exchange is fine (partial agg collapses hot
    # tokens map-side); the corpus-sized exploded side must never be
    # shuffle-JOINED on token
    assert "SortMergeJoin [token" not in plan
    assert "ShuffledHashJoin [token" not in plan


def test_null_norm_pinned_as_empty(spark):
    """A NULL norm must behave exactly like an empty doc (pinned row,
    never silently dropped) — without the coalesce in _tokens the row
    would vanish from the output entirely while the DuckDB twin keeps
    it, and the never-discard contract would break for any caller
    that bypasses norm_text_col's coalesce."""
    df = spark.createDataFrame(
        [(1, "a b"), (2, None), (3, "")],
        "doc_id long, norm string")
    out = {r["doc_id"]: r for r in lm_score(df, v=2).collect()}
    assert len(out) == 3
    for d in (2, 3):
        assert (out[d]["n_tok"], out[d]["mean_logp"],
                out[d]["ppl"]) == (0, 0.0, 1.0)
