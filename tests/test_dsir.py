"""X32 DSIR importance resampling unit pins (miekki/dsir.py).

The driver key `dsir_select` cross-checks full per-row outputs
against the DuckDB twin at sf0.01; these tests pin the SPEC on a
hand-computed corpus (smoothing arithmetic, bigram construction,
the unseen-bucket constant, the empty-doc pin, Gumbel determinism)
and run an independent pure-Python reference so a shared misreading
of the spec can't hide.
"""

import hashlib
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from miekki.dsir import (RANK_BUCKETS, dsir_duck_sql, dsir_score,
                         feature_weights, features_col, md5_bucket)

RAW = [(1, "a b a"), (2, "a c"), (3, ""), (4, "x y z w")]
TARGET = [(10, "a b"), (11, "a a")]
B = 64


def _py_bucket(feat: str) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % B


def _py_feats(norm: str) -> list[str]:
    toks = [t for t in norm.split(" ") if t != ""]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_logw(norm: str, target_rows, raw_rows) -> float:
    tf = [f for _, n in target_rows for f in _py_feats(n)]
    rf = [f for _, n in raw_rows for f in _py_feats(n)]
    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for f in tf:
        tc[_py_bucket(f)] = tc.get(_py_bucket(f), 0) + 1
    for f in rf:
        rc[_py_bucket(f)] = rc.get(_py_bucket(f), 0) + 1
    nt, nr = len(tf) + B, len(rf) + B
    s = 0.0
    for f in _py_feats(norm):
        bk = _py_bucket(f)
        s += (math.log((tc.get(bk, 0) + 1) / nt)
              - math.log((rc.get(bk, 0) + 1) / nr))
    return round(s, 4)


@pytest.fixture(scope="module")
def scored(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "norm"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "norm"])
    w = feature_weights(tgt, raw, b=B, bucket_fn=md5_bucket(B))
    out = dsir_score(raw, w, threshold=0.0,
                     rank_col=F.expr(f"pmod(doc_id * 7919, {RANK_BUCKETS})"))
    return {r["doc_id"]: r for r in out.collect()}


def test_features_and_counts(scored):
    # "a b a" -> unigrams a b a + bigrams "a b" "b a" = 5 features
    assert scored[1]["n_feat"] == 5
    assert scored[2]["n_feat"] == 3
    assert scored[4]["n_feat"] == 7


def test_logw_matches_python_reference(scored):
    for doc_id, norm in RAW:
        if norm:
            assert scored[doc_id]["logw"] == pytest.approx(
                _py_logw(norm, TARGET, RAW), abs=2e-4), norm


def test_target_like_doc_scores_higher(scored):
    # doc 1 shares all features with the target; doc 4 shares none
    assert scored[1]["logw"] > scored[4]["logw"]


def test_empty_doc_pin(scored):
    d = scored[3]
    assert d["n_feat"] == 0 and d["logw"] == 0.0
    # key still defined: pinned logw + deterministic gumbel noise
    u = ((3 * 7919) % RANK_BUCKETS + 0.5) / RANK_BUCKETS
    assert d["g"] == round(-math.log(-math.log(u)), 4)
    assert d["key"] == round(d["logw"] + d["g"], 4)


def test_gumbel_deterministic(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "norm"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "norm"])
    w = feature_weights(tgt, raw, b=B, bucket_fn=md5_bucket(B))
    a = sorted(dsir_score(raw, w, 0.0).collect())
    b2 = sorted(dsir_score(raw, w, 0.0).collect())
    assert a == b2


def test_threshold_monotone(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "norm"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "norm"])
    w = feature_weights(tgt, raw, b=B, bucket_fn=md5_bucket(B))
    lo = {r["doc_id"] for r in dsir_score(
        raw, w, -10.0).where("kept").collect()}
    hi = {r["doc_id"] for r in dsir_score(
        raw, w, 1.0).where("kept").collect()}
    assert hi <= lo and len(lo) == len(RAW)


def test_duckdb_twin_parity(spark):
    """Spark and the DuckDB twin agree row-for-row on a corpus with
    repeats, OOV-ish docs, 1-token docs and empty docs."""
    rows = [(i, " ".join(f"w{(i * j) % 13}" for j in range(i % 9)))
            for i in range(80)]
    tgt_rows = [(i, n) for i, n in rows if i % 5 == 0 and n]
    raw = spark.createDataFrame(rows, ["doc_id", "norm"])
    tgt = spark.createDataFrame(tgt_rows, ["doc_id", "norm"])
    w = feature_weights(tgt, raw, b=B, bucket_fn=md5_bucket(B))
    spark_out = sorted(
        dsir_score(raw, w, threshold=0.2,
                   rank_col=F.expr(f"pmod(doc_id * 7919, {RANK_BUCKETS})"))
        .collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, norm VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    sql = dsir_duck_sql(
        "SELECT doc_id, norm FROM d",
        "SELECT doc_id, norm FROM d WHERE doc_id % 5 = 0 AND norm <> ''",
        threshold=0.2, b=B,
        rank_sql=f"((doc_id * 7919 % {RANK_BUCKETS}) + {RANK_BUCKETS})"
                 f" % {RANK_BUCKETS}")
    duck_out = sorted(con.sql(sql).fetchall())
    assert len(spark_out) == len(duck_out) == len(rows)
    for s, d in zip(spark_out, duck_out):
        assert (s["doc_id"], s["n_feat"]) == (d[0], d[1])
        assert s["logw"] == pytest.approx(d[2], abs=2e-4)
        assert s["g"] == d[3]
        assert s["key"] == pytest.approx(d[4], abs=2e-4)
        assert s["kept"] == d[5]


def test_scoring_join_is_broadcast(spark):
    """The weight join must be a broadcast-hash join and the corpus
    must hit exactly one shuffle (the doc_id agg) — no sort-merge
    join against the B-row model at any corpus size."""
    raw = spark.createDataFrame(RAW, ["doc_id", "norm"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "norm"])
    w = feature_weights(tgt, raw, b=B, bucket_fn=md5_bucket(B))
    plan = dsir_score(raw, w, 0.0)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the only sort-merge join allowed is feature_weights' B-bounded
    # FullOuter of the two count tables (full outer can't broadcast;
    # both sides are <= B rows at ANY corpus size) — the corpus-sized
    # exploded side must never be shuffle-joined
    for line in plan.splitlines():
        if "SortMergeJoin" in line:
            assert "FullOuter" in line, line
