"""X39 deterministic corpus shuffle / shard assignment
(miekki/sharding.py): coverage, pos contiguity, determinism,
append stability, hash balance, single-Exchange plan, DuckDB twin."""

import duckdb
import pytest
from pyspark.sql import functions as F

from miekki.sharding import shard_assign, shard_assign_duck_sql, shard_stats

S = 8


def _docs(spark, n=400, parts=4):
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("doc_id"))


def test_coverage_and_ranges(spark):
    n = 400
    out = shard_assign(_docs(spark, n), n_shards=S).collect()
    assert len(out) == n
    assert sorted(r["doc_id"] for r in out) == list(range(n))
    assert all(0 <= r["shard"] < S for r in out)
    assert all(r["pos"] >= 0 for r in out)


def test_pos_contiguous_and_ordered_by_rank(spark):
    out = shard_assign(_docs(spark), n_shards=S).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["pos"])
        assert [r["pos"] for r in rows] == list(range(len(rows)))
        ranked = sorted(rows, key=lambda r: (r["rank"], r["doc_id"]))
        assert [r["doc_id"] for r in ranked] == [r["doc_id"] for r in rows]


def test_deterministic_under_repartition(spark):
    a = sorted(map(tuple, shard_assign(_docs(spark, parts=1),
                                       n_shards=S).collect()))
    b = sorted(map(tuple, shard_assign(
        _docs(spark, parts=1).repartition(7), n_shards=S).collect()))
    assert a == b


def test_append_stability(spark):
    """Growing the corpus never moves an existing doc's (rank, shard);
    only pos may shift as new docs interleave into the order."""
    small = {r["doc_id"]: (r["rank"], r["shard"])
             for r in shard_assign(_docs(spark, 200), n_shards=S).collect()}
    big = {r["doc_id"]: (r["rank"], r["shard"])
           for r in shard_assign(_docs(spark, 400), n_shards=S).collect()}
    for doc_id, rs in small.items():
        assert big[doc_id] == rs


def test_hash_balance(spark):
    """xxhash64 shards are hash-uniform: with n/S = 500 expected per
    shard, every shard lands within a generous 3x band (the binomial
    tail at this margin is astronomically small — a regression here
    means the hash or the pmod broke, not bad luck)."""
    st = {r["shard"]: r["n_docs"]
          for r in shard_stats(shard_assign(
              _docs(spark, 4000), n_shards=S)).collect()}
    assert set(st) == set(range(S))
    assert all(500 / 3 <= n <= 500 * 3 for n in st.values())


def test_single_exchange_plan(spark):
    """ONE Exchange (hashpartitioning on shard), streaming window,
    no Python eval; shard_stats composed on top reuses the window's
    partitioning — still exactly one Exchange end-to-end."""
    assigned = shard_assign(_docs(spark), n_shards=S)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "shard" in plan.split("Exchange hashpartitioning", 1)[1] \
        .split("\n", 1)[0]
    assert "Window" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    stats_plan = (shard_stats(assigned)._jdf.queryExecution()
                  .executedPlan().toString())
    assert stats_plan.count("Exchange") == 1


def test_duckdb_twin_parity(spark):
    rows = list(range(300))
    df = spark.createDataFrame([(i,) for i in rows], ["doc_id"])
    rk = F.expr("pmod(doc_id * 2654435761, 999983)")
    out = sorted(map(tuple, shard_assign(df, n_shards=S,
                                         rank_col=rk).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT)")
    con.executemany("INSERT INTO d VALUES (?)", [(i,) for i in rows])
    duck = sorted(con.sql(shard_assign_duck_sql(
        "d", "((doc_id * 2654435761) % 999983 + 999983) % 999983",
        n_shards=S)).fetchall())
    assert out == duck


def test_rejects_bad_n_shards(spark):
    with pytest.raises(ValueError):
        shard_assign(_docs(spark), n_shards=0)
