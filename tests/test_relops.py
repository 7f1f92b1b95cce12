"""asof_join semantics on hand-built fixtures (the driver key
cross-checks against DuckDB's native ASOF JOIN at sf0.01)."""

import pandas as pd
from pyspark.sql import functions as F


def test_asof_join_basic(spark):
    from miekki.relops import asof_join

    base = pd.Timestamp("2024-01-01")
    mins = lambda m: base + pd.Timedelta(minutes=m)
    left = spark.createDataFrame(
        pd.DataFrame({"user_id": [1, 1, 1, 2, 3],
                      "ts": [mins(0), mins(10), mins(20), mins(5), mins(9)],
                      "event_id": [10, 11, 12, 20, 30]}))
    right = spark.createDataFrame(
        pd.DataFrame({"user_id": [1, 1, 2, 9],
                      "ts": [mins(5), mins(10), mins(99), mins(0)],
                      "value": [1.0, 2.0, 3.0, 4.0]}))
    got = (asof_join(left, right, on="user_id", ts_col="ts",
                     value_cols=["value"])
           .orderBy("event_id").toPandas())
    # event 10 (t0): no purchase yet -> NULL; event 11 (t10): ties are
    # inclusive -> 2.0; event 12 (t20): latest is t10 -> 2.0;
    # user 2 (t5): right row is later (t99) -> NULL; user 3: no right
    assert got.event_id.tolist() == [10, 11, 12, 20, 30]
    vals = got.value_asof.tolist()
    assert pd.isna(vals[0]) and vals[1] == 2.0 and vals[2] == 2.0
    assert pd.isna(vals[3]) and pd.isna(vals[4])
    # all left columns survive
    assert {"user_id", "ts", "event_id", "value_asof"} <= set(got.columns)


def test_asof_join_no_single_partition_exchange(spark):
    from miekki.relops import asof_join

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = asof_join(e.where(F.col("event_type") == "click"),
                    e.where(F.col("event_type") == "purchase"),
                    on="user_id", ts_col="ts", value_cols=["value"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan


def test_asof_attaches_one_coherent_row_nulls_and_ties(spark):
    """ASOF semantics: attach the ONE latest right row — a NULL value
    on that row stays NULL (never backfilled from an older row), both
    value columns come from the same row, and ties on (key, ts) break
    deterministically by greatest value tuple."""
    from miekki.relops import asof_join

    left = spark.createDataFrame([(1, 10), (1, 3)], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, 1, 5.0, "a"),     # older, non-null
         (1, 2, None, "b"),    # latest before ts=10 and ts=3: NULL value
         (1, 2, None, "c")],   # tie on (k, ts): greatest tuple wins
        "k long, ts long, v double, tag string")
    out = {r["ts"]: r for r in asof_join(
        left, right, on="k", ts_col="ts",
        value_cols=["v", "tag"]).collect()}
    # NULL v from the latest row is preserved; tag comes from the SAME
    # row (tie-broken to the greatest (v, tag) tuple = (NULL?, 'c') —
    # struct ordering puts null v first, so 'c' wins among v-null rows)
    for ts in (10, 3):
        assert out[ts]["v_asof"] is None
        assert out[ts]["tag_asof"] == "c"
