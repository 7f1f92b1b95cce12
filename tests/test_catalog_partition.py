"""Catalog partitioned writes + append visibility (r3).

The streaming band state relies on two catalog behaviors: (a)
directory-partitioned tables prune partitions on filtered reads (the
per-batch history read is O(touched buckets)); (b) appends land in
the manifest's data directory and bump the snapshot id (the r3 fix —
appends after an overwrite used to be invisible to readers).
"""

import pandas as pd
from pyspark.sql import functions as F

from miekki.catalog import HadoopCatalog


def _mk(spark, n=200):
    return spark.createDataFrame(pd.DataFrame({
        "k": range(n), "pt": [i % 8 for i in range(n)]}))


def test_partitioned_read_prunes(spark, tmp_path_factory):
    cat = HadoopCatalog(spark, str(tmp_path_factory.mktemp("cat_pt")))
    cat.overwrite("t", _mk(spark), run_id="r0", partition_by=["pt"])
    df = cat.read("t").where(F.col("pt").isin([1, 3]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partition pruning shows up as PartitionFilters on the scan and
    # the scan must NOT read all 8 partition dirs
    assert "PartitionFilters" in plan
    assert df.count() == 50
    # partition column filters never appear as PushedFilters (they
    # prune whole directories instead)
    assert df.select("k").distinct().count() == 50


def test_append_after_overwrite_visible(spark, tmp_path_factory):
    cat = HadoopCatalog(spark, str(tmp_path_factory.mktemp("cat_ap")))
    cat.overwrite("t", _mk(spark, 100), run_id="r0")
    snap0 = cat.snapshot_id("t")
    cat.append("t", _mk(spark, 50))
    assert cat.read("t").count() == 150          # r3 fix: was 100
    assert cat.snapshot_id("t") != snap0         # appends change state


def test_append_partitioned_inherits_layout(spark, tmp_path_factory):
    cat = HadoopCatalog(spark, str(tmp_path_factory.mktemp("cat_ap2")))
    cat.overwrite("t", _mk(spark, 80), run_id="r0", partition_by=["pt"])
    cat.append("t", _mk(spark, 40))              # layout from manifest
    got = cat.read("t").where(F.col("pt") == 2)
    assert got.count() == 80 // 8 + 40 // 8


def test_append_into_bucketed_table_keeps_layout(spark, tmp_path_factory):
    """r4 (stream-signature state): appends into a bucketed table must
    keep the bucket layout — the scan stays `Bucketed: true` and a
    k-keyed aggregation over the table needs NO Exchange, which is what
    makes the streaming verify join one-sided at any history size."""
    cat = HadoopCatalog(spark, str(tmp_path_factory.mktemp("cat_bk")))
    cat.overwrite("t", _mk(spark, 64), run_id="r0", bucket_by=(4, ["k"]))
    snap0 = cat.snapshot_id("t")
    cat.append("t", _mk(spark, 8))
    t = cat.read("t")
    assert t.count() == 72
    assert cat.snapshot_id("t") != snap0
    agg = t.groupBy("k").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, plan
    assert "Exchange" not in plan, plan
