"""Relational extras beyond the dedup core: the as-of join.

SURVEY.md §2.0b originally documented theta/range/as-of joins as
unsupported; the as-of join is common enough in training-data
pipelines (attach the latest preceding signal — a purchase, a crawl
snapshot, a model score — to each event) that it is now first-class.

Scale shape: the classic as-of implementations are a range cross-join
(quadratic blowup per key) or a global sort-merge. This one is the
union-and-carry trick: tag both sides, union, ONE shuffle on the key,
per-partition sort by (ts, side), and a running `last(..., ignorenulls)`
window carries the latest right-side values forward into each left
row. Cost = one hash shuffle + one per-partition sort, independent of
how many right rows precede each left row; skew is bounded by the key
(same story as every other keyed shuffle in the pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_SIDE = "__asof_side"


def asof_join(left: DataFrame, right: DataFrame, on: str, ts_col: str,
              value_cols: list[str], suffix: str = "_asof") -> DataFrame:
    """For every left row, attach the ``value_cols`` of the LATEST
    right row with the same ``on`` key and right.ts <= left.ts
    (inclusive — matches DuckDB ASOF JOIN semantics, which the driver
    oracle uses); NULLs where no right row precedes.

    Returns all left columns plus one ``<col><suffix>`` per value col.
    """
    l = left.withColumn(_SIDE, F.lit(1))
    r = (right.select(on, ts_col, *value_cols)
              .withColumn(_SIDE, F.lit(0)))
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort BEFORE left rows at equal ts (side 0 < 1), so
    # b.ts == a.ts matches — the <= semantics
    w = (Window.partitionBy(on).orderBy(ts_col, _SIDE)
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = [
        F.last(F.when(F.col(_SIDE) == 0, F.col(c)), ignorenulls=True)
         .over(w).alias(c + suffix)
        for c in value_cols
    ]
    return (u.select("*", *carried)
             .where(F.col(_SIDE) == 1)
             .drop(_SIDE))
