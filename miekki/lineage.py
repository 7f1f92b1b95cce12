"""O21/O22 — per-stage lineage (resume) + per-partition metrics rows.

A stage executes iff the lineage table (T7) has no
(stage, input_snapshot, config_hash, status='done') row; re-runs
overwrite by run_id so a crashed half-write is replaced idempotently
(BASELINE.json north_rule: "resumable from checkpoint with
per-partition lineage + metrics").
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, Window, functions as F

from miekki import schemas
from miekki.catalog import Catalog

LINEAGE_TABLE = "lineage"
METRICS_TABLE = "metrics"


class LineageLog:
    def __init__(self, catalog: Catalog):
        self.catalog = catalog

    def done_snapshots(self, stage: str, input_snapshot: str,
                       config_hash: str) -> set[str]:
        """Output snapshots of matching 'done' rows. Resume must check
        the table's CURRENT snapshot is one of these: a done row alone
        proves the stage once ran, not that the table still holds its
        output — run(cfg A), run(cfg B), run(cfg A) again would
        otherwise skip the stage and silently serve B's table."""
        if not self.catalog.exists(LINEAGE_TABLE):
            return set()
        df = self.catalog.read(LINEAGE_TABLE)
        if "output_snapshot" not in df.columns:
            # lineage table written by a pre-output_snapshot version:
            # parquet schema inference may serve the old 6-column shape
            # even after mark() appends 7-column rows. No snapshot
            # evidence exists for those rows, so resume must recompute
            # (ADVICE r4: selecting the column unconditionally raised
            # AnalysisException on upgraded catalogs).
            return set()
        rows = (df.where(
            (F.col("stage") == stage)
            & (F.col("input_snapshot") == input_snapshot)
            & (F.col("config_hash") == config_hash)
            & (F.col("status") == "done"))
            .select("output_snapshot").collect())
        return {r[0] for r in rows if r[0] is not None}

    def mark(self, run_id: str, stage: str, input_snapshot: str,
             config_hash: str, status: str,
             output_snapshot: str | None = None) -> None:
        spark = self.catalog.spark
        row = [(run_id, stage, input_snapshot, config_hash, status,
                output_snapshot, datetime.now(timezone.utc))]
        self.catalog.append(LINEAGE_TABLE,
                            spark.createDataFrame(row, schemas.LINEAGE))


def emit_partition_metrics(catalog: Catalog, run_id: str, stage: str,
                           table: str, wall_ms: int) -> None:
    """T6: one row per output partition of the just-written table —
    read back (column-pruned) and counted by spark_partition_id.
    bytes_out = the table's real on-disk bytes (catalog.table_bytes)
    attributed to partitions proportionally by row count; a stage's
    rows_in is by construction the upstream stage's sum(rows_out), so
    T6 carries outputs only (SURVEY.md §1.2)."""
    df = catalog.read(table)
    per_part = (df.groupBy(F.spark_partition_id().alias("partition_id"))
                  .agg(F.count(F.lit(1)).alias("rows_out")))
    total_bytes = catalog.table_bytes(table) or 0
    ts = datetime.now(timezone.utc)
    w_total = F.sum("rows_out").over(Window.partitionBy())
    out = per_part.select(
        F.lit(run_id).alias("run_id"),
        F.lit(stage).alias("stage"),
        F.col("partition_id").cast("int"),
        F.col("rows_out").cast("long"),
        # double math: long*long would wrap negative past 2^63 (a PB
        # table times 1e7 rows ≈ 1e22); the proportional attribution
        # is approximate anyway, so double precision is the contract
        F.round(F.lit(float(total_bytes)) * F.col("rows_out")
                / F.greatest(w_total, F.lit(1)))
         .cast("long").alias("bytes_out"),
        F.lit(wall_ms).cast("long").alias("wall_ms"),
        F.lit(ts).alias("ts"),
    )
    catalog.append(METRICS_TABLE, out)


class StageRunner:
    """Idempotent stage wrapper: skip-if-done, write-then-mark,
    metrics emission; timing captured around the action."""

    def __init__(self, catalog: Catalog, run_id: str, config_hash: str,
                 collect_metrics: bool = True):
        self.catalog = catalog
        self.lineage = LineageLog(catalog)
        self.run_id = run_id
        self.config_hash = config_hash
        self.collect_metrics = collect_metrics
        self.executed: list[str] = []
        self.skipped: list[str] = []

    def materialize(self, stage: str, table: str, build, input_snapshot: str,
                    bucket_by: tuple[int, list[str]] | None = None) -> DataFrame:
        """build: () -> DataFrame. Returns the (possibly pre-existing)
        table contents."""
        done = self.lineage.done_snapshots(stage, input_snapshot,
                                           self.config_hash)
        if (done and self.catalog.exists(table)
                and self.catalog.snapshot_id(table) in done):
            self.skipped.append(stage)
            return self.catalog.read(table)
        t0 = time.time()
        self.lineage.mark(self.run_id, stage, input_snapshot,
                          self.config_hash, "started")
        self.catalog.overwrite(table, build(), self.run_id,
                               bucket_by=bucket_by)
        wall_ms = int((time.time() - t0) * 1000)
        if self.collect_metrics:
            emit_partition_metrics(self.catalog, self.run_id, stage,
                                   table, wall_ms)
        self.lineage.mark(self.run_id, stage, input_snapshot,
                          self.config_hash, "done",
                          output_snapshot=self.catalog.snapshot_id(table))
        self.executed.append(stage)
        return self.catalog.read(table)
