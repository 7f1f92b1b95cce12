"""Structured Streaming extension (SURVEY.md §2.9): incremental dedup
of newly crawled pages against the historical corpus, plus the
watermark/window primitives over the events table.

The batch kernel (``incremental_dedup_batch``) reuses the batch
stages verbatim — they are batch-agnostic DataFrame transforms. The
streaming wrapper is readStream → withWatermark → foreachBatch; state
(signatures + labels) lives in the catalog, so the stream restarts
from its checkpoint AND the catalog stays the source of truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from miekki.catalog import Catalog
from miekki.config import DedupConfig
from miekki.schemas import CORPUS
from miekki.stages.cc import cc_labels
from miekki.stages.normalize import normalize
from miekki.stages.signatures import signatures_from_text
from miekki.stages.verify import verify_edges
from miekki.stages.lsh import band_table, star_edges


def incremental_dedup_batch(spark: SparkSession, catalog: Catalog,
                            new_corpus: DataFrame, cfg: DedupConfig,
                            run_id: str = "stream") -> DataFrame:
    """Merge one micro-batch of new pages into the dedup state.

    1. signatures for the batch (O2–O7, reused verbatim)
    2. LSH-join new bands against historical bands → cross edges;
       bands among the new docs → intra edges
    3. connected components over (new edges ∪ existing labels-as-edges)
       — labels (doc, cluster) are themselves edges to the cluster
       min, so incremental CC is just CC on the union (SURVEY.md §1.1)
    4. write back signatures/bands/labels to the catalog

    Returns the updated full label table.
    """
    docs = normalize(new_corpus, cfg).localCheckpoint()
    sigs = signatures_from_text(docs, cfg).localCheckpoint()
    new_bands = band_table(sigs, cfg).localCheckpoint()

    have_state = catalog.exists("stream_bands")
    if have_state:
        old_bands = catalog.read("stream_bands")
        all_bands = old_bands.unionByName(new_bands)
    else:
        all_bands = new_bands

    # candidate edges over the union, but only buckets touched by the
    # batch matter: semi-join bucket keys down to the new docs' bands
    touched = new_bands.select("band_id", "band_hash").distinct()
    active = all_bands.join(F.broadcast(touched), ["band_id", "band_hash"],
                            "left_semi")
    cand = star_edges(active, ["band_id", "band_hash"], cfg)

    # dropDuplicates(doc_id): foreachBatch is at-least-once, so a
    # replayed batch (or a re-crawled url) may have appended the same
    # signature rows; labels stay correct without this, but verify
    # joins would fan out on the duplicate rows (ADVICE r1)
    all_sigs = (catalog.read("stream_signatures").unionByName(sigs)
                .dropDuplicates(["doc_id"])
                if have_state else sigs)
    edges = verify_edges(cand, all_sigs, cfg).select("src", "dst")

    if catalog.exists("stream_labels"):
        old_labels = catalog.read("stream_labels")
        label_edges = (old_labels
                       .where(F.col("doc_id") != F.col("cluster_id"))
                       .select(F.col("doc_id").alias("src"),
                               F.col("cluster_id").alias("dst")))
        edges = edges.unionByName(label_edges)
        nodes = old_labels.select("doc_id").unionByName(docs.select("doc_id"))
    else:
        nodes = docs.select("doc_id")

    labels = cc_labels(edges, nodes.distinct()).localCheckpoint()

    catalog.overwrite("stream_labels", labels, run_id)
    if have_state:
        catalog.append("stream_signatures", sigs)
        catalog.append("stream_bands", new_bands)
    else:
        catalog.overwrite("stream_signatures", sigs, run_id)
        catalog.overwrite("stream_bands", new_bands, run_id)
    return labels


def run_incremental_stream(spark: SparkSession, catalog: Catalog,
                           source_dir: str, checkpoint_dir: str,
                           cfg: DedupConfig = DedupConfig(),
                           available_now: bool = True):
    """readStream over a corpus directory → foreachBatch incremental
    dedup. ``available_now`` processes everything present and stops
    (sandbox/test mode); a production stream drops it and runs
    continuously."""
    stream = (spark.readStream.schema(CORPUS).parquet(source_dir)
              .withWatermark("warc_ts", "1 day"))

    def process(batch_df: DataFrame, batch_id: int):
        """foreachBatch is at-least-once: a ledger row per applied
        batch_id makes the state writes effectively-once — a replayed
        batch is skipped instead of appended twice (the window between
        state-append and ledger-append is additionally covered by the
        dropDuplicates in incremental_dedup_batch)."""
        if batch_df.isEmpty():
            return
        if catalog.exists("stream_batches"):
            done = catalog.read("stream_batches") \
                .where(F.col("batch_id") == int(batch_id)).limit(1).count()
            if done:
                return
        incremental_dedup_batch(spark, catalog, batch_df, cfg,
                                run_id=f"stream_b{batch_id}")
        ledger = spark.createDataFrame([(int(batch_id),)], "batch_id long")
        if catalog.exists("stream_batches"):
            catalog.append("stream_batches", ledger)
        else:
            catalog.overwrite("stream_batches", ledger, f"b{batch_id}")

    writer = (stream.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation over the events table
    (works identically on a stream or a batch DataFrame)."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "sum_value"))
