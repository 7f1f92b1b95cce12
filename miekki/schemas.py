"""Pinned table schemas (SURVEY.md §1.2) — nothing is inferred at
runtime; schema inference is nondeterministic across partitionings
and is banned."""

from __future__ import annotations

from pyspark.sql import types as T

# T0 — input corpus (shape mandated by BASELINE.json input_hint)
CORPUS = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("html", T.BinaryType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("lang", T.StringType(), False),
])

# T1 — normalized docs (n_shingles moved to T2 in r2: the fused
# signature kernel computes it for free; keeping it here forced an
# interpreted shingling pass just to materialize a count)
DOCS_NORM = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("lang", T.StringType(), False),
    T.StructField("norm_text", T.StringType(), False),
])

# T2 — signatures (from the fused kernel; n_shingles rides along)
SIGNATURES = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("minhash", T.ArrayType(T.LongType(), False), False),
    T.StructField("simhash", T.LongType(), False),
    T.StructField("n_shingles", T.IntegerType(), False),
])

# T3 — LSH bands (transient)
BANDS = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("band_id", T.IntegerType(), False),
    T.StructField("band_hash", T.LongType(), False),
    T.StructField("salt", T.IntegerType(), False),
])

# T4 — candidate edges. `weight` semantics per origin: minhash =
# estimated Jaccard (in [tau, 1]); simhash = 1 - hamming/bits; substr =
# verified common-run bytes, SATURATING at 2*substr_len + anchor_k
# (verification ships clipped windows — the >= substr_len accept
# decision is exact, but run lengths above the cap are reported as
# the cap; see stages/substr.py docstring / ADVICE r2).
CANDIDATE_EDGES = T.StructType([
    T.StructField("src", T.LongType(), False),
    T.StructField("dst", T.LongType(), False),
    T.StructField("origin", T.StringType(), False),
    T.StructField("weight", T.DoubleType(), True),
])

# T5 — cluster labels
CLUSTER_LABELS = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("cluster_id", T.LongType(), False),
    T.StructField("is_canonical", T.BooleanType(), False),
])

# T6 — per-partition metrics rows
METRICS = T.StructType([
    T.StructField("run_id", T.StringType(), False),
    T.StructField("stage", T.StringType(), False),
    T.StructField("partition_id", T.IntegerType(), False),
    T.StructField("rows_out", T.LongType(), False),
    T.StructField("bytes_out", T.LongType(), False),
    T.StructField("wall_ms", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), False),
])

# T7 — lineage rows (resume)
LINEAGE = T.StructType([
    T.StructField("run_id", T.StringType(), False),
    T.StructField("stage", T.StringType(), False),
    T.StructField("input_snapshot", T.StringType(), False),
    T.StructField("config_hash", T.StringType(), False),
    T.StructField("status", T.StringType(), False),
    # snapshot id of the table the stage WROTE ('done' rows only):
    # resume validates the table still carries this snapshot, so a
    # later run with a different config can't leave a stale done row
    # pointing at contents it didn't produce
    T.StructField("output_snapshot", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), False),
])

# Ground truth (FIXTURES.md F2)
TRUTH_PAIRS = T.StructType([
    T.StructField("src", T.LongType(), False),
    T.StructField("dst", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("jaccard", T.DoubleType(), False),
])
TRUTH_CLUSTERS = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("family_id", T.LongType(), False),
])
