"""O2 — text extraction + the byte-identical per-row invariant
(BASELINE.json input_hint: extract_text(html) == text per url).

The extractor itself is the pure function miekki.textproc.extract_text
(shared with the oracle); this stage is its Arrow-batched Spark
wrapper plus the invariant checker the pipeline runs as a guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from miekki.kernels import EXTRACT_SCHEMA, extract_text_kernel


def extract_texts(corpus: DataFrame) -> DataFrame:
    """(url, html) → (url, text) via the Arrow-batched extractor."""
    return corpus.select("url", "html").mapInArrow(
        extract_text_kernel, EXTRACT_SCHEMA
    )


def invariant_violations(corpus: DataFrame) -> DataFrame:
    """One row: count of urls whose extracted text differs byte-wise
    from the stored text column. MUST be 0 on valid corpora."""
    extracted = extract_texts(corpus).withColumnRenamed("text", "extracted")
    joined = corpus.select("url", "text").join(extracted, "url")
    return joined.agg(
        F.sum(F.when(F.col("text") != F.col("extracted"), 1).otherwise(0))
        .cast("long").alias("n_violations")
    )
