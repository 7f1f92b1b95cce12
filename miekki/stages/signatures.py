"""O6/O7 — MinHash + SimHash signatures in ONE Arrow pass.

The only hot-path Python in the pipeline: shingle arrays stream
through mapInArrow, numpy computes both sketches per batch
(miekki.kernels). Everything before (shingling) and after (banding)
is JVM-side SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from miekki.config import DedupConfig
from miekki.kernels import SIG_SCHEMA, make_signature_kernel


def compute_signatures(docs_with_shingles: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(doc_id, shingles) → T2 (doc_id, minhash[n_perm], simhash).

    Column pruning matters: pass ONLY doc_id + shingles into the Arrow
    boundary — never norm_text/html (SURVEY.md §4 'our obligation')."""
    return docs_with_shingles.select("doc_id", "shingles").mapInArrow(
        make_signature_kernel(cfg), SIG_SCHEMA
    )
