"""End-to-end dedup pipeline (SURVEY.md §3.1).

``dedup_labels`` is the pure dataflow (DataFrame in → DataFrame out,
no I/O) used by tests and the driver contract; ``run`` adds
checkpointing / lineage / metrics via the catalog layer (O21–O23).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from miekki.config import DedupConfig
from miekki.stages.canonical import select_canonical
from miekki.stages.cc import cc_labels
from miekki.stages.lsh import minhash_candidate_edges
from miekki.stages.normalize import normalize, with_shingles
from miekki.stages.signatures import compute_signatures
from miekki.stages.verify import verify_edges


def candidate_edges(signatures: DataFrame, cfg: DedupConfig,
                    use_simhash: bool = True) -> DataFrame:
    """T2 → verified candidate edges (T4): minhash ∪ simhash (O14);
    the substring pass unions in at dedup_labels via extra_edges."""
    cand = minhash_candidate_edges(signatures, cfg)
    edges = verify_edges(cand, signatures, cfg, origin="minhash")
    if use_simhash:
        from miekki.stages.simhash import simhash_candidate_edges

        edges = edges.unionByName(simhash_candidate_edges(signatures, cfg))
    return edges


def dedup_labels(corpus: DataFrame, cfg: DedupConfig = DedupConfig(),
                 extra_edges: list[DataFrame] | None = None,
                 use_simhash: bool = True,
                 use_substr: bool = True) -> DataFrame:
    """corpus (url, warc_ts, text, lang[, html]) → labels
    (doc_id, cluster_id, url, warc_ts, is_canonical)."""
    docs = normalize(corpus, cfg)
    # signatures feed three consumers (banding + both verify joins):
    # materialize once instead of recomputing the Arrow kernel 3x.
    # pipeline.run() checkpoints T2 to the catalog instead (O23).
    docs = docs.localCheckpoint()
    sigs = compute_signatures(with_shingles(docs, cfg), cfg).localCheckpoint()
    edges = candidate_edges(sigs, cfg, use_simhash=use_simhash)
    if use_substr:
        from miekki.stages.substr import substr_candidate_edges

        edges = edges.unionByName(substr_candidate_edges(docs, cfg))
    for ex in extra_edges or []:
        edges = edges.unionByName(ex, allowMissingColumns=True)
    edge_pairs = edges.select("src", "dst").dropDuplicates(["src", "dst"])
    labels = cc_labels(edge_pairs, docs.select("doc_id"))
    meta = docs.select("doc_id", "url").join(
        corpus.select("url", "warc_ts"), "url")
    return select_canonical(labels, meta)
