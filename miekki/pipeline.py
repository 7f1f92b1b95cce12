"""End-to-end dedup pipeline (SURVEY.md §3.1).

``dedup_labels`` is the pure dataflow (DataFrame in → DataFrame out,
no I/O) used by tests and the driver contract; ``run`` adds
checkpointing / lineage / metrics via the catalog layer (O21–O23) and
resumes mid-pipeline: a stage re-executes only when its input
snapshot or the config hash changed or no 'done' lineage row exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from miekki.config import DedupConfig
from miekki.stages.canonical import select_canonical
from miekki.stages.cc import cc_labels
from miekki.stages.lsh import minhash_candidate_edges
from miekki.stages.normalize import normalize
from miekki.stages.signatures import signatures_from_text
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


def _doc_meta(docs, corpus):
    """(doc_id, url, warc_ts) with EXACTLY one row per doc: url is
    T0's primary key, but a dirty input carrying the same url twice
    (recrawl appended instead of upserted) would otherwise fan out
    quadratically through this join and emit duplicate label rows per
    doc_id. Pin min(warc_ts) per url (deterministic; the canonical
    tie-break prefers the earliest crawl anyway) and fold docs to one
    row per doc_id (url is a function of doc_id — same hash preimage)."""
    meta_ts = (corpus.select("url", "warc_ts")
               .groupBy("url").agg(F.min("warc_ts").alias("warc_ts")))
    return (docs.select("doc_id", "url").dropDuplicates(["doc_id"])
            .join(meta_ts, "url"))


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
    # localCheckpoint, NOT persist(): an InMemoryRelation would preserve
    # the doc_id partitioning for the six doc_id-keyed joins downstream,
    # but measured e2e at 4 cores it DOUBLED the candidate-edge phase
    # (361 s vs ~130 s) — every branch re-decodes the columnar cache and
    # whole-stage codegen breaks at the cache boundary, which costs far
    # more than the skinny join-side exchanges it saves. On a real
    # cluster the equivalent partition reuse comes free from the
    # bucketed T1/T2 catalog writes in run() (SURVEY.md §4.5).
    docs = docs.localCheckpoint()
    sigs = signatures_from_text(docs, cfg).localCheckpoint()
    edges = candidate_edges(sigs, cfg, use_simhash=use_simhash)
    if use_substr:
        from miekki.stages.substr import substr_candidate_edges

        edges = edges.unionByName(substr_candidate_edges(docs, cfg))
    for ex in extra_edges or []:
        edges = edges.unionByName(ex, allowMissingColumns=True)
    edge_pairs = edges.select("src", "dst").dropDuplicates(["src", "dst"])
    labels = cc_labels(edge_pairs, docs.select("doc_id"))
    meta = _doc_meta(docs, corpus)
    return select_canonical(labels, meta)


def run(spark, catalog, cfg: DedupConfig = DedupConfig(),
        run_id: str = "run0", corpus_table: str = "corpus",
        check_invariant: bool = False,
        use_simhash: bool = True, use_substr: bool = True,
        collect_metrics: bool = True, n_buckets: int = 32,
        emit_tiers: bool = False) -> dict:
    """Durable pipeline: corpus table → checkpointed T1/T2/T4/T5 in
    the catalog with lineage + per-partition metrics (O21–O23).

    Stage graph (each row = one catalog table, one lineage unit):
      docs_norm      ← corpus                      (O3/O4)
      signatures     ← docs_norm                   (O5–O7 + n_shingles)
      candidate_edges← signatures [+ docs_norm]    (O8–O14)
      cluster_labels ← candidate_edges + docs_norm (O15–O19)
      doc_tiers      ← candidate_edges + docs_norm (X27, opt-in:
                       emit_tiers=True — off by default so the
                       benchmarked 4-stage job stays comparable
                       across rounds)

    Resume: stage skipped iff a 'done' lineage row matches
    (stage, input_snapshot, config_hash) AND the output table exists;
    snapshots chain, so re-running an upstream stage invalidates all
    downstream stages automatically.
    """
    from miekki.lineage import StageRunner

    runner = StageRunner(catalog, run_id, cfg.config_hash(),
                         collect_metrics=collect_metrics)
    corpus_snap = catalog.snapshot_id(corpus_table) or "none"
    corpus = catalog.read(corpus_table)

    if check_invariant:
        from miekki.stages.extract import invariant_violations
        from miekki.stages.normalize import assert_nfc_sample

        bad = invariant_violations(corpus).first()["n_violations"]
        if bad:
            raise RuntimeError(
                f"extract invariant violated on {bad} rows (BASELINE input_hint)")
        assert_nfc_sample(corpus)

    docs = runner.materialize(
        "docs_norm", "docs_norm",
        lambda: normalize(corpus, cfg)
        .select("doc_id", "url", "lang", "norm_text"),
        corpus_snap)

    # T2 bucketed by doc_id: both verify joins (src- and dst-side)
    # then read the signatures shuffle-free (SURVEY.md §4.5); at
    # 10^12 docs n_buckets is sized so one bucket ~ one executor core
    # worth of signatures (physical knob, not part of config_hash).
    docs_snap = catalog.snapshot_id("docs_norm")
    sigs = runner.materialize(
        "signatures", "signatures",
        lambda: signatures_from_text(
            docs.select("doc_id", "norm_text"), cfg),
        docs_snap, bucket_by=(n_buckets, ["doc_id"]))

    def build_edges():
        e = candidate_edges(sigs, cfg, use_simhash=use_simhash)
        if use_substr:
            from miekki.stages.substr import substr_candidate_edges

            e = e.unionByName(substr_candidate_edges(
                docs.select("doc_id", "norm_text"), cfg))
        return e

    edges_snap = f"{docs_snap}+{catalog.snapshot_id('signatures')}"
    edges = runner.materialize("candidate_edges", "candidate_edges",
                               build_edges, edges_snap,
                               bucket_by=(n_buckets, ["src"]))

    def build_labels():
        pairs = edges.select("src", "dst").dropDuplicates(["src", "dst"])
        labels = cc_labels(pairs, docs.select("doc_id"))
        return select_canonical(labels, _doc_meta(docs, corpus))

    labels_snap = f"{edges_snap}+{catalog.snapshot_id('candidate_edges')}"
    labels = runner.materialize("cluster_labels", "cluster_labels",
                                build_labels, labels_snap)

    out = {
        "labels": labels,
        "executed": runner.executed,
        "skipped": runner.skipped,
        "n_docs": labels.count(),
    }
    if emit_tiers:
        from miekki.tiers import pipeline_doc_tiers

        out["tiers"] = runner.materialize(
            "doc_tiers", "doc_tiers",
            lambda: pipeline_doc_tiers(
                docs.select("doc_id", "norm_text"), edges),
            f"{edges_snap}+{catalog.snapshot_id('candidate_edges')}")
    return out
