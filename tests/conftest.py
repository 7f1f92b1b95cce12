import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("MIEKKI_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from miekki.session import build_spark

    # event log on tmpfs: the streaming flat-shuffle test reads
    # per-stage shuffle metrics from it (spark.ui stays off; the log
    # is a few MB of JSON for the whole suite)
    evlog = tempfile.mkdtemp(prefix="miekki_evlog_", dir="/dev/shm")
    s = build_spark(
        master="local[8]",
        app_name="miekki-tests",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false",
                    "spark.eventLog.enabled": "true",
                    # single uncompressed file so the shuffle meter can
                    # tail it by byte offset (Spark 4 defaults to a
                    # rolling zstd v2 layout)
                    "spark.eventLog.rolling.enabled": "false",
                    "spark.eventLog.compress": "false",
                    "spark.eventLog.dir": evlog},
    )
    s._miekki_evlog_dir = evlog
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_corpus():
    """(corpus_pdf, truth_pairs, truth_clusters) for sf0.001 — the
    deterministic planted-dup corpus (FIXTURES.md)."""
    from miekki.fixtures import make_corpus

    docs = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    return make_corpus(docs)


@pytest.fixture(scope="session")
def corpus_df(spark, fixture_corpus):
    corpus_pdf, _, _ = fixture_corpus
    return spark.createDataFrame(
        corpus_pdf[["url", "warc_ts", "html", "text", "lang"]]
    ).cache()


@pytest.fixture(scope="session")
def truth_components(fixture_corpus):
    """Ground-truth dup components: planted pairs ∪ ORGANIC near-dups.

    The synthetic base corpus contains organically near-identical
    texts (same generator word pool, J up to ~0.98, even across
    langs) — merging them is correct behavior, so the truth must be
    the transitive closure over planted edges plus all-pairs true
    char-5 Jaccard >= 0.7 (the pinned dup definition)."""
    from miekki.textproc import char_shingles, normalize_text
    from oracle.cc import cc_labels as oracle_cc
    from oracle.xxh64 import spark_xxhash64

    corpus_pdf, truth_pairs, _ = fixture_corpus
    ids = [spark_xxhash64(u) for u in corpus_pdf.url]
    sets = [frozenset(char_shingles(normalize_text(t), 5))
            for t in corpus_pdf.text]
    edges = [(r.src, r.dst) for r in truth_pairs.itertuples()
             if r.kind != "negative"]
    n = len(ids)
    for i in range(n):
        si = sets[i]
        for j in range(i + 1, n):
            sj = sets[j]
            inter = len(si & sj)
            if inter and inter / (len(si) + len(sj) - inter) >= 0.7:
                edges.append((ids[i], ids[j]))
    return oracle_cc(edges, ids)


@pytest.fixture(scope="session")
def pipeline_result(spark, corpus_df):
    """Run the full pipeline ONCE per test session; reused by the
    e2e/recall/golden tests. Returns (labels_pdf, edges_pdf)."""
    from miekki.config import DedupConfig
    from miekki.pipeline import candidate_edges, dedup_labels
    from miekki.stages.normalize import normalize, with_shingles
    from miekki.stages.signatures import compute_signatures
    from miekki.stages.substr import substr_candidate_edges

    cfg = DedupConfig()
    labels_pdf = dedup_labels(corpus_df, cfg).toPandas()
    docs = normalize(corpus_df, cfg).localCheckpoint()
    sigs = compute_signatures(with_shingles(docs, cfg), cfg).localCheckpoint()
    edges = candidate_edges(sigs, cfg).unionByName(
        substr_candidate_edges(docs, cfg))
    return labels_pdf, edges.toPandas()
