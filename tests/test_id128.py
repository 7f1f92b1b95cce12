"""128-bit doc-id option (ROADMAP r2 #2 / VERDICT r2 next-step #5).

At 10^12 docs a 64-bit xxhash64(url) id expects ~2.7e4 birthday
collisions (SCALE.md), each silently merging two unrelated urls.
``DedupConfig(id_bits=128)`` switches the id to a 16-byte binary
(hi = xxhash64(url), lo = xxhash64(reverse(url))) that orders, joins,
windows, and passes through every Arrow kernel unchanged.

Real xxhash64 collisions cannot be synthesized in a test, so the
audit check constructs the colliding ids directly: two urls whose
64-bit ids are FORCED equal but whose 128-bit ids differ.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from miekki.config import DedupConfig

CFG128 = DedupConfig(id_bits=128)


def test_config_validates_id_bits():
    with pytest.raises(ValueError):
        DedupConfig(id_bits=96)
    assert DedupConfig().id_bits == 64
    assert CFG128.config_hash() != DedupConfig().config_hash()


def test_id_is_16_bytes_and_unique(spark, corpus_df):
    from miekki.stages.normalize import normalize

    docs = normalize(corpus_df, CFG128)
    assert dict(docs.dtypes)["doc_id"] == "binary"
    pdf = docs.select("doc_id", "url").toPandas()
    assert pdf.doc_id.map(len).eq(16).all()
    assert pdf.doc_id.map(bytes).nunique() == pdf.url.nunique()


def test_hi_half_matches_64bit_id(spark, corpus_df):
    """The hi 8 bytes of the 128-bit id ARE the 64-bit id — so the
    two modes agree on ordering-insensitive identity and operators
    can be cross-checked between modes."""
    from miekki.stages.normalize import normalize

    d64 = normalize(corpus_df, DedupConfig()).select("url", "doc_id")
    d128 = normalize(corpus_df, CFG128).select(
        "url", F.col("doc_id").alias("id128"))
    j = (d64.join(d128, "url")
         .select((F.expr("lpad(hex(doc_id), 16, '0')")  # hex() drops
                  # leading zeros on bigint (1/16 of rows) but not on
                  # binary — pad before comparing
                  == F.expr("substring(hex(id128), 1, 16)")).alias("ok")))
    assert j.where(~F.col("ok")).count() == 0


def test_audit_catches_64bit_collision_not_128(spark):
    """A corpus engineered to collide at 64 bits: same hi half,
    different lo half. The 64-bit audit reports the merge; the
    128-bit audit reports 0 — the exact rescue the option buys."""
    from miekki.stages.normalize import audit_id_collisions

    # hi halves < 2^63 so the 64-bit twin casts cleanly under ANSI
    rows = [("4A4A4A4A4A4A4A4A" + "00" * 8, "url_a"),
            ("4A4A4A4A4A4A4A4A" + "11" * 8, "url_b"),
            ("5B5B5B5B5B5B5B5B" + "00" * 8, "url_c")]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["hx", "url"]))
    ids128 = docs.select(F.unhex("hx").alias("doc_id"), "url")
    ids64 = docs.select(
        F.expr("cast(conv(substring(hx, 1, 16), 16, 10) as bigint)")
        .alias("doc_id"), "url")
    assert audit_id_collisions(ids64).count() == 1
    assert audit_id_collisions(ids128).count() == 0


def test_pipeline_e2e_under_128bit_ids(spark, corpus_df, fixture_corpus):
    """Full dedup under id_bits=128 meets the same recall gate as the
    64-bit mode and produces near-identical partitions. Exact partition
    equality is NOT guaranteed between id spaces: candidate generation
    is id-ORDER-dependent (chain successors, bucket minima), so
    borderline sub-threshold pairs (near_lo, J~0.6) can differ — the
    binding contract is recall over gated pairs (J >= 0.72)."""
    from miekki.pipeline import dedup_labels

    corpus_pdf, truth_pairs, _ = fixture_corpus
    l64 = (dedup_labels(corpus_df, DedupConfig())
           .select("url", F.col("cluster_id").cast("string").alias("c"))
           .toPandas())
    l128 = (dedup_labels(corpus_df, CFG128)
            .select("url", F.expr("hex(cluster_id)").alias("c"))
            .toPandas())
    assert len(l64) == len(l128)

    from oracle.xxh64 import spark_xxhash64
    url_by_id = {spark_xxhash64(u): u for u in corpus_pdf.url}
    gate = truth_pairs[(truth_pairs.kind != "negative")
                       & (truth_pairs.jaccard >= 0.72)]
    for lab in (l64, l128):
        c = dict(zip(lab.url, lab.c))
        hits = sum(c[url_by_id[r.src]] == c[url_by_id[r.dst]]
                   for r in gate.itertuples())
        assert hits / len(gate) >= 0.99, hits / len(gate)

    # partitions may only drift on borderline pairs — bound the drift
    p64 = set(l64.groupby("c").url.apply(frozenset))
    p128 = set(l128.groupby("c").url.apply(frozenset))
    moved = sum(len(s) for s in p64 - p128)
    assert moved <= 0.02 * len(l64), moved


def test_canonical_flags_match_between_modes(spark, corpus_df):
    """canonical = earliest (warc_ts, url) per cluster — id-space
    independent, so flags must agree on every cluster whose MEMBERSHIP
    agrees between modes (borderline near_lo clusters may differ; see
    test_pipeline_e2e_under_128bit_ids)."""
    from miekki.pipeline import dedup_labels

    c64 = dedup_labels(corpus_df, DedupConfig()) \
        .select("url", F.col("cluster_id").cast("string").alias("c"),
                "is_canonical").toPandas()
    c128 = dedup_labels(corpus_df, CFG128) \
        .select("url", F.expr("hex(cluster_id)").alias("c"),
                "is_canonical").toPandas()
    p64 = c64.groupby("c").url.apply(frozenset)
    common = set(p64) & set(c128.groupby("c").url.apply(frozenset))
    assert len(common) >= 0.98 * c64.c.nunique()
    urls_in_common = {u for s in common for u in s}
    m = (c64[c64.url.isin(urls_in_common)]
         .merge(c128, on="url", suffixes=("_64", "_128")))
    assert (m.is_canonical_64 == m.is_canonical_128).all()
