"""X47 cross-corpus near-dup flagging (miekki/cross.py): planted
recall/specificity on the fixture corpus, bipartite purity (no B-B or
A-A pairs), candidate bounds, and the salted-window plan shape."""

import pytest
from pyspark.sql import functions as F

from miekki.config import DedupConfig
from miekki.cross import cross_candidates, cross_dedup
from miekki.stages.normalize import normalize
from miekki.stages.signatures import signatures_from_text

CFG = DedupConfig()


@pytest.fixture(scope="module")
def sigs_a(spark, corpus_df):
    docs = normalize(corpus_df, CFG).localCheckpoint()
    return signatures_from_text(docs, CFG).localCheckpoint(), docs


def _b_corpus(spark, docs_a, n=40):
    """n verbatim copies (fresh ids) + n gibberish negatives."""
    dup = (docs_a.orderBy("doc_id").limit(n)
           .select(F.xxhash64(F.lit("B"), "doc_id").alias("doc_id"),
                   "norm_text", F.lit(True).alias("is_dup")))
    neg = (docs_a.orderBy("doc_id").limit(n)
           .select(F.xxhash64(F.lit("Bn"), "doc_id").alias("doc_id"),
                   F.concat_ws("", *[
                       F.md5(F.concat_ws("|", F.lit(str(i)),
                                         F.col("doc_id").cast("string"))
                             .cast("binary")) for i in range(6)])
                   .alias("norm_text"),
                   F.lit(False).alias("is_dup")))
    return dup.unionByName(neg).localCheckpoint()


def test_cross_dedup_planted_recall_and_specificity(spark, sigs_a):
    sa, docs_a = sigs_a
    docs_b = _b_corpus(spark, docs_a)
    sb = signatures_from_text(docs_b.select("doc_id", "norm_text"), CFG)
    v = (cross_dedup(sb, sa, CFG)
         .join(docs_b.select("doc_id", "is_dup"), "doc_id").toPandas())
    assert len(v) == 80
    dups = v[v["is_dup"]]
    negs = v[~v["is_dup"]]
    # every verbatim copy flags at est 1.0 with a concrete match
    assert dups["flagged"].all()
    assert (dups["est_j"] == 1.0).all()
    assert dups["matched_a"].notna().all()
    # no gibberish doc flags
    assert (~negs["flagged"]).all()


def test_cross_candidates_bipartite_and_bounded(spark, sigs_a):
    """Candidates only pair B against A ids, and the per-bucket rep
    cap bounds the candidate count by reps * |B bands|."""
    sa, docs_a = sigs_a
    docs_b = _b_corpus(spark, docs_a, n=20)
    sb = signatures_from_text(docs_b.select("doc_id", "norm_text"), CFG)
    cand = cross_candidates(sb, sa, CFG, reps_per_bucket=2).toPandas()
    a_ids = {r["doc_id"] for r in sa.select("doc_id").collect()}
    b_ids = {r["doc_id"] for r in sb.select("doc_id").collect()}
    assert set(cand["a_id"]) <= a_ids
    assert set(cand["b_id"]) <= b_ids
    assert not (set(cand["a_id"]) & b_ids)
    # <= reps * 32 bands candidates per B doc
    assert cand.groupby("b_id").size().max() <= 2 * CFG.bands


def test_cross_dedup_every_b_doc_gets_a_verdict(spark, sigs_a):
    """kept computed, never filtered: the output has exactly one row
    per B doc, including docs with zero candidates (NULL match)."""
    sa, docs_a = sigs_a
    docs_b = _b_corpus(spark, docs_a, n=10)
    sb = signatures_from_text(docs_b.select("doc_id", "norm_text"), CFG)
    v = cross_dedup(sb, sa, CFG).toPandas()
    assert len(v) == 20
    assert v["doc_id"].is_unique
    unmatched = v[v["matched_a"].isna()]
    assert (~unmatched["flagged"]).all()


def test_cross_candidates_plan_salted_windows_only(spark, sigs_a):
    """The only windows run over salted (bounded) A-band buckets and
    the <= reps*salts level-2 frames — never over raw corpus rows;
    no Python eval in the candidate plan."""
    sa, docs_a = sigs_a
    docs_b = _b_corpus(spark, docs_a, n=5)
    sb = signatures_from_text(docs_b.select("doc_id", "norm_text"), CFG)
    plan = (cross_candidates(sb, sa, CFG)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Window [") == 2    # level-1 salted + level-2
    assert "salt" in plan
    # Spark 4 rank-limit pushdown: each window gets a Partial+Final
    # WindowGroupLimit, so the top-reps prune happens map-side before
    # the sort — the bucket frame never materializes past reps rows
    assert plan.count("WindowGroupLimit") >= 2
