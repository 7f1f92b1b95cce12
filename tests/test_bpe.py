"""X38 BPE tokenizer (miekki/bpe.py): hand-computed merge goldens,
round-trip invariant, determinism, vocab bound, plan shape."""

import pytest
from pyspark.sql import functions as F

from miekki.bpe import (EOW, apply_bpe_word, bpe_tokenize, fit_bpe,
                        fit_bpe_from_counts)


def test_hand_computed_merges():
    """Sennrich'16 §3.2-style example: counts force a known merge
    order; ties break to the lexicographically smallest pair."""
    merges = fit_bpe_from_counts(
        {"low": 5, "lower": 2, "newest": 6, "widest": 3}, n_merges=4)
    # 'es' appears 9x (newest+widest) — the unique max; then 'es'+'t'
    # 9x; then 't</w>' 9x; then 'lo' 7x
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    assert merges[3] == ("l", "o")


def test_apply_follows_rank_order():
    merges = [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o")]
    rank = {p: i for i, p in enumerate(merges)}
    assert apply_bpe_word("newest", rank) == ["n", "e", "w", "est" + EOW]
    assert apply_bpe_word("low", rank) == ["lo", "w", EOW]
    assert apply_bpe_word("", rank) == [EOW]


def test_tie_break_is_lexicographic():
    # both pairs appear exactly once; ('a','b') < ('b','c')
    merges = fit_bpe_from_counts({"abc": 1}, n_merges=1)
    assert merges[0] == ("a", "b")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"the quick fox number {i % 7} jumps the fence")
            for i in range(60)]
    rows += [(100, ""), (101, None), (102, "  double  spaced  ")]
    return spark.createDataFrame(rows, "doc_id long, norm string")


def test_roundtrip_and_determinism(spark, corpus):
    """concat(tokens) minus EOW markers == the doc minus spaces, for
    every doc incl. empty/NULL/multi-space; identical output under
    repartitioning (merge table + cache are deterministic)."""
    merges = fit_bpe(corpus, n_merges=50, sample=40)
    toks = bpe_tokenize(corpus, merges)
    joined = (toks.join(corpus, "doc_id")
              .select("doc_id",
                      F.regexp_replace(
                          F.concat_ws("", "tokens"), EOW, "")
                      .alias("rebuilt"),
                      F.regexp_replace(
                          F.coalesce("norm", F.lit("")), " ", "")
                      .alias("expected")))
    bad = joined.where(F.col("rebuilt") != F.col("expected")).count()
    assert bad == 0

    a = sorted(toks.collect())
    b = sorted(bpe_tokenize(corpus.repartition(7), merges).collect())
    assert a == b


def test_vocab_bounded(spark, corpus):
    """Distinct output tokens <= distinct corpus chars (+EOW forms)
    + n_merges: merges only ever ADD one symbol each."""
    n_merges = 30
    merges = fit_bpe(corpus, n_merges=n_merges, sample=40)
    toks = bpe_tokenize(corpus, merges)
    n_tokens = (toks.select(F.explode("tokens").alias("t"))
                .select("t").distinct().count())
    n_chars = (corpus.select(F.explode(F.split(
        F.regexp_replace(F.coalesce("norm", F.lit("")), " ", ""), ""))
        .alias("c")).where(F.col("c") != "").distinct().count())
    # chars can appear bare or EOW-suffixed; merges add <= n_merges
    assert n_tokens <= 2 * n_chars + n_merges + 1


def test_map_only_plan(spark, corpus):
    merges = fit_bpe(corpus, n_merges=10, sample=20)
    plan = (bpe_tokenize(corpus, merges)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan


def test_feeds_token_space_loaders(spark, corpus):
    """The loader story end-to-end: BPE tokens -> X33t pack_pieces
    conservation holds on real subword arrays."""
    from miekki.packing import pack_pieces

    merges = fit_bpe(corpus, n_merges=50, sample=40)
    toks = bpe_tokenize(corpus, merges).localCheckpoint()
    pieces = pack_pieces(toks, seq_len=16, n_buckets=2,
                         tokens_col="tokens")
    per_doc = (pieces.groupBy("doc_id")
               .agg(F.sum("n_piece").alias("s")))
    src = toks.select("doc_id", F.size("tokens").alias("n"))
    bad = (per_doc.join(src, "doc_id")
           .where(F.col("s") != F.col("n")).count())
    assert bad == 0
