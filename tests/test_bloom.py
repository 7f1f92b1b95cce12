"""X42 Bloom-filter membership (miekki/bloom.py) unit pins.

The driver cross-check (`bloom_decontam` key) value-twins the full
build+probe against DuckDB at sf0.01, false positives included;
these tests pin the structure's defining guarantees on crafted sets:
never a false negative, fp rate tracking the Bloom formula, the
union/merge algebra, paragraph-splitting indices, and the plan
shapes (driver-free build, window-free probe).
"""

import pytest
from pyspark.sql import functions as F

from miekki.bloom import (BLOOM_K_DEFAULT, bloom_build, bloom_decontam,
                          bloom_fp_rate, bloom_probe, paragraphs)


def _strs(spark, vals, col="v"):
    return spark.createDataFrame([(s,) for s in vals], [col])


@pytest.fixture(scope="module")
def built(spark):
    members = [f"member-{i}" for i in range(400)]
    blm = bloom_build(_strs(spark, members), "v", m_bits=1 << 14, k=7)
    blm.persist().count()
    return members, blm


def test_bloom_never_false_negative(spark, built):
    members, blm = built
    out = bloom_probe(_strs(spark, members).withColumn("key", F.col("v")),
                      blm, "v", key_cols=("key",),
                      m_bits=1 << 14, k=7).toPandas()
    assert len(out) == len(members)
    assert out["maybe_in_ref"].all()


def test_bloom_fp_rate_tracks_formula(spark, built):
    """Probing 2000 non-members: the observed fp fraction must be
    within [0, 4x] of the Bloom formula (binomial noise at ~2%
    expected over 2000 trials stays well inside 4x)."""
    members, blm = built
    others = [f"other-{i}" for i in range(2000)]
    out = bloom_probe(_strs(spark, others).withColumn("key", F.col("v")),
                      blm, "v", key_cols=("key",),
                      m_bits=1 << 14, k=7).toPandas()
    expect = bloom_fp_rate(len(members), 1 << 14, 7)
    observed = out["maybe_in_ref"].mean()
    assert expect > 0
    assert observed <= 4 * expect, (observed, expect)


def test_bloom_union_merge_algebra(spark):
    """bit_or-merging two independently built filters IS the filter
    of the union — the property that lets a 10^4-file corpus build
    shards independently and fold them associatively."""
    a, b = [f"a{i}" for i in range(50)], [f"b{i}" for i in range(50)]
    kw = dict(m_bits=1 << 12, k=5)
    merged = (bloom_build(_strs(spark, a), "v", **kw)
              .unionByName(bloom_build(_strs(spark, b), "v", **kw))
              .groupBy("word_idx").agg(F.bit_or("bits").alias("bits")))
    direct = bloom_build(_strs(spark, a + b), "v", **kw)
    assert (merged.exceptAll(direct).count() == 0
            and direct.exceptAll(merged).count() == 0)


def test_bloom_md5_mode_matches_python(spark):
    """The portable md5 positions are exactly the documented
    formula — recomputed here from hashlib for one value."""
    import hashlib

    m = 1 << 16
    blm = bloom_build(_strs(spark, ["pinned"]), "v",
                      m_bits=m, k=3, hash_fn="md5").toPandas()
    words = {}
    for j in range(3):
        pos = int(hashlib.md5(f"{j}|pinned".encode()).hexdigest()[:15],
                  16) % m
        words[pos // 32] = words.get(pos // 32, 0) | (1 << (pos % 32))
    assert {int(r["word_idx"]): int(r["bits"])
            for _, r in blm.iterrows()} == words


def test_paragraphs_indices_and_trim(spark):
    """Split on the literal blank line; idx = position in the
    ORIGINAL split; whitespace-only pieces dropped, others
    space-trimmed."""
    df = spark.createDataFrame(
        [(1, "first para\n\n second \n\n \n\nlast")], ["doc_id", "text"])
    out = {(r["para_idx"], r["para"])
           for r in paragraphs(df).collect()}
    assert out == {(0, "first para"), (1, "second"), (3, "last")}


def test_bloom_decontam_supersets_exact(spark, corpus_df):
    """Bloom flags are a SUPERSET of X17's exact hits (one-sided
    error): every exactly-contaminated doc must be flagged, and
    n_flagged >= the exact hit count per doc."""
    from miekki.decontam import decontaminate
    from miekki.stages.normalize import norm_text_col

    docs = corpus_df.limit(300).select(
        F.xxhash64("url").alias("doc_id"),
        norm_text_col("text").alias("norm"))
    approx = bloom_decontam(docs, n=5, m_bits=1 << 12, k=7,
                            bench_mod=11).toPandas().set_index("doc_id")
    exact = (decontaminate(docs, n=5, hash_grams=False,
                           bench_pred=F.pmod(F.col("doc_id"),
                                             F.lit(11)) == 0)
             .toPandas().set_index("doc_id"))
    assert set(approx.index) == set(exact.index)
    joined = approx.join(exact)
    assert (joined["n_flagged"] >= joined["n_hit_grams"]).all()
    assert joined.loc[joined["contaminated"], "flagged_any"].all()


def test_bloom_plan_shapes(spark, built):
    """build = ONE exchange (the word_idx aggregate); probe = no
    Window, no cartesian — the filter side joins (broadcast or
    shuffled, AQE's call), verdicts fold in an aggregate."""
    members, blm = built
    build_plan = (bloom_build(_strs(spark, members), "v",
                              m_bits=1 << 14, k=7)
                  ._jdf.queryExecution().executedPlan().toString())
    assert build_plan.count("Exchange") == 1
    probe_plan = (bloom_probe(_strs(spark, members)
                              .withColumn("key", F.col("v")),
                              blm, "v", key_cols=("key",),
                              m_bits=1 << 14, k=7)
                  ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in probe_plan
    assert "Cartesian" not in probe_plan


def test_bloom_probe_non_broadcast_join_path(spark):
    """VERDICT r5 #5: the probe must stay correct when the filter
    does NOT broadcast. Force the shuffled path by dropping
    autoBroadcastJoinThreshold to -1 (cheaper than building 2^33
    bits; the join strategy, not the filter size, is what the
    default-path tests never exercise) and pin (a) the plan shows a
    non-broadcast equi-join on word_idx and (b) verdicts are
    byte-identical to the broadcast path."""
    members = [f"member-{i}" for i in range(300)]
    probes = members[:50] + [f"absent-{i}" for i in range(200)]
    pdf = _strs(spark, probes).withColumn("key", F.col("v"))
    blm = bloom_build(_strs(spark, members), "v", m_bits=1 << 14, k=7)
    blm.persist().count()

    ref = bloom_probe(pdf, blm, "v", key_cols=("key",),
                      m_bits=1 << 14, k=7).toPandas() \
        .sort_values("key").reset_index(drop=True)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probed = bloom_probe(pdf, blm, "v", key_cols=("key",),
                             m_bits=1 << 14, k=7)
        got = probed.toPandas().sort_values("key").reset_index(drop=True)
        plan = probed._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    assert "BroadcastHashJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    assert "word_idx" in plan
    assert ref.equals(got)
    # and the guarantee that matters survives the strategy change
    flagged = dict(zip(got["key"], got["maybe_in_ref"]))
    assert all(flagged[m] for m in members[:50])
    blm.unpersist()
