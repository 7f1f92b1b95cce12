"""Spark stage output vs the pure-Python oracle, bit-for-bit
(SURVEY.md §5.1): normalize, shingles, signatures, band hashes —
on real fixture-corpus texts (en/fr/es/zh/de)."""

import numpy as np
from pyspark.sql import functions as F

from miekki.config import DedupConfig
from miekki.stages.lsh import band_table
from miekki.stages.normalize import normalize, with_shingles
from miekki.stages.signatures import compute_signatures
from oracle import sketches
from oracle.xxh64 import spark_xxhash64
from miekki.textproc import normalize_text

CFG = DedupConfig()


def _sample(corpus_pdf, n=40):
    """Deterministic stratified sample: first n//5 urls per lang."""
    out = []
    for lang, grp in corpus_pdf.groupby("lang"):
        out.extend(grp.url.head(n // 5).tolist())
    return out


def test_normalize_matches_oracle(spark, corpus_df, fixture_corpus):
    corpus_pdf, _, _ = fixture_corpus
    urls = _sample(corpus_pdf)
    rows = (normalize(corpus_df.where(corpus_df.url.isin(urls)), CFG)
            .select("url", "doc_id", "norm_text").collect())
    assert len(rows) == len(urls)
    by_url = corpus_pdf.set_index("url").text
    for r in rows:
        assert r.doc_id == spark_xxhash64(r.url)
        assert r.norm_text == normalize_text(by_url[r.url]), r.url


def test_shingles_match_oracle(spark, corpus_df, fixture_corpus):
    corpus_pdf, _, _ = fixture_corpus
    urls = _sample(corpus_pdf)
    df = with_shingles(normalize(corpus_df.where(corpus_df.url.isin(urls)), CFG), CFG)
    by_url = corpus_pdf.set_index("url").text
    for r in df.select("url", "shingles", "n_shingles").collect():
        expect = sketches.shingle_hashes(by_url[r.url], CFG)
        assert sorted(set(r.shingles)) == expect, r.url
        assert r.n_shingles == len(set(r.shingles))


def test_signatures_match_oracle(spark, corpus_df, fixture_corpus):
    corpus_pdf, _, _ = fixture_corpus
    urls = _sample(corpus_pdf, n=20)
    ws = with_shingles(normalize(corpus_df.where(corpus_df.url.isin(urls)), CFG), CFG)
    sigs = {r.doc_id: r for r in compute_signatures(ws, CFG).collect()}
    by_url = corpus_pdf.set_index("url").text
    for url in urls:
        did = spark_xxhash64(url)
        hashes = sketches.shingle_hashes(by_url[url], CFG)
        assert list(sketches.minhash_signature(hashes, CFG)) == list(sigs[did].minhash)
        assert sketches.simhash_fingerprint(hashes, CFG) == sigs[did].simhash


def test_band_hashes_match_oracle(spark, corpus_df, fixture_corpus):
    corpus_pdf, _, _ = fixture_corpus
    urls = _sample(corpus_pdf, n=10)
    ws = with_shingles(normalize(corpus_df.where(corpus_df.url.isin(urls)), CFG), CFG)
    sigs = compute_signatures(ws, CFG).localCheckpoint()
    bands = band_table(sigs, CFG)
    got = {}
    for r in bands.collect():
        got.setdefault(r.doc_id, []).append((r.band_id, r.band_hash))
        assert 0 <= r.salt < CFG.salt_buckets
    sig_rows = {r.doc_id: np.array(r.minhash) for r in sigs.collect()}
    for did, pairs in got.items():
        expect = sketches.band_hashes(sig_rows[did], CFG)
        assert sorted(pairs) == sorted(expect)


def test_fused_kernel_parity(spark, corpus_df):
    """signatures_from_text (fused numpy shingle+sketch kernel) is
    bit-exact with the SQL-shingling + Arrow-sketch reference path on
    the whole fixture corpus plus adversarial rows (CJK, emoji,
    accents, empty, NULL, shorter-than-k)."""
    from miekki.stages.normalize import normalize, with_shingles
    from miekki.stages.signatures import (compute_signatures,
                                          signatures_from_text)

    extra = spark.createDataFrame(
        [("x1", "中文测试文档内容很长的一段话测试"),
         ("x2", "emoji 🎉🎊 test 🚀 mixed"),
         ("x3", "héllo wörld àccents"),
         ("x4", ""), ("x5", None), ("x6", "ab"),
         ("x7", "aaaaaaaaaaaaaaaa")],
        "url string, text string") \
        .withColumn("warc_ts", F.current_timestamp()) \
        .withColumn("lang", F.lit("en")) \
        .withColumn("html", F.encode(F.coalesce("text", F.lit("")), "utf-8"))
    corpus = corpus_df.unionByName(extra, allowMissingColumns=True)
    docs = normalize(corpus, CFG).localCheckpoint()

    ws = with_shingles(docs, CFG)
    ref = compute_signatures(ws, CFG).join(
        ws.select("doc_id", "n_shingles"), "doc_id").toPandas() \
        .set_index("doc_id").sort_index()
    got = signatures_from_text(docs, CFG).toPandas() \
        .set_index("doc_id").sort_index()
    assert list(ref.index) == list(got.index)
    assert (ref.simhash == got.simhash).all()
    assert (ref.n_shingles == got.n_shingles).all()
    for did in ref.index:
        assert list(ref.loc[did].minhash) == list(got.loc[did].minhash), did


def test_nfc_sample_guard(spark):
    """SURVEY.md §2.1: non-NFC input must fail fast (sampled check),
    not silently break oracle byte-parity."""
    import unicodedata

    import pytest

    from miekki.stages.normalize import assert_nfc_sample

    good = spark.createDataFrame([("café très bien",), (None,)],
                                 "text string")
    assert assert_nfc_sample(good) == 1
    nfd = unicodedata.normalize("NFD", "café très bien")
    bad = spark.createDataFrame([(nfd,)], "text string")
    with pytest.raises(ValueError, match="not NFC"):
        assert_nfc_sample(bad)


# ---------------------------------------------------------------------
# X41 — LSH parameter planner
# ---------------------------------------------------------------------

def test_lsh_plan_matches_numpy_scurve(spark):
    """Every (b, r) split of n_perm is present, masses match a numpy
    recompute of the MMDS S-curve to 6 dp, and `chosen` is the
    fp+fn argmin with the smaller-b tie-break."""
    import numpy as np

    from miekki.stages.lsh import lsh_plan

    n_perm, thr, steps = 64, 0.5, 50
    out = lsh_plan(spark, n_perm=n_perm, threshold=thr,
                   s_steps=steps).toPandas().sort_values("b")
    divisors = [b for b in range(1, n_perm + 1) if n_perm % b == 0]
    assert list(out["b"]) == divisors
    assert (out["b"] * out["r"] == n_perm).all()

    s = np.arange(1, steps) / steps
    best, best_key = None, None
    for _, row in out.iterrows():
        q = (1.0 - s ** row["r"]) ** row["b"]
        fp = np.mean((1.0 - q)[s < thr])
        fn = np.mean(q[s >= thr])
        assert abs(round(fp, 6) - row["fp_mass"]) <= 1e-6, row["b"]
        assert abs(round(fn, 6) - row["fn_mass"]) <= 1e-6, row["b"]
        key = (fp + fn, row["b"])
        if best_key is None or key < best_key:
            best, best_key = row["b"], key
    chosen = out[out["chosen"]]
    assert len(chosen) == 1
    assert chosen.iloc[0]["b"] == best


def test_lsh_plan_tracks_threshold(spark):
    """The chosen split follows the classic heuristic — the S-curve
    midpoint (1/b)^(1/r) sits near the verify threshold — and moves
    monotonically with it: raising the threshold never INCREASES the
    band count (higher thresholds want longer bands / steeper
    curves). Pins chosen b for three thresholds of the production
    128-perm signature."""
    from miekki.stages.lsh import lsh_plan

    chosen = {}
    for thr in (0.5, 0.7, 0.85):
        out = lsh_plan(spark, n_perm=128, threshold=thr).toPandas()
        row = out[out["chosen"]].iloc[0]
        chosen[thr] = int(row["b"])
        midpoint = (1.0 / row["b"]) ** (1.0 / row["r"])
        assert abs(midpoint - thr) < 0.25, (thr, midpoint)
    assert chosen == {0.5: 32, 0.7: 16, 0.85: 8}


def test_lsh_plan_no_window(spark):
    """lsh_plan's chosen flag comes from a 1-row min-struct broadcast,
    never a single-partition row_number window (VERDICT r5 wrong #2)."""
    from miekki.stages.lsh import lsh_plan

    plan = (lsh_plan(spark)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
