"""Spark stage output vs the pure-Python oracle, bit-for-bit
(SURVEY.md §5.1): normalize, shingles, signatures, band hashes —
on real fixture-corpus texts (en/fr/es/zh/de)."""

import numpy as np

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
