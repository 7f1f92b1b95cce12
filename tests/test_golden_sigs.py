"""Frozen 50-doc signature golden (FIXTURES.md F3): any change to
shingling/permutation/simhash semantics fails loudly."""

import os

import pandas as pd

from miekki.config import DedupConfig
from miekki.stages.normalize import normalize, with_shingles
from miekki.stages.signatures import compute_signatures

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "minhash_sf0001_sample.parquet")


def test_signature_golden(spark, corpus_df):
    golden = pd.read_parquet(GOLDEN)
    cfg = DedupConfig()
    ws = with_shingles(normalize(corpus_df, cfg), cfg)
    got = (compute_signatures(ws.where(ws.doc_id.isin(golden.doc_id.tolist())), cfg)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    assert len(got) == len(golden)
    for g, w in zip(golden.itertuples(), got.itertuples()):
        assert g.doc_id == w.doc_id
        assert list(g.minhash) == list(w.minhash)
        assert g.simhash == w.simhash
