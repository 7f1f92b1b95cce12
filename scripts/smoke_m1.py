"""M1 smoke: full mini-pipeline on sf0.001 vs the pure-Python oracle.

Checks, per SURVEY.md §5:
  - Spark shingle hashes == oracle shingle hashes (set equality/doc)
  - Spark minhash/simhash == oracle bit-for-bit (sample)
  - Spark cluster labels == networkx oracle labels over the SAME
    verified edge set, and vs truth families (recall)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from miekki.config import DedupConfig
from miekki.fixtures import make_corpus
from miekki.session import build_spark
from miekki.pipeline import dedup_labels, candidate_edges
from miekki.stages.normalize import normalize, with_shingles
from miekki.stages.signatures import compute_signatures
from oracle import sketches
from oracle.cc import cc_labels as oracle_cc
from oracle.xxh64 import spark_xxhash64

cfg = DedupConfig()
t0 = time.time()
docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
corpus_pdf, truth_pairs, truth_clusters = make_corpus(docs)
print(f"fixture: {len(corpus_pdf)} docs  ({time.time()-t0:.1f}s)")

spark = build_spark(master="local[8]", app_name="smoke_m1")
corpus = spark.createDataFrame(corpus_pdf[["url", "warc_ts", "text", "lang"]])

# --- kernel parity on a sample -------------------------------------
dn = normalize(corpus, cfg)
ws = with_shingles(dn, cfg)
sample = ws.select("doc_id", "url", "norm_text", "shingles").limit(20).collect()
sigs_sample = (compute_signatures(ws, cfg)
               .join(ws.select("doc_id"), "doc_id").limit(0))  # noqa - just types
bad = 0
for r in sample:
    otext_row = corpus_pdf[corpus_pdf.url == r.url].iloc[0]
    oh = sketches.shingle_hashes(otext_row.text, cfg)
    if sorted(set(r.shingles)) != oh:
        print("SHINGLE MISMATCH", r.url); bad += 1
print(f"shingles parity on 20 docs: {'OK' if not bad else 'FAIL'}")

sig_rows = compute_signatures(ws, cfg).limit(0)
sig_sample = (compute_signatures(ws.where(F_urls := ws.doc_id.isin([r.doc_id for r in sample[:10]])), cfg)
              .collect())
by_id = {r.doc_id: r for r in sig_sample}
for r in sample[:10]:
    otext_row = corpus_pdf[corpus_pdf.url == r.url].iloc[0]
    oh = sketches.shingle_hashes(otext_row.text, cfg)
    osig = sketches.minhash_signature(oh, cfg)
    ofp = sketches.simhash_fingerprint(oh, cfg)
    s = by_id[r.doc_id]
    if list(osig) != list(s.minhash) or ofp != s.simhash:
        print("SIG MISMATCH", r.url,
              "mh", list(osig)[:3], list(s.minhash)[:3], "fp", ofp, s.simhash)
        bad += 1
print(f"minhash/simhash parity on 10 docs: {'OK' if not bad else 'FAIL'}")

# --- end-to-end ------------------------------------------------------
t1 = time.time()
labels = dedup_labels(corpus, cfg).cache()
lab_pdf = labels.toPandas()
print(f"pipeline: {len(lab_pdf)} labels, {lab_pdf.cluster_id.nunique()} clusters "
      f"({time.time()-t1:.1f}s)")

# oracle CC over the SAME verified edge set dedup_labels uses
# (minhash ∪ simhash ∪ substr — the substr union was missing here,
# which mis-read every substr-only merge as a label mismatch)
from miekki.stages.substr import substr_candidate_edges

sigs = compute_signatures(ws, cfg)
edges_pdf = (candidate_edges(sigs, cfg).select("src", "dst")
             .unionByName(substr_candidate_edges(
                 dn.localCheckpoint(), cfg).select("src", "dst"))
             .toPandas())
all_ids = [spark_xxhash64(u) for u in corpus_pdf.url]
olab = oracle_cc(list(edges_pdf.itertuples(index=False, name=None)), all_ids)
mism = sum(1 for _, r in lab_pdf.iterrows() if olab[r.doc_id] != r.cluster_id)
print(f"label parity vs networkx oracle: {mism} mismatches / {len(lab_pdf)}")

# recall vs planted truth (minhash-reachable kinds, J >= 0.72 gate)
lmap = dict(zip(lab_pdf.doc_id, lab_pdf.cluster_id))
tp = truth_pairs[(truth_pairs.kind != "negative")]
gate = tp[(tp.jaccard >= 0.72)]
hit = sum(lmap[r.src] == lmap[r.dst] for _, r in gate.iterrows())
print(f"recall (J>=0.72 pairs): {hit}/{len(gate)} = {hit/len(gate):.4f}")
for kind, grp in tp.groupby("kind"):
    h = sum(lmap[r.src] == lmap[r.dst] for _, r in grp.iterrows())
    note = ""
    if kind == "contain":
        # contain pairs are dups only when the shared run reaches the
        # pinned L (cfg.substr_len); shorter-run fixtures are planted
        # NON-dups under the spec, so the honest denominator is the
        # catchable subset
        catchable = grp[grp.run_bytes >= cfg.substr_len]
        hc = sum(lmap[r.src] == lmap[r.dst] for _, r in catchable.iterrows())
        note = (f"  (catchable run>=L={cfg.substr_len}:"
                f" {hc}/{len(catchable)})")
    print(f"  {kind:9s}: {h}/{len(grp)}{note}")

spark.stop()
sys.exit(0 if (mism == 0 and bad == 0) else 1)
