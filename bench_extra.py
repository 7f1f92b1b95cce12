"""Per-stage isolation benchmark (optimization round; guide §1).

NOT the frozen driver bench (bench.py). This harness times each
pipeline operator in ISOLATION with the noop sink (guide §1.4) so the
numbers measure computation, not the sink or downstream consumers,
and captures .explain("formatted") for every stage into plans/<tag>/.

Usage:
  python bench_extra.py [--reps N] [--tag r06] [--stages a,b,c]

Prints one JSON line: {"stages": {name: [sec, ...]}, "min": {...}}.
Same corpus/env knobs as bench.py (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
MIEKKI_BENCH_MULT, MIEKKI_BENCH_PARTITIONS).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--tag", default="r06")
    ap.add_argument("--stages", default="")
    ap.add_argument("--explain", action="store_true",
                    help="write plans/<tag>/<stage>.txt explain dumps")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mult = int(os.environ.get("MIEKKI_BENCH_MULT", "16"))
    repo = os.path.dirname(os.path.abspath(__file__))

    from bench import calibration_probe, prepare_corpus
    corpus_path, n_docs = prepare_corpus(sf_dir, mult,
                                         os.path.join(repo, ".cache"))
    calib = calibration_probe()

    from pyspark.sql import functions as F

    from miekki.config import DedupConfig
    from miekki.pipeline import _doc_meta, dedup_labels
    from miekki.session import build_spark
    from miekki.stages.canonical import select_canonical
    from miekki.stages.cc import cc_labels
    from miekki.stages.lsh import band_table, minhash_candidate_edges
    from miekki.stages.normalize import normalize
    from miekki.stages.signatures import signatures_from_text
    from miekki.stages.simhash import simhash_candidate_edges
    from miekki.stages.substr import substr_candidate_edges
    from miekki.stages.substr import anchor_table as _anchor_table
    from miekki.stages.substr import candidate_anchor_pairs as _cand_pairs
    from miekki.stages.verify import verify_edges

    cfg = DedupConfig()
    if int(cpus) > 16:
        os.environ.setdefault("MIEKKI_TASK_CPUS", "2")
    spark = build_spark(master=f"local[{cpus}]", app_name="miekki-bench-extra",
                        extra_conf={"spark.ui.showConsoleProgress": "false"})
    n_parts = int(os.environ.get("MIEKKI_BENCH_PARTITIONS", "96"))
    corpus = spark.read.parquet(corpus_path).repartition(n_parts)
    corpus.count()
    corpus = corpus.localCheckpoint()

    # fixed inputs, materialized once so each timed stage starts from
    # an in-memory frame (isolation: stage cost only)
    docs = normalize(corpus, cfg).localCheckpoint()
    sigs = signatures_from_text(docs, cfg).localCheckpoint()
    bands_ck = band_table(sigs, cfg).localCheckpoint()
    cand_ck = minhash_candidate_edges(sigs, cfg).localCheckpoint()
    from miekki.pipeline import candidate_edges
    edges_all = candidate_edges(sigs, cfg).unionByName(
        substr_candidate_edges(docs, cfg))
    pairs_ck = (edges_all.select("src", "dst")
                .dropDuplicates(["src", "dst"]).localCheckpoint())
    docs_ids = docs.select("doc_id").localCheckpoint()
    labels_ck = cc_labels(pairs_ck, docs_ids).localCheckpoint()

    toks = (docs.select(F.explode(F.split("norm_text", " ")).alias("token"))
            .where(F.col("token") != ""))

    from miekki.sketches import (cms_build, hdr_histogram, hdr_quantiles,
                                 hll_estimate, hll_registers)
    from miekki.webstats import filter_battery

    def stage_frames():
        return {
            "normalize": lambda: normalize(corpus, cfg),
            "signatures": lambda: signatures_from_text(docs, cfg),
            "band_table": lambda: band_table(sigs, cfg),
            "star_edges": lambda: minhash_candidate_edges(sigs, cfg),
            "verify": lambda: verify_edges(cand_ck, sigs, cfg),
            "simhash": lambda: simhash_candidate_edges(sigs, cfg),
            "substr": lambda: substr_candidate_edges(docs, cfg),
            "substr_anchors": lambda: _anchor_table(docs, cfg),
            "substr_pairs": lambda: _cand_pairs(
                _anchor_table(docs, cfg), cfg),
            "cc": lambda: cc_labels(pairs_ck, docs_ids),
            "canonical": lambda: select_canonical(
                labels_ck, _doc_meta(docs, corpus)),
            "filter_battery": lambda: filter_battery(
                docs, norm_col="norm_text"),
            "hll": lambda: hll_estimate(hll_registers(toks, "token")),
            "cms": lambda: cms_build(toks, "token"),
            "hdr": lambda: hdr_quantiles(hdr_histogram(
                docs.select(F.length("norm_text").alias("len")), "len")),
            "e2e": lambda: dedup_labels(corpus, cfg),
            "bpe": lambda: _bpe_frame(),
        }

    _bpe_state: dict = {}

    def _bpe_frame():
        # fit once (driver-side, bounded sample — untimed), tokenize
        # the full widened corpus (the timed part)
        from miekki.bpe import bpe_tokenize, fit_bpe

        if "merges" not in _bpe_state:
            _bpe_state["merges"] = fit_bpe(docs, norm_col="norm_text")
        return bpe_tokenize(docs, _bpe_state["merges"],
                            norm_col="norm_text")

    frames = stage_frames()
    only = [s for s in args.stages.split(",") if s] or list(frames)

    if args.explain:
        pdir = os.path.join(repo, "plans", args.tag)
        os.makedirs(pdir, exist_ok=True)

    out: dict[str, list[float]] = {}
    for name in only:
        fn = frames[name]
        if args.explain:
            with open(os.path.join(pdir, f"{name}.txt"), "w") as f:
                f.write(fn()._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
        walls = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            # cc/e2e count() like bench.py (checkpoint rounds are the
            # cost); everything else noop-sinks (guide 1.4)
            if name in ("cc", "e2e"):
                fn().count()
            else:
                noop(fn())
            walls.append(round(time.time() - t0, 2))
        out[name] = walls
        print(f"## {name}: {walls}", file=sys.stderr)

    spark.stop()
    print(json.dumps({
        "stages": out,
        "min": {k: min(v) for k, v in out.items()},
        "docs": n_docs, "mult": mult, "cpus": int(cpus),
        "calib_sec": calib,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))


if __name__ == "__main__":
    main()
