"""Per-stage wall profiler at a given parallelism.

Usage: python scripts/profile_stages.py [cores=32] [mult=8] [shuffle=128]
Writes one JSON line. Run at two core counts and diff: stages whose
wall doesn't drop ~4x from 8→32 are latency-bound, not compute-bound —
those are the scaling-efficiency killers.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES = sys.argv[1] if len(sys.argv) > 1 else "32"
MULT = int(sys.argv[2]) if len(sys.argv) > 2 else 8
SHUFFLE = int(sys.argv[3]) if len(sys.argv) > 3 else 128


def main():
    from bench import prepare_corpus
    from miekki.config import DedupConfig
    from miekki.pipeline import candidate_edges
    from miekki.session import build_spark
    from miekki.stages.cc import cc_labels
    from miekki.stages.lsh import minhash_candidate_edges
    from miekki.stages.normalize import normalize
    from miekki.stages.signatures import signatures_from_text
    from miekki.stages.simhash import simhash_candidate_edges
    from miekki.stages.substr import substr_candidate_edges
    from miekki.stages.verify import verify_edges

    cfg = DedupConfig()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path, n_docs = prepare_corpus("/root/testdata/sf0.1", MULT,
                                  os.path.join(repo, ".cache"))
    spark = build_spark(master=f"local[{CORES}]", shuffle_partitions=SHUFFLE,
                        extra_conf={"spark.ui.showConsoleProgress": "false"})
    corpus = spark.read.parquet(path).repartition(96)
    corpus.count()
    corpus = corpus.localCheckpoint()
    res = {"cores": int(CORES), "docs": n_docs, "shuffle": SHUFFLE}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        res[name] = round(time.time() - t0, 2)
        return out

    docs = timed("normalize", lambda: normalize(corpus, cfg).localCheckpoint())
    sigs = timed("signatures_fused", lambda: signatures_from_text(docs, cfg).localCheckpoint())
    cand = timed("lsh_band_star", lambda: minhash_candidate_edges(sigs, cfg).localCheckpoint())
    mh = timed("verify", lambda: verify_edges(cand, sigs, cfg).localCheckpoint())
    sh = timed("simhash", lambda: simhash_candidate_edges(sigs, cfg).localCheckpoint())
    ss = timed("substr", lambda: substr_candidate_edges(docs, cfg).localCheckpoint())
    edges = (mh.unionByName(sh).unionByName(ss)
             .select("src", "dst").distinct().localCheckpoint())
    timed("cc", lambda: cc_labels(edges, docs.select("doc_id")).count())
    res["total"] = round(sum(v for k, v in res.items()
                             if k not in ("cores", "docs", "shuffle")), 2)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
