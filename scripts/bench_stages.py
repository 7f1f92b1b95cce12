"""Per-stage Amdahl decomposition of the dedup pipeline (VERDICT r1
next-round #6: "publish the Amdahl decomposition (per-stage wall at
local[N] vs local[4N]) so the miss is explained by measurement").

Times each pipeline stage in isolation (inputs localCheckpoint-ed so
a stage's wall measures only its own compute + shuffles) at ONE
parallelism level; run it twice at the two levels the scaling
protocol uses and diff the walls to see which stage stops scaling.

Usage:
  SPARK_GRAFT_CPUS=4  MIEKKI_BENCH_MULT=32 python scripts/bench_stages.py
  SPARK_GRAFT_CPUS=16 MIEKKI_BENCH_MULT=32 python scripts/bench_stages.py

Prints one JSON line: {"cpus": N, "stages": {name: sec, ...},
"total": sec, "docs": D}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    mult = int(os.environ.get("MIEKKI_BENCH_MULT", "32"))

    from bench import prepare_corpus
    from miekki.config import DedupConfig
    from miekki.session import build_spark
    from miekki.stages.canonical import select_canonical
    from miekki.stages.cc import cc_labels
    from miekki.stages.lsh import minhash_candidate_edges
    from miekki.stages.normalize import normalize
    from miekki.stages.signatures import signatures_from_text
    from miekki.stages.simhash import simhash_candidate_edges
    from miekki.stages.substr import substr_candidate_edges
    from miekki.stages.verify import verify_edges

    corpus_path, n_docs = prepare_corpus(sf_dir, mult,
                                         os.path.join(REPO, ".cache"))
    cfg = DedupConfig()
    master = os.environ.get("MIEKKI_MASTER", f"local[{cpus}]")
    spark = build_spark(master=master, app_name="miekki-stages",
                        extra_conf={"spark.ui.showConsoleProgress": "false"})
    n_parts = int(os.environ.get("MIEKKI_BENCH_PARTITIONS", "96"))
    corpus = (spark.read.parquet(corpus_path).repartition(n_parts)
              .localCheckpoint())
    corpus.count()

    # warm python workers / codegen on a small slice (protocol excludes
    # process-spawn costs; workers are long-lived on a real cluster)
    from miekki.pipeline import dedup_labels
    dedup_labels(corpus.limit(256), cfg).count()

    walls: dict[str, float] = {}

    def _steal():
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])  # steal jiffies

    def _load():
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])

    rep_walls: dict[str, list[float]] = {}

    def _timed(name, fn):
        l0, s0, t0 = _load(), _steal(), time.time()
        out = fn()
        dt = round(time.time() - t0, 2)
        # steal% = other tenants on the physical host during this stage
        steal_pct = (100 * (_steal() - s0) / os.sysconf("SC_CLK_TCK")
                     / max(dt, 1e-9) / os.cpu_count())
        print(f"  {name}: {dt}s (load {l0:.1f}->{_load():.1f},"
              f" steal {steal_pct:.1f}%)", file=sys.stderr, flush=True)
        return out, dt

    def timed(name, fn):
        out, dt = _timed(name, fn)
        walls[name] = dt
        return out

    # MIEKKI_STAGE_REPS > 1 re-times each stage: the stage's JSON
    # entry is min-of-reps (tenant noise swings single timings 2-3x;
    # the minimum is the honest wall), all rep timings are reported
    # under "stage_reps", and 'total' sums each stage ONCE so it
    # remains the min-of-reps pipeline wall (ADVICE r2)
    reps = int(os.environ.get("MIEKKI_STAGE_REPS", "1"))

    def timed_reps(name, fn):
        out, dt = _timed(name, fn)
        times = [dt]
        for i in range(reps - 1):
            _, dt2 = _timed(f"{name} (rep {i + 2})", fn)
            times.append(dt2)
        walls[name] = min(times)
        if reps > 1:
            rep_walls[name] = times
        return out

    only = set(filter(None, os.environ.get(
        "MIEKKI_STAGE_ONLY", "").split(",")))

    def want(name):
        return not only or name in only

    docs = timed("normalize",
                 lambda: normalize(corpus, cfg).localCheckpoint())
    sigs = timed("signatures",
                 lambda: signatures_from_text(docs, cfg).localCheckpoint())
    cand = timed_reps("lsh_star_edges",
                      lambda: minhash_candidate_edges(sigs, cfg).localCheckpoint())
    edges_mh = timed_reps("verify_estj",
                          lambda: verify_edges(cand, sigs, cfg).localCheckpoint())
    if want("simhash_pass"):
        edges_sh = timed_reps("simhash_pass",
                              lambda: simhash_candidate_edges(sigs, cfg).localCheckpoint())
    else:
        edges_sh = None
    if want("substr_pass"):
        edges_ss = timed_reps("substr_pass",
                              lambda: substr_candidate_edges(docs, cfg).localCheckpoint())
    else:
        edges_ss = None
    pairs = edges_mh
    for e in (edges_sh, edges_ss):
        if e is not None:
            pairs = pairs.unionByName(e)
    pairs = pairs.select("src", "dst").dropDuplicates(["src", "dst"])
    pairs = timed("edge_union", lambda: pairs.localCheckpoint())
    labels = timed_reps("cc", lambda: cc_labels(
        pairs, docs.select("doc_id")).localCheckpoint())
    meta = docs.select("doc_id", "url").join(
        corpus.select("url", "warc_ts"), "url")
    timed("canonical", lambda: select_canonical(labels, meta).count())

    spark.stop()
    print(json.dumps({"cpus": int(cpus), "mult": mult, "docs": n_docs,
                      "stages": walls, "stage_reps": rep_walls,
                      "total": round(sum(walls.values()), 2)}))


if __name__ == "__main__":
    main()
