"""spark-submit entry point (SURVEY.md §3.3; BASELINE.json north_rule
"run via spark-submit --py-files").

  spark-submit --py-files miekki.zip miekki/cli.py run \
      --catalog-root /data/miekki --corpus corpus --run-id R1
  spark-submit ... miekki/cli.py run --catalog iceberg \
      --namespace warehouse.dedup --corpus db.corpus --run-id R1
  python -m miekki.cli ingest --sf-dir /root/testdata/sf0.1 \
      --catalog-root /tmp/cat          # sandbox: fixture corpus → catalog
  python scripts/bench_scaling.py      # local[N] vs local[4N] protocol

On a real cluster the session comes from spark-submit's conf; locally
build_spark supplies local[N] defaults.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _get_spark(args):
    from miekki.session import build_spark

    return build_spark(master=args.master, app_name="miekki-cli",
                       shuffle_partitions=args.shuffle_partitions,
                       extra_conf={"spark.ui.showConsoleProgress": "false"})


def _get_catalog(spark, args):
    from miekki.catalog import HadoopCatalog, IcebergCatalog

    if args.catalog == "iceberg":
        return IcebergCatalog(spark, args.namespace)
    return HadoopCatalog(spark, args.catalog_root)


def cmd_ingest(args):
    """Sandbox helper: synthesize the fixture corpus from an sf dir
    and register it as the catalog's `corpus` table."""
    from miekki.fixtures import write_fixture

    spark = _get_spark(args)
    cat = _get_catalog(spark, args)
    paths = write_fixture(args.sf_dir, args.catalog_root + "/_fixture_src")
    df = spark.read.parquet(paths["corpus"])
    if args.partitions:
        df = df.repartition(args.partitions)
    cat.overwrite("corpus", df, run_id="ingest")
    print(json.dumps({"ingested": cat.read("corpus").count()}))


def cmd_run(args):
    from miekki.config import DedupConfig
    from miekki.pipeline import run

    spark = _get_spark(args)
    cat = _get_catalog(spark, args)
    cfg = DedupConfig()
    t0 = time.time()
    res = run(spark, cat, cfg, run_id=args.run_id,
              corpus_table=args.corpus,
              check_invariant=args.check_invariant,
              emit_tiers=args.emit_tiers)
    out = {
        "run_id": args.run_id,
        "n_docs": res["n_docs"],
        "executed": res["executed"],
        "skipped": res["skipped"],
        "wall_sec": round(time.time() - t0, 2),
        "config_hash": cfg.config_hash()[:12],
    }
    if args.emit_tiers:
        from pyspark.sql import functions as F

        out["tier_histogram"] = {      # ≤5-row aggregate, safe collect
            r["tier"]: r["n"] for r in
            cat.read("doc_tiers").groupBy("tier")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    print(json.dumps(out))


def cmd_filter(args):
    """Run the web-corpus filter battery (X24) over the catalog's
    corpus table: writes `filter_verdicts` (doc_id, keep, reasons —
    the Dolma-style tagger output; nothing is dropped silently) and
    `corpus_kept` (the surviving corpus rows, a left-semi join
    against the persisted verdicts so the battery computes once).
    Map-only except the semi join; reason histogram is a ≤2^4-row
    aggregate, safe to collect."""
    from pyspark.sql import functions as F

    from miekki.config import DedupConfig
    from miekki.exprs import doc_id_sql
    from miekki.stages.normalize import normalize
    from miekki.webstats import filter_battery

    spark = _get_spark(args)
    cat = _get_catalog(spark, args)
    cfg = DedupConfig()
    corpus = cat.read(args.corpus)
    docs = normalize(corpus, cfg)
    langs = tuple(s for s in args.langs.split(",") if s)
    verdicts = filter_battery(docs, norm_col="norm_text",
                              allowed_langs=langs)
    cat.overwrite("filter_verdicts", verdicts, run_id=args.run_id)

    v = cat.read("filter_verdicts")
    kept_ids = v.where(F.col("keep")).select("doc_id")
    kept = (corpus
            .withColumn("doc_id", F.expr(doc_id_sql("url", cfg)))
            .join(kept_ids, "doc_id", "left_semi")
            .drop("doc_id"))
    cat.overwrite("corpus_kept", kept, run_id=args.run_id)

    hist = {r["reasons"]: r["n"] for r in
            (v.where(~F.col("keep"))
             .groupBy("reasons").agg(F.count(F.lit(1)).alias("n"))
             .collect())}
    print(json.dumps({
        "run_id": args.run_id,
        "n_docs": v.count(),
        "n_kept": cat.read("corpus_kept").count(),
        "dropped_by_reason": hist,
    }))


def main(argv=None):
    p = argparse.ArgumentParser(prog="miekki")
    sub = p.add_subparsers(dest="cmd", required=True)
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--master", default=None)
    common.add_argument("--shuffle-partitions", type=int, default=None)
    common.add_argument("--catalog", choices=["hadoop", "iceberg"],
                        default="hadoop")
    common.add_argument("--catalog-root", default="/tmp/miekki_catalog")
    common.add_argument("--namespace", default="miekki")

    pi = sub.add_parser("ingest", parents=[common])
    pi.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    pi.add_argument("--partitions", type=int, default=96)
    pi.set_defaults(fn=cmd_ingest)

    pr = sub.add_parser("run", parents=[common])
    pr.add_argument("--run-id", default="run0")
    pr.add_argument("--corpus", default="corpus")
    pr.add_argument("--check-invariant", action="store_true")
    pr.add_argument("--emit-tiers", action="store_true",
                    help="also materialize the X27 doc_tiers table")
    pr.set_defaults(fn=cmd_run)

    pf = sub.add_parser("filter", parents=[common])
    pf.add_argument("--run-id", default="filter0")
    pf.add_argument("--corpus", default="corpus")
    pf.add_argument("--langs", default="en",
                    help="comma-separated language allowlist")
    pf.set_defaults(fn=cmd_filter)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
