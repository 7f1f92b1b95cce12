"""spark-submit CLI surface (miekki/cli.py): the filter subcommand
writes verdicts + kept corpus consistently. The run/ingest paths are
covered by test_resume.py / test_pipeline.py through the same
pipeline.run they delegate to; here the subject is the CLI wiring
itself (arg parsing, catalog table names, summary JSON).
"""

import json

import pytest

from miekki.catalog import HadoopCatalog
from miekki.cli import main


@pytest.fixture(scope="module")
def filter_catalog_root(spark, corpus_df, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli_catalog"))
    cat = HadoopCatalog(spark, root)
    cat.overwrite("corpus", corpus_df, run_id="ingest")
    return root


def test_cli_filter_consistent(spark, corpus_df, filter_catalog_root,
                               capsys):
    main(["filter", "--catalog-root", filter_catalog_root,
          "--run-id", "f1", "--langs", "en"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    n_corpus = corpus_df.count()
    assert out["n_docs"] == n_corpus
    dropped = sum(out["dropped_by_reason"].values())
    assert out["n_kept"] + dropped == n_corpus
    # every reason string is a comma-join of known check names
    known = {"quality", "lang", "pii", "repetition"}
    for reasons in out["dropped_by_reason"]:
        assert reasons and set(reasons.split(",")) <= known

    cat = HadoopCatalog(spark, filter_catalog_root)
    v = cat.read("filter_verdicts")
    assert v.count() == n_corpus
    kept = cat.read("corpus_kept")
    assert kept.count() == out["n_kept"]
    # kept table preserves the corpus schema (no doc_id leftover)
    assert sorted(kept.columns) == sorted(corpus_df.columns)


def test_cli_curate_funnel(spark, corpus_df, tmp_path_factory, capsys):
    """curate composes filter → dedup+tiers → cluster cap → mix →
    split into one auditable funnel; every count in the summary must
    be reproducible from the catalog tables it cites."""
    root = str(tmp_path_factory.mktemp("cli_curate"))
    cat = HadoopCatalog(spark, root)
    cat.overwrite("corpus", corpus_df.limit(400), run_id="ingest")

    main(["curate", "--catalog-root", root, "--run-id", "c1",
          "--langs", "en,fr,es,zh,de", "--cluster-cap", "2",
          "--mix", "en=0.5", "--default-rate", "1.0",
          "--splits", "train=0.8,val=0.1,test=0.1", "--emit-lm",
          "--emit-dsir", "--emit-pack", "--seq-len", "256",
          "--emit-chunks", "--chunk-len", "128", "--chunk-stride", "96",
          "--emit-semdedup", "--semdedup-cells", "4",
          "--emit-shards", "--n-shards", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    f = out["funnel"]
    assert f["input"] == 400
    assert f["input"] >= f["after_filter"] >= f["after_cap"] \
        >= f["curated"] > 0
    assert f["after_dedup"] == f["after_filter"]   # dedup labels, not drops
    assert sum(out["by_split"].values()) == f["curated"]
    assert sum(out["by_tier"].values()) == f["curated"]
    # ALL THREE splits must be populated: mix_sample and split_assign
    # hash the same url, and before the domain-tagged ranks a mix
    # rate r < 0.99 kept only buckets inside the train range —
    # silently EMPTYING val/test (the eval-contamination failure the
    # split operator exists to prevent). `<=` would mask it.
    assert set(out["by_split"]) == {"train", "val", "test"}

    # --emit-lm: one X30 score row per INPUT doc (pre-filter, so
    # dropped docs keep their score for the audit), sane spec pins
    lm = cat.read("doc_lm").toPandas()
    assert len(lm) == f["input"]
    assert sorted(lm.columns) == sorted(
        ["doc_id", "n_tok", "n_oov", "mean_logp", "ppl", "lm_bucket"])
    assert (lm["mean_logp"] <= 0).all() and (lm["ppl"] >= 1).all()

    # --emit-dsir: one X32 importance-weight row per INPUT doc;
    # key = logw + gumbel noise, kept consistent with the threshold
    ds = cat.read("doc_dsir").toPandas()
    assert len(ds) == f["input"]
    assert sorted(ds.columns) == sorted(
        ["doc_id", "n_feat", "logw", "g", "key", "kept"])
    assert (ds["kept"] == (ds["key"] >= 0.0)).all()

    # --emit-pack: one X33 packing row per CURATED doc; spans cover
    # the summary's sequence count exactly
    pk = cat.read("doc_pack").toPandas()
    assert len(pk) == f["curated"]
    assert out["pack"]["seq_len"] == 256
    assert out["pack"]["n_tokens"] == pk["n_tok"].sum()
    assert (pk["seq_last"] >= pk["seq_first"]).all()

    # --emit-chunks: every CURATED doc appears, every chunk within
    # the length bound, count matches the summary
    ck = cat.read("doc_chunks").toPandas()
    assert out["chunks"]["n_chunks"] == len(ck)
    cur_ids = {r["doc_id"] for r in
               cat.read("curated").select("doc_id").collect()}
    assert set(ck["doc_id"]) == cur_ids
    assert (ck["n_chars"] <= 128).all()

    # --emit-semdedup: one X31 verdict row per CURATED doc; dup count
    # matches the summary; flags are boolean-sane
    sd = cat.read("doc_semdedup").toPandas()
    assert len(sd) == f["curated"]
    assert out["semdedup"]["n_docs"] == f["curated"]
    assert out["semdedup"]["n_semantic_dups"] == int(
        sd["is_semantic_dup"].sum())
    assert set(sd["doc_id"]) == cur_ids

    # --emit-shards: one X39 row per curated TRAIN doc; shard range
    # and per-shard pos contiguity hold after the catalog round-trip
    sh = cat.read("doc_shards").toPandas()
    assert len(sh) == out["by_split"]["train"]
    assert out["shards"]["n_shards"] == 4
    assert set(sh["shard"]) <= set(range(4))
    assert out["shards"]["max_docs"] == sh.groupby("shard").size().max()
    for _, grp in sh.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(len(grp)))

    cur = cat.read("curated").toPandas()
    assert len(cur) == f["curated"]
    assert sorted(cur.columns) == sorted(
        ["doc_id", "url", "warc_ts", "text", "lang", "cluster_id",
         "tier", "split"])
    # cluster cap honored end-to-end
    assert cur.groupby("cluster_id").size().max() <= 2
    # mixture: en survivors at most ~half of en cap-survivors
    labels = cat.read("cluster_labels")
    norm = cat.read("docs_norm").select("doc_id", "lang")
    from miekki.tiers import cluster_cap
    n_en_cap = (cluster_cap(labels.select("doc_id", "cluster_id"), k=2)
                .join(norm, "doc_id").where("lang = 'en'").count())
    n_en_cur = int((cur["lang"] == "en").sum())
    assert n_en_cur < n_en_cap


def test_cli_curate_soft_alpha(spark, corpus_df, tmp_path_factory,
                               capsys):
    """--soft-alpha swaps the hard cluster cap for X40 soft dedup:
    the survivor set must be exactly soft_dedup's kept set over the
    persisted cluster_labels, every cluster keeps >= 1 doc, and the
    summary records the retention mode."""
    from pyspark.sql import functions as F

    from miekki.tiers import soft_dedup

    root = str(tmp_path_factory.mktemp("cli_soft"))
    cat = HadoopCatalog(spark, root)
    cat.overwrite("corpus", corpus_df.limit(400), run_id="ingest")

    main(["curate", "--catalog-root", root, "--run-id", "s1",
          "--langs", "en,fr,es,zh,de", "--soft-alpha", "0.5",
          "--mix", "en=1.0", "--default-rate", "1.0",
          "--splits", "train=1.0"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["retention"] == "soft:0.5"
    f = out["funnel"]
    assert f["input"] == 400 and f["curated"] > 0

    labels = cat.read("cluster_labels").select("doc_id", "cluster_id")
    expect = (soft_dedup(labels, alpha=0.5).where(F.col("kept"))
              .select("doc_id").toPandas())
    cur = cat.read("curated").toPandas()
    assert f["after_cap"] == len(expect)
    assert set(cur["doc_id"]) <= set(expect["doc_id"])
    # every dup cluster retains >= 1 survivor (the min-rank guarantee)
    n_clusters = labels.select("cluster_id").distinct().count()
    kept_clusters = (cat.read("cluster_labels")
                     .join(spark.createDataFrame(expect), "doc_id",
                           "left_semi")
                     .select("cluster_id").distinct().count())
    assert kept_clusters == n_clusters


def test_cli_stats_sketch_report(spark, corpus_df, filter_catalog_root,
                                 capsys):
    """stats writes the three sketch-family tables and a summary whose
    numbers are consistent with the corpus: vocab estimates within the
    HLL tolerance of the exact per-lang counts, every length-quantile
    interval containing its exact rank statistic, top-token head
    matching the exact vocabulary count."""
    from pyspark.sql import functions as F

    from miekki.sketches import hll_rel_err
    from miekki.stages.normalize import norm_text_col

    main(["stats", "--catalog-root", filter_catalog_root,
          "--run-id", "st1", "--topk", "20"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    cat = HadoopCatalog(spark, filter_catalog_root)
    docs = (corpus_df
            .select("lang", norm_text_col("text").alias("norm")))
    toks = (docs.select("lang", F.explode(F.split("norm", " "))
                        .alias("token"))
            .where(F.col("token") != ""))
    exact_vocab = {r["lang"]: r["n"] for r in
                   toks.groupBy("lang")
                   .agg(F.count_distinct("token").alias("n")).collect()}
    tol = 5 * hll_rel_err(12)
    for lang, est in out["vocab_est_by_lang"].items():
        assert abs(est / exact_vocab[lang] - 1.0) <= tol, lang

    # every quantile interval contains the exact rank statistic
    lens = cat.read("stats_len_quantiles").collect()
    by_lang = {}
    for r in docs.select("lang", F.length("norm").alias("x")).collect():
        by_lang.setdefault(r["lang"], []).append(r["x"])
    for r in lens:
        xs = sorted(by_lang[r["lang"]])
        assert r["n_vals"] == len(xs)
        exact = xs[r["r"] - 1]
        assert r["lo"] <= exact <= r["hi"], r

    # top-token head: n is the true corpus count
    counts = {r["token"]: r["n"] for r in
              toks.groupBy("token")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert out["top_tokens_head"]
    for token, n in out["top_tokens_head"]:
        assert counts[token] == n


def test_cli_curate_url_dedup_stage(spark, corpus_df, tmp_path_factory,
                                    capsys):
    """--url-dedup collapses re-crawls before the filter battery: a
    tracking-param recrawl with truncated text loses to the original
    capture, the funnel's input is pages (not captures), and the
    audit tables agree with the summary."""
    from pyspark.sql import functions as F

    root = str(tmp_path_factory.mktemp("cli_urldedup"))
    cat = HadoopCatalog(spark, root)
    base = corpus_df.limit(120)
    recrawl = (base.limit(40)
               .withColumn("url", F.concat(
                   F.col("url"), F.lit("?utm_src=recrawl&fbclid=z")))
               .withColumn("text", F.expr("substring(text, 1, 10)")))
    cat.overwrite("corpus", base.unionByName(recrawl), run_id="ingest")

    main(["curate", "--catalog-root", root, "--run-id", "u1",
          "--url-dedup", "--langs", "en,fr,es,zh,de",
          "--mix", "en=1.0", "--default-rate", "1.0",
          "--splits", "train=1.0"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert out["url_dedup"] == {"captures": 160, "pages_kept": 120}
    assert out["funnel"]["input"] == 120
    kept = cat.read("corpus_url_kept")
    assert kept.count() == 120
    # every winner is the ORIGINAL (longer) capture — no kept url
    # carries the recrawl marker
    assert kept.where(F.col("url").contains("recrawl")).count() == 0
    v = cat.read("url_verdicts")
    assert v.count() == 160
    assert v.where("kept").count() == 120


def test_cli_cross_verdicts(spark, corpus_df, tmp_path_factory, capsys):
    """cross flags B docs that near-duplicate the --ref corpus: a B
    table of verbatim copies + fresh docs produces exactly the copy
    count as n_flagged."""
    from pyspark.sql import functions as F

    root = str(tmp_path_factory.mktemp("cli_cross"))
    cat = HadoopCatalog(spark, root)
    ref = corpus_df.limit(100)
    cat.overwrite("ref_corpus", ref, run_id="ingest")
    copies = (ref.limit(30)
              .withColumn("url", F.concat(F.lit("https://b.example/"),
                                          F.col("url"))))
    fresh = (ref.limit(30)
             .withColumn("url", F.concat(F.lit("https://n.example/"),
                                         F.col("url")))
             .withColumn("text", F.md5(F.col("text").cast("binary"))))
    cat.overwrite("corpus", copies.unionByName(fresh), run_id="ingest")

    main(["cross", "--catalog-root", root, "--run-id", "x1",
          "--ref", "ref_corpus"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_docs"] == 60
    assert out["n_flagged"] == 30
    v = cat.read("cross_verdicts")
    assert v.count() == 60
    assert v.where("flagged").count() == 30


def test_cli_curate_split_by_cluster_zero_leakage(spark, corpus_df,
                                                  tmp_path_factory,
                                                  capsys):
    """--split-by cluster: no dup cluster straddles splits in the
    curated output."""
    from pyspark.sql import functions as F

    from miekki.webstats import split_leakage

    root = str(tmp_path_factory.mktemp("cli_splitby"))
    cat = HadoopCatalog(spark, root)
    cat.overwrite("corpus", corpus_df.limit(300), run_id="ingest")

    main(["curate", "--catalog-root", root, "--run-id", "sb1",
          "--langs", "en,fr,es,zh,de", "--split-by", "cluster",
          "--cluster-cap", "99", "--mix", "en=1.0",
          "--default-rate", "1.0",
          "--splits", "train=0.6,val=0.2,test=0.2"])
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    cur = cat.read("curated").select("doc_id", "cluster_id", "split")
    audit = split_leakage(cur).toPandas()
    assert not audit["leaky"].any()


def test_cli_curate_url_dedup_identical_raw_urls(spark, corpus_df,
                                                 tmp_path_factory, capsys):
    """Recrawls appended with the IDENTICAL raw url string share one
    doc_id = hash(url), so the winners semi-join alone cannot separate
    them (ADVICE r5 high): the pre-collapse must keep exactly the
    richest capture per url, pages_kept must count pages, and no
    truncated loser may survive into the funnel input."""
    from pyspark.sql import functions as F

    root = str(tmp_path_factory.mktemp("cli_urldedup_ident"))
    cat = HadoopCatalog(spark, root)
    base = corpus_df.limit(120)
    # 30 exact-url recrawls with truncated text (losers) — same url
    # string, so every one hashes to the winner's doc_id
    recrawl = (base.limit(30)
               .withColumn("text", F.expr("substring(text, 1, 10)")))
    cat.overwrite("corpus", base.unionByName(recrawl), run_id="ingest")

    main(["curate", "--catalog-root", root, "--run-id", "u2",
          "--url-dedup", "--langs", "en,fr,es,zh,de",
          "--mix", "en=1.0", "--default-rate", "1.0",
          "--splits", "train=1.0"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert out["url_dedup"] == {"captures": 150, "pages_kept": 120}
    kept = cat.read("corpus_url_kept")
    assert kept.count() == 120
    # the surviving capture per duplicated url is the FULL-length one
    assert kept.where(F.length("text") <= 10).count() == 0
    # verdicts run over the collapsed captures: one row per page,
    # exactly one winner each
    v = cat.read("url_verdicts")
    assert v.count() == 120
    assert v.where("kept").count() == 120
