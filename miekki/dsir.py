"""X32 — DSIR-style importance resampling (Xie et al., "Data
Selection for Language Models via Importance Resampling", NeurIPS
2023 — the public design this derives from; complements X29's
fixed-rate mixture sampling with a LEARNED per-doc rate).

DSIR selects raw web documents that look like a small TARGET corpus
(e.g. curated encyclopedic text): fit bag-of-hashed-ngram unigram
models p (target) and q (raw), weight each doc by its log importance
ratio log p(x)/q(x), then sample via Gumbel top-k. Everything below
is a pinned, fully-twin-able spec so DuckDB recomputes every value.

Pinned spec (shared by both dialects):
  tokens     = split(norm, ' ') minus empty strings  (same tokenizer
               as X30's LM — one vocabulary convention repo-wide)
  features   = unigrams ++ bigrams ("tok_i tok_{i+1}")
  bucket(f)  = hash(f) mod B                          (B = 8192)
               hash is PLUGGABLE: production xxhash64 (Spark-native,
               64-bit); the driver twin uses the first 8 hex chars of
               md5 — both engines compute md5 identically and the
               selection math under test is hash-agnostic
  p_b        = (c_b^target + 1) / (N_target + B)      (add-one)
  q_b        = (c_b^raw    + 1) / (N_raw    + B)
  w_b        = ln(p_b) - ln(q_b)
  logw(doc)  = round(sum over the doc's features of w_bucket, 4)
               (0.0 for a zero-feature doc — pinned, not NULL)
  g(doc)     = round(-ln(-ln((rank + 0.5) / RANK_BUCKETS)), 4)
               deterministic Gumbel noise from a hash rank in
               [0, RANK_BUCKETS) — reproducible under re-runs,
               appends and repartitioning, unlike rand()
  key        = round(logw + g, 4);  kept = key >= threshold
               (Gumbel top-k == threshold on the Gumbel-perturbed
               log-weight; at 100 TB the cutoff is fit once on a
               sample — exactly like X30's ppl buckets and X26's
               split bounds — so `kept` stays a map-only projection,
               never a global sort)

Scale shape (the part that must survive 1000 executors / 100 TB):
  * featurize: map-only array ops (split / zip-style transform) —
    the corpus is never shuffled to build features.
  * bucket counts: explode -> two-level HashAggregate on an
    ALREADY-HASHED key — Zipfian hot features collapse map-side and
    the output is bounded by B rows regardless of corpus size.
  * weights: a <=B-row full outer join of the two count tables plus
    1-row totals — kilobytes; always broadcastable.
  * scoring: explode -> map-only bucket -> broadcast-hash join
    against the B-row weight table -> ONE groupBy(doc_id) shuffle
    (hash-uniform keys, partial sum collapses map-side). Zero-feature
    docs are restored by a map-only filter + union (the X30 pattern —
    a join-back fill would be a second corpus-wide doc_id shuffle).
  * selection: map-only threshold; never a corpus-wide top-k sort.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

from pyspark.sql import DataFrame, functions as F

# the pinned repo-wide tokenizer — X30's LM, X32, and X33 must share
# one vocabulary convention, so there is exactly one definition
from miekki.lm import _tokens

B_DEFAULT = 8192
RANK_BUCKETS = 10000


def features_col(norm_col) -> F.Column:
    """Unigrams ++ bigrams as one array<string>, map-only.

    r5 perf: bigrams via zip_with over two shifted slices — the
    previous indexed-lambda transform with a per-element element_at
    was the measured-slowest gram formulation (webstats repetition
    breakdown) and blocked codegen for the surrounding projection.
    Values identical: size >= 2 yields exactly the i < size-1 pairs;
    size < 2 yields the same empty array the filtered transform
    produced."""
    toks = _tokens(norm_col)
    m = F.size(toks) - 1
    zipped = F.zip_with(F.slice(toks, 1, m), F.slice(toks, 2, m),
                        lambda a, b: F.concat(a, F.lit(" "), b))
    bigrams = F.when(F.size(toks) >= 2, zipped).otherwise(
        F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def xxhash_bucket(b: int = B_DEFAULT) -> Callable[[F.Column], F.Column]:
    """Production bucket fn: pmod(xxhash64(f), b)."""
    return lambda col: F.pmod(F.xxhash64(col), F.lit(b))


def md5_bucket(b: int = B_DEFAULT) -> Callable[[F.Column], F.Column]:
    """Portable bucket fn for the DuckDB twin: first 8 md5 hex chars
    as an int, mod b — both engines md5 identically."""
    return lambda col: F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(b))


def bucket_counts(docs: DataFrame, b: int = B_DEFAULT,
                  bucket_fn: Callable[[F.Column], F.Column] | None = None,
                  norm_col: str = "norm") -> DataFrame:
    """(bucket, n) over a corpus — explode + partial-agg'd count,
    output bounded by b rows."""
    bucket_fn = bucket_fn or xxhash_bucket(b)
    return (docs
            .select(F.explode(features_col(norm_col)).alias("feat"))
            .select(bucket_fn(F.col("feat")).alias("bucket"))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")))


class DsirWeights(NamedTuple):
    """Fit result: the weight table PLUS the (b, bucket_fn) pair it
    was fit with, carried together so scoring can never silently
    bucket features with a different hash than the fit did (a
    mismatch would score every feature near w_unseen with no
    error)."""
    df: DataFrame
    b: int
    bucket_fn: Callable[[F.Column], F.Column]


def feature_weights(target: DataFrame, raw: DataFrame,
                    b: int = B_DEFAULT,
                    bucket_fn: Callable[[F.Column], F.Column] | None = None,
                    norm_col: str = "norm") -> DsirWeights:
    """Per-bucket importance weights w_b = ln(p_b) - ln(q_b) plus the
    unseen-bucket constant, as a small cached DataFrame (bucket, w,
    w_unseen) bundled with its hash config. Only buckets seen in
    EITHER corpus appear; w_unseen (the c=0/c=0 value) rides every
    row so scoring's left-join misses keep the exact spec value (the
    X30 oov pattern). Corpus totals come from the count tables
    themselves (bucket_counts is exhaustive, so sum(n) == N — no
    second featurization pass over either corpus), and the ≤B-row
    result is cache()d because scoring broadcasts two projections of
    it (the weight join and the w_unseen constant) — without the
    cache the whole fit would execute once per broadcast."""
    bucket_fn = bucket_fn or xxhash_bucket(b)
    ct = bucket_counts(target, b, bucket_fn, norm_col)
    cr = bucket_counts(raw, b, bucket_fn, norm_col)
    nt = ct.agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n_t"))
    nr = cr.agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n_r"))
    joined = (ct.withColumnRenamed("n", "c_t")
              .join(cr.withColumnRenamed("n", "c_r"), "bucket", "full")
              .crossJoin(nt).crossJoin(nr))
    dt = F.col("n_t") + F.lit(b)
    dr = F.col("n_r") + F.lit(b)
    logp = F.log((F.coalesce("c_t", F.lit(0)) + 1) / dt)
    logq = F.log((F.coalesce("c_r", F.lit(0)) + 1) / dr)
    df = joined.select(
        "bucket", (logp - logq).alias("w"),
        (F.log(F.lit(1.0) / dt) - F.log(F.lit(1.0) / dr))
        .alias("w_unseen")).cache()
    return DsirWeights(df, b, bucket_fn)


def default_rank_col() -> F.Column:
    # domain-tagged (see tiers.mix_sample): keeps the Gumbel rank
    # independent of every other hash-rank operator over doc_id
    return F.pmod(F.xxhash64(F.lit("dsir"), F.col("doc_id")),
                  F.lit(RANK_BUCKETS))


def dsir_score(raw: DataFrame, model: DsirWeights,
               threshold: float,
               rank_col: F.Column | None = None,
               norm_col: str = "norm") -> DataFrame:
    """Per-doc (doc_id, n_feat, logw, g, key, kept) — see module doc.
    `kept` is computed, never filtered (X24's never-discard-silently);
    pass the scored frame through `.where("kept")` to materialize the
    selection. The bucket hash comes from the model itself so it can
    never disagree with the fit."""
    weights, bucket_fn = model.df, model.bucket_fn
    rank_col = rank_col if rank_col is not None else default_rank_col()
    w_unseen = weights.select("w_unseen").limit(1)
    feat = raw.select(
        "doc_id", F.explode(features_col(norm_col)).alias("feat"))
    scored = (feat
              .select("doc_id", bucket_fn(F.col("feat")).alias("bucket"))
              .join(F.broadcast(weights.select("bucket", "w")),
                    "bucket", "left")
              .crossJoin(F.broadcast(w_unseen))
              .groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("n_feat"),
                   F.round(F.sum(F.coalesce("w", "w_unseen")), 4)
                   .alias("logw")))
    empties = (raw.where(F.size(features_col(norm_col)) == 0)
               .select("doc_id", F.lit(0).cast("long").alias("n_feat"),
                       F.lit(0.0).alias("logw")))
    out = scored.unionByName(empties)
    # deterministic Gumbel noise from the hash rank; re-attach doc
    # columns map-side? No: rank_col must be computable from doc_id
    # alone (it is, for both the production and portable defaults) so
    # g stays a projection on the aggregated frame — no second join.
    u = (rank_col + 0.5) / F.lit(float(RANK_BUCKETS))
    g = F.round(-F.log(-F.log(u)), 4)
    key = F.round(F.col("logw") + F.col("g"), 4)
    return (out.withColumn("g", g)
            .withColumn("key", key)
            .withColumn("kept", F.col("key") >= F.lit(threshold)))


def dsir_duck_sql(raw_cte: str, target_cte: str, threshold: float,
                  b: int = B_DEFAULT,
                  rank_sql: str = "((doc_id % 10000) + 10000) % 10000"
                  ) -> str:
    """DuckDB twin recomputing identical values with the portable
    md5 bucket (pair with bucket_fn=md5_bucket(b) on the Spark side)
    and a caller-supplied portable rank expression."""
    feats = """
  SELECT doc_id, f FROM (
    SELECT doc_id,
           unnest(list_concat(
             toks,
             [toks[i] || ' ' || toks[i + 1]
              for i in range(1, len(toks))])) AS f
    FROM (SELECT doc_id,
                 list_filter(str_split(norm, ' '), t -> t <> '') AS toks
          FROM {src}))"""
    bucket = ("list_sum([ (strpos('0123456789abcdef', h8[i]) - 1)"
              f" * (16 ** (8 - i)) for i in range(1, 9) ])::BIGINT % {b}")
    return f"""
WITH raw AS ({raw_cte}), target AS ({target_cte}),
rfeat AS ({feats.format(src='raw')}),
tfeat AS ({feats.format(src='target')}),
rb AS (SELECT {bucket} AS bucket FROM
       (SELECT substr(md5(f), 1, 8) AS h8 FROM rfeat)),
tb AS (SELECT {bucket} AS bucket FROM
       (SELECT substr(md5(f), 1, 8) AS h8 FROM tfeat)),
rcnt AS (SELECT bucket, count(*) AS c_r FROM rb GROUP BY bucket),
tcnt AS (SELECT bucket, count(*) AS c_t FROM tb GROUP BY bucket),
tot AS (SELECT (SELECT count(*) FROM tfeat) AS n_t,
               (SELECT count(*) FROM rfeat) AS n_r),
w AS (
  SELECT coalesce(tcnt.bucket, rcnt.bucket) AS bucket,
         ln((coalesce(c_t, 0) + 1) / CAST(n_t + {b} AS DOUBLE))
           - ln((coalesce(c_r, 0) + 1) / CAST(n_r + {b} AS DOUBLE)) AS w,
         ln(1.0 / (n_t + {b})) - ln(1.0 / (n_r + {b})) AS w_unseen
  FROM tcnt FULL JOIN rcnt ON tcnt.bucket = rcnt.bucket
  CROSS JOIN tot),
docfeat AS (
  SELECT doc_id, {bucket} AS bucket FROM
  (SELECT doc_id, substr(md5(f), 1, 8) AS h8 FROM rfeat)),
per_doc AS (
  SELECT d.doc_id, count(*) AS n_feat,
         round(sum(coalesce(w.w, w2.w_unseen)), 4) AS logw
  FROM docfeat d
  LEFT JOIN w ON w.bucket = d.bucket
  CROSS JOIN (SELECT w_unseen FROM w LIMIT 1) w2
  GROUP BY d.doc_id),
filled AS (
  SELECT r.doc_id,
         CAST(coalesce(p.n_feat, 0) AS BIGINT) AS n_feat,
         coalesce(p.logw, 0.0) AS logw
  FROM raw r LEFT JOIN per_doc p ON p.doc_id = r.doc_id),
keyed AS (
  SELECT doc_id, n_feat, logw,
         round(-ln(-ln((({rank_sql}) + 0.5) / 10000.0)), 4) AS g
  FROM filled)
SELECT doc_id, n_feat, logw, g,
       round(logw + g, 4) AS key,
       round(logw + g, 4) >= {threshold} AS kept
FROM keyed
"""
