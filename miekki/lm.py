"""X30 — unigram language-model scoring (CCNet-style perplexity
quality signal; Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", 2020 — the public design
this derives from; CCNet uses a KenLM 5-gram, we pin a unigram LM so
the whole model fits in one broadcast and a DuckDB twin can recompute
every value bit-for-bit).

Model (pinned spec, shared by both dialects):
  tokens        = split(norm, ' ') minus empty strings
  N             = total token count over the corpus
  vocab         = top-V tokens by (count DESC, token ASC)      (V=4096)
  logp(tok)     = ln((c_tok + 1) / (N + V + 1))   for tok in vocab
  logp(OOV)     = ln(1 / (N + V + 1))             (add-one smoothing)
  mean_logp     = round(avg(logp(tok)) over the doc, 4)   (0.0 if no
                  tokens — pinned, not NULL)
  ppl           = round(exp(-mean_logp), 2)  — computed from the
                  ROUNDED mean in BOTH engines so float formatting
                  can't diverge on the exp
  lm_bucket     = 'head' | 'middle' | 'tail' by FIXED ppl thresholds
                  (CCNet buckets by perplexity terciles; a global
                  ntile is a single-reducer sort at corpus scale, so
                  the pinned spec uses constants — at 100 TB you'd
                  fit the two cutoffs once on a sample and pass them
                  in, exactly like these defaults)

Scale shape (the part that must survive 1000 executors / 100 TB):
  * vocab fit: explode → groupBy(token).count() — the built-in
    two-level HashAggregate partial-aggregates map-side, so Zipfian
    hot tokens ("the") collapse before the shuffle; top-V compiles to
    TakeOrderedAndProject (per-partition heaps, never a vocab sort).
  * N: map-only agg of size(filter(split(...))) per doc — the corpus
    is NOT exploded a second time and never shuffled for the total.
  * scoring: explode → broadcast-hash join against the V-row model
    (V=4096..65536 ≈ a few MB — always broadcastable) → one
    groupBy(doc_id) shuffle. doc_id keys are hash-uniform, partial
    avg/count collapse map-side: no skew at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

V_DEFAULT = 4096
# fixed ppl cutoffs for the head/middle/tail buckets (see module doc)
PPL_HEAD = 2000.0
PPL_MIDDLE = 10000.0


def _c(col):
    return F.col(col) if isinstance(col, str) else col


def _tokens(norm_col) -> F.Column:
    """THE repo-wide tokenizer (X30/X32/X33 share it — one vocabulary
    convention). NULL norm is pinned ≡ empty string: without the
    coalesce a NULL row would vanish from scoring entirely (explode
    drops it AND size(NULL) is NULL under ANSI, so the empty-doc
    restore filter would miss it too), silently breaking the
    never-discard contract and diverging from the DuckDB twins,
    which restore NULL-norm docs via their left join from docs."""
    return F.filter(
        F.split(F.coalesce(_c(norm_col), F.lit("")), " "),
        lambda t: t != "")


def unigram_model(docs_norm: DataFrame, v: int = V_DEFAULT,
                  norm_col: str = "norm") -> DataFrame:
    """(token, logp) for the top-v tokens + the corpus totals needed
    for the OOV probability, as a small broadcastable DataFrame with
    the scalar columns repeated per row: (token, logp, oov_logp)."""
    toks = (docs_norm
            .select(F.explode(_tokens(norm_col)).alias("token")))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    vocab = counts.orderBy(F.desc("n"), F.asc("token")).limit(v)
    # total token count: map-only over docs, no second explode
    totals = docs_norm.agg(
        F.coalesce(F.sum(F.size(_tokens(norm_col))), F.lit(0))
        .alias("n_total"))
    denom = F.col("n_total") + F.lit(v) + F.lit(1)
    return (vocab.crossJoin(totals)   # 1-row totals onto V rows
            .select("token",
                    F.log((F.col("n") + 1) / denom).alias("logp"),
                    F.log(F.lit(1.0) / denom).alias("oov_logp")))


def lm_score(docs_norm: DataFrame, v: int = V_DEFAULT,
             norm_col: str = "norm") -> DataFrame:
    """Per-doc unigram-LM stats: (doc_id, n_tok, n_oov, mean_logp,
    ppl, lm_bucket). See module doc for the pinned spec."""
    # cache(): scoring broadcasts TWO projections of the model (the
    # token join and the 1-row OOV constant) — without the cache the
    # whole corpus-wide vocab fit would execute once per broadcast
    model = unigram_model(docs_norm, v=v, norm_col=norm_col).cache()
    # the OOV constant must survive a non-matching left join, so it
    # rides a 1-row broadcast crossJoin, NOT the model's right side
    # (a left-join miss nulls ALL right-side columns, oov_logp too)
    oov = model.select("oov_logp").limit(1)
    tok = docs_norm.select(
        "doc_id", F.explode(_tokens(norm_col)).alias("token"))
    scored = (tok.join(F.broadcast(model.select("token", "logp")),
                       "token", "left")
              .crossJoin(F.broadcast(oov))
              .select("doc_id",
                      F.coalesce("logp", "oov_logp").alias("lp"),
                      F.col("logp").isNull().cast("int").alias("oov")))
    per_doc = (scored.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_tok"),
                    F.sum("oov").cast("long").alias("n_oov"),
                    F.round(F.avg("lp"), 4).alias("mean_logp")))
    # docs with zero tokens never reach the explode — restore them
    # with the pinned empty-doc row via a MAP-ONLY filter + union
    # (a left-join fill would be a second corpus-wide doc_id shuffle)
    empties = (docs_norm.where(F.size(_tokens(norm_col)) == 0)
               .select("doc_id", F.lit(0).cast("long").alias("n_tok"),
                       F.lit(0).cast("long").alias("n_oov"),
                       F.lit(0.0).alias("mean_logp")))
    out = per_doc.unionByName(empties)
    ppl = F.round(F.exp(-F.col("mean_logp")), 2)
    return (out.withColumn("ppl", ppl)
            .withColumn("lm_bucket",
                        F.when(F.col("ppl") < PPL_HEAD, F.lit("head"))
                        .when(F.col("ppl") < PPL_MIDDLE, F.lit("middle"))
                        .otherwise(F.lit("tail"))))


def lm_score_duck_sql(norm_cte: str, v: int = V_DEFAULT) -> str:
    """DuckDB twin recomputing the identical values (same smoothing,
    same rounding points, same empty-doc pinning)."""
    return f"""
WITH docs AS ({norm_cte}),
toks AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(str_split(norm, ' ')) AS token FROM docs)
  WHERE token <> ''),
totals AS (SELECT count(*) AS n_total FROM toks),
vocab AS (
  SELECT token, count(*) AS n FROM toks GROUP BY token
  ORDER BY n DESC, token LIMIT {v}),
model AS (
  SELECT token,
         ln((n + 1) / CAST(n_total + {v} + 1 AS DOUBLE)) AS logp,
         ln(1.0 / (n_total + {v} + 1)) AS oov_logp
  FROM vocab CROSS JOIN totals),
per_doc AS (
  SELECT t.doc_id,
         count(*) AS n_tok,
         sum(CASE WHEN m.logp IS NULL THEN 1 ELSE 0 END) AS n_oov,
         round(avg(coalesce(m.logp, m2.oov_logp)), 4) AS mean_logp
  FROM toks t
  LEFT JOIN model m ON m.token = t.token
  CROSS JOIN (SELECT oov_logp FROM model LIMIT 1) m2
  GROUP BY t.doc_id),
filled AS (
  SELECT d.doc_id,
         CAST(coalesce(p.n_tok, 0) AS BIGINT) AS n_tok,
         CAST(coalesce(p.n_oov, 0) AS BIGINT) AS n_oov,
         coalesce(p.mean_logp, 0.0) AS mean_logp
  FROM docs d LEFT JOIN per_doc p ON p.doc_id = d.doc_id)
SELECT doc_id, n_tok, n_oov, mean_logp,
       round(exp(-mean_logp), 2) AS ppl,
       CASE WHEN round(exp(-mean_logp), 2) < {PPL_HEAD} THEN 'head'
            WHEN round(exp(-mean_logp), 2) < {PPL_MIDDLE} THEN 'middle'
            ELSE 'tail' END AS lm_bucket
FROM filled
"""
