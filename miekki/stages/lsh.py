"""O8/O9/O10 — LSH band hashing + salted star-edge extraction.

Hot-bucket skew (boilerplate pages collapse millions of docs into one
band bucket) is defused two ways (SURVEY.md §2.4, mandated by
BASELINE.json north_star "salted repartition-by-band"):

1. NEVER all-pairs: per bucket emit star edges (bucket_min, doc) —
   |bucket|-1 edges; connectivity (hence clusters) is preserved
   exactly.
2. Two-level salted aggregation: level 1 groups by
   (band_id, band_hash, salt) — max group ~ bucket/S; level 2 joins
   the S salt-mins per bucket to the global bucket min — max group S.

AQE's skew handling covers joins, not groupBy/window — hence the
manual salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from miekki.config import DedupConfig
from miekki.exprs import hash_multi_sql


def band_table(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """T2 → T3 (doc_id, band_id, band_hash, salt).

    band_hash = hash(band_id, sig[r*b], ..., sig[r*b+r-1]) — computed
    inside one JVM transform+posexplode, no Python."""
    r = cfg.rows_per_band
    h = hash_multi_sql(
        ["cast(b as bigint)"] + [f"minhash[b*{r}+{j}]" for j in range(r)], cfg
    )
    bands = F.expr(f"transform(sequence(0, {cfg.bands - 1}), b -> {h})")
    out = signatures.select("doc_id", F.posexplode(bands).alias("band_id", "band_hash"))
    # salt is a pure function of doc_id: it only partitions work,
    # never changes cluster output (SURVEY.md §2.4)
    return out.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(cfg.salt_buckets)).cast("int")
    )


def star_edges(bucketed: DataFrame, key_cols: list[str], cfg: DedupConfig,
               id_col: str = "doc_id", salt_col: str = "salt") -> DataFrame:
    """Generic two-level salted bucket→edges operator (reused by the
    MinHash band pass and the exact-substring fingerprint pass).

    Emits (src, dst) with src = bucket minimum < dst; linear in bucket
    size, bounded reducer groups at both levels. groupBy+collect_list
    rather than a window: hash aggregation with map-side partials and
    NO per-partition sort (a window would sort the whole band table);
    list size is bounded by the salt (<= bucket/S) at level 1 and by
    S at level 2 (SURVEY.md §2.4).

    Recall caveat (ADVICE r1): star edges preserve connectivity of the
    UNVERIFIED candidate graph exactly, but downstream est_J
    verification compares each member only against the bucket minimum
    — if a low-similarity doc happens to be the minimum of a band
    bucket, true pairs inside that bucket can be dropped. With b=32
    bands the probability a dup pair shares NO bucket with a
    same-cluster minimum is negligible (each band re-draws the
    minimum), so the default stays star-only; recall-critical runs set
    cfg.lsh_chain > 0 to add bounded successor-chain pairs per salted
    bucket (the scheme simhash/substr already use)."""
    lvl1 = (bucketed.groupBy(*key_cols, salt_col)
            .agg(F.min(id_col).alias("m1"),
                 F.collect_list(id_col).alias("ds")))
    edges1 = (lvl1.select("m1", F.explode("ds").alias("dst"))
                  .where(F.col("dst") != F.col("m1"))
                  .select(F.col("m1").alias("src"), "dst"))
    lvl2 = (lvl1.groupBy(*key_cols)
            .agg(F.min("m1").alias("m2"), F.collect_list("m1").alias("ms")))
    edges2 = (lvl2.select("m2", F.explode("ms").alias("dst"))
                  .where(F.col("dst") != F.col("m2"))
                  .select(F.col("m2").alias("src"), "dst"))
    return edges1.unionByName(edges2).dropDuplicates(["src", "dst"])


def chain_pairs(bucketed: DataFrame, key_cols: list[str], successors: int,
                id_col: str = "doc_id") -> DataFrame:
    """Each bucket member paired with its <= ``successors`` id-order
    successors — linear in bucket size, per-GROUP array sort only (no
    whole-table sort shuffle)."""
    pairs = F.expr(
        "flatten(transform(ds, (x, i) ->"
        f" transform(slice(ds, i + 2, {successors}),"
        "  y -> struct(x AS src, y AS dst))))")
    return (bucketed.groupBy(*key_cols)
            .agg(F.sort_array(F.collect_list(id_col)).alias("ds"))
            .select(F.explode(pairs).alias("p"))
            .select("p.src", "p.dst"))


def minhash_candidate_edges(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """T2 → candidate (src, dst) edges from LSH band collisions."""
    bands = band_table(signatures, cfg)
    edges = star_edges(bands, ["band_id", "band_hash"], cfg)
    if cfg.lsh_chain > 0:
        chains = chain_pairs(bands, ["band_id", "band_hash", "salt"],
                             cfg.lsh_chain)
        edges = edges.unionByName(chains).dropDuplicates(["src", "dst"])
    return edges
