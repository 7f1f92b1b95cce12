"""O15–O18 — connected components via large-star/small-star
alternation (Kiveris et al., SoCC 2014; mandated by BASELINE.json
north_star), expressed as DataFrame self-joins — the candidate-pair
"graph" is just a table (SURVEY.md §1.1/§2.7).

Per-iteration ``localCheckpoint()`` truncates lineage: without it the
Catalyst plan doubles per round and analysis time explodes. Labels are
deterministic: cluster_id = min (signed int64) doc_id in the
component — partitioning-invariant by construction.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Observation, Window, functions as F

log = logging.getLogger(__name__)

# rounds-to-convergence of the last cc_fixpoint call (ROADMAP r1 #2:
# instrument the fixpoint; observed 2-7 on real corpora — grows
# O(log max-component-diameter), so 10^12-doc boilerplate clusters
# still converge in ~10 rounds once star edges shorten the paths)
LAST_ROUNDS: int | None = None


def _symmetrize(edges: DataFrame) -> DataFrame:
    fwd = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    rev = edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    return fwd.unionByName(rev).where("u != v")


def large_star(edges: DataFrame) -> DataFrame:
    """∀u: connect strictly-larger neighbors to m = min(Γ(u) ∪ {u})."""
    sym = _symmetrize(edges)
    mins = (sym.groupBy("u").agg(F.min("v").alias("mn"))
               .select("u", F.least("mn", "u").alias("m")))
    return (sym.join(mins, "u")
               .where(F.col("v") > F.col("u"))
               .select(F.col("v").alias("src"), F.col("m").alias("dst"))
               .where("src != dst")
               .distinct())


def small_star(edges: DataFrame) -> DataFrame:
    """∀u: connect smaller-or-equal neighbors (and u) to the min."""
    e = (edges.select(F.greatest("src", "dst").alias("u"),
                      F.least("src", "dst").alias("v"))
              .where("u != v").distinct())
    mins = e.groupBy("u").agg(F.min("v").alias("mn"))
    j = e.join(mins, "u")
    out1 = j.select(F.col("v").alias("src"), F.col("mn").alias("dst"))
    out2 = mins.select(F.col("u").alias("src"), F.col("mn").alias("dst"))
    return out1.unionByName(out2).where("src != dst").distinct()


def fused_star_round(edges: DataFrame) -> DataFrame:
    """One large-star + small-star round in THREE exchanges (r4,
    VERDICT r3 next-step #5; the groupBy+join formulation above costs
    ~8 shuffle stages per round and CC latency is pure round-trip
    count). Each star's per-node minimum comes from ONE window pass:
    over Window.partitionBy(node).orderBy(nbr), first(nbr) IS the
    neighborhood minimum, and row_number marks one row per node for
    small-star's (u, mn) emission — so large-star is a single
    Exchange+Sort, small-star a second (its key is the other endpoint,
    so a shuffle between them is unavoidable — the stars group by
    different nodes), and the round-end distinct the third. Emits the
    exact same edge SET as small_star(large_star(e)) for max-first
    distinct input (parity pinned in tests/test_cc.py); intermediate
    duplicate (v, m) rows across groups are tolerated — they cannot
    change a min — and collapse in the final distinct. Window memory
    is one node's neighborhood, same bound as the groupBy it replaces;
    hot nodes shrink to O(1) rows after their first round (every
    neighbor re-points to the min), so no salting is needed here."""
    sym = _symmetrize(edges)
    wl = Window.partitionBy("u").orderBy("v")
    large = (sym.withColumn("m", F.least(F.first("v").over(wl), F.col("u")))
             .where(F.col("v") > F.col("u"))
             .select(F.col("v").alias("u"), F.col("m").alias("v")))
    ws = Window.partitionBy("u").orderBy("v")
    s = (large.withColumn("mn", F.first("v").over(ws))
         .withColumn("rn", F.row_number().over(ws)))
    # both small-star outputs in ONE projection (explode of a 2-slot
    # struct array), NOT a union of two filters over `s`: a union
    # duplicates the whole window subtree per branch and Catalyst's
    # per-branch column pruning then makes the two S-window exchanges
    # non-identical, so even AQE exchange reuse executed 4 shuffles
    # (measured; the plan-level test pins the fixed shape at 3)
    member = F.when(F.col("v") != F.col("mn"),
                    F.struct(F.col("v").alias("src"),
                             F.col("mn").alias("dst")))
    head = F.when(F.col("rn") == 1,
                  F.struct(F.col("u").alias("src"),
                           F.col("mn").alias("dst")))
    return (s.select(F.explode(F.array(member, head)).alias("e"))
            .where(F.col("e").isNotNull())
            .select("e.src", "e.dst").distinct())


_STAT_EXPRS = lambda: (F.count(F.lit(1)).alias("n"),  # noqa: E731
                       F.bit_xor(F.xxhash64("src", "dst")).alias("h"))


def _ckpt_with_stats(edges: DataFrame):
    """localCheckpoint + convergence fingerprint in ONE job (r3,
    VERDICT r2 next-step #4): an Observation rides the checkpoint's
    materialization action, so the former per-round stats agg — a
    full extra job over the edge table, ~half the CC fixed latency —
    disappears. Fingerprint = (count, order-insensitive xxhash64
    bit_xor): count alone can collide across rounds (SURVEY.md §2.7;
    bit_xor instead of sum — ANSI mode forbids wrapping long sums)."""
    obs = Observation()
    out = edges.observe(obs, *_STAT_EXPRS()).localCheckpoint()
    m = obs.get
    return out, (m["n"], m["h"])


def cc_fixpoint(edges: DataFrame, max_iter: int = 64) -> DataFrame:
    """Alternate large/small star to fixpoint; returns star edges
    (node → component-min)."""
    # materialize the input edge set once — every star round reads it
    # twice (groupBy + join back); without this the whole upstream
    # pipeline would re-execute per use (SURVEY.md §4.2)
    global LAST_ROUNDS
    e, prev = _ckpt_with_stats(
        edges.select("src", "dst").where("src != dst").distinct())
    if prev[0] == 0:
        LAST_ROUNDS = 0
        return e
    # Adaptive partition count for the round loop: each round is ~8
    # shuffle stages and the edge table shrinks fast, so running 6
    # rounds at the global partition count (sized for the band table)
    # is thousands of near-empty tasks — pure scheduler latency, the
    # serial fraction that caps scaling efficiency. ~2M edges per
    # partition keeps tasks meaningful at any scale (10^12-doc runs
    # still get tens of thousands of partitions).
    spark = e.sparkSession
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    cc_parts = max(16, min(int(old_parts), prev[0] // 2_000_000 + 16))
    spark.conf.set("spark.sql.shuffle.partitions", str(cc_parts))
    try:
        for i in range(max_iter):
            e, cur = _ckpt_with_stats(fused_star_round(e))
            if cur == prev:
                LAST_ROUNDS = i + 1
                log.info("cc_fixpoint converged in %d rounds (%d edges)",
                         i + 1, cur[0])
                return e
            prev = cur
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    raise RuntimeError(f"CC did not converge in {max_iter} iterations")


def cc_labels(edges: DataFrame, nodes: DataFrame,
              node_col: str = "doc_id") -> DataFrame:
    """(src, dst) edges + node table → T5 labels (doc_id, cluster_id).

    Isolated nodes become singleton clusters labeled by themselves."""
    star = cc_fixpoint(edges)
    lab = star.groupBy(F.col("src").alias(node_col)).agg(
        F.min("dst").alias("cluster_id"))
    return (nodes.select(node_col).distinct()
            .join(lab, node_col, "left")
            .withColumn("cluster_id",
                        F.coalesce("cluster_id", F.col(node_col))))
