"""X33 sequence packing unit pins (miekki/packing.py).

The driver key `seq_pack` cross-checks full per-row outputs against
the DuckDB twin at sf0.01; these tests pin the SPEC on hand-computed
corpora (offsets, boundary straddles, the zero-token pin, the
conservation invariant) plus the one-shuffle plan shape.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from miekki.packing import pack_stats, seq_pack, seq_pack_duck_sql

# (doc_id, n_tok) — exercises: exact-fit doc, straddler, zero-token,
# multi-sequence giant, tiny docs
DOCS = [(1, 10), (2, 0), (3, 5), (4, 17), (5, 7), (6, 8)]
L = 8


def _packed(spark, n_buckets=1):
    df = spark.createDataFrame(DOCS, ["doc_id", "n_tok"])
    return seq_pack(df, seq_len=L, n_buckets=n_buckets,
                    bucket_col=F.lit(0) if n_buckets == 1 else None,
                    rank_col=F.col("doc_id"))


def test_hand_computed_single_bucket(spark):
    # order by doc_id: cum = 0,10,10,15,32,39
    rows = {r["doc_id"]: r for r in _packed(spark).collect()}
    assert (rows[1]["start_off"], rows[1]["seq_first"],
            rows[1]["seq_last"], rows[1]["n_seqs"]) == (0, 0, 1, 2)
    assert rows[2]["n_seqs"] == 0 and rows[2]["seq_first"] == 1
    assert (rows[3]["start_off"], rows[3]["seq_first"],
            rows[3]["seq_last"]) == (2, 1, 1)
    # doc 4: cum=15, tokens 15..31 -> seqs 1..3
    assert (rows[4]["seq_first"], rows[4]["seq_last"],
            rows[4]["n_seqs"]) == (1, 3, 3)
    # doc 6: cum=39, exact 8 tokens 39..46 -> seqs 4..5
    assert (rows[6]["start_off"], rows[6]["seq_first"],
            rows[6]["seq_last"]) == (7, 4, 5)


def test_conservation_invariant(spark):
    """Every sequence index in [0, ceil(total/L)) is touched and the
    token positions partition exactly (concat-and-chunk wastes only
    the final partial sequence)."""
    rows = _packed(spark).collect()
    total = sum(t for _, t in DOCS)
    covered = set()
    positions = []
    cum_check = 0
    for r in sorted(rows, key=lambda r: (r["seq_first"] * L
                                         + r["start_off"])):
        if r["n_tok"] == 0:
            continue
        start = r["seq_first"] * L + r["start_off"]
        assert start == cum_check          # exact concatenation
        cum_check += r["n_tok"]
        positions.append((start, start + r["n_tok"]))
        covered.update(range(r["seq_first"], r["seq_last"] + 1))
    assert cum_check == total
    assert covered == set(range((total + L - 1) // L))


def test_pack_stats(spark):
    st = pack_stats(_packed(spark), seq_len=L).collect()
    assert len(st) == 1
    s = st[0]
    total = sum(t for _, t in DOCS)
    assert s["n_docs"] == len(DOCS) and s["n_tokens"] == total
    assert s["n_seqs"] == (total + L - 1) // L
    assert s["fill"] == round(total / (s["n_seqs"] * L), 4)


def test_duckdb_twin_parity(spark):
    rows = [(i, (i * 37) % 23) for i in range(200)]   # incl. zeros
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    out = sorted(seq_pack(
        df, seq_len=16, n_buckets=8,
        bucket_col=F.expr("pmod(pmod(doc_id, 1000003) * 2654435761, 8)"),
        rank_col=F.expr(
            "pmod(pmod(doc_id, 1000003) * 48271, 2147483648)")
    ).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, n_tok BIGINT)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    duck = sorted(con.sql(seq_pack_duck_sql(
        "SELECT doc_id, n_tok FROM d", seq_len=16,
        n_buckets=8)).fetchall())
    assert [tuple(r) for r in out] == duck


def test_one_shuffle_plan(spark):
    """Exactly one Exchange (hashpartitioning on bucket) and one
    running-sum Window; no extra sort-shuffle, no UDFs."""
    df = spark.createDataFrame(DOCS, ["doc_id", "n_tok"])
    plan = seq_pack(df, seq_len=L, n_buckets=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "bucket" in plan.split("Exchange hashpartitioning", 1)[1] \
        .split("\n", 1)[0]
    assert "Window" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_deterministic_under_repartition(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "n_tok"])
    a = sorted(seq_pack(df, seq_len=L, n_buckets=4).collect())
    b = sorted(seq_pack(df.repartition(7), seq_len=L,
                        n_buckets=4).collect())
    assert a == b


def test_pack_stats_all_zero_token_bucket(spark):
    """A bucket holding only zero-token docs produces 0 sequences and
    a PINNED fill of 1.0 — never NULL from 0/0 division."""
    df = spark.createDataFrame([(1, 0), (2, 0)], ["doc_id", "n_tok"])
    st = pack_stats(seq_pack(df, seq_len=L, n_buckets=1,
                             bucket_col=F.lit(0)), seq_len=L).collect()
    assert len(st) == 1
    assert st[0]["n_seqs"] == 0 and st[0]["fill"] == 1.0


def test_seq_index_exact_past_double_precision(spark):
    """seq_first/seq_last use integer DIV, not double /: at cum just
    past 2^53 (representable in long, not in double) the quotient must
    stay exact. float(2^53 + 1) rounds to 2^53, so double division by 3
    loses the final sequence index (ADVICE r4)."""
    big = (1 << 53) + 1
    df = spark.createDataFrame([(1, big), (2, 5)], ["doc_id", "n_tok"])
    rows = {r["doc_id"]: r for r in
            seq_pack(df, seq_len=3, n_buckets=1, bucket_col=F.lit(0),
                     rank_col=F.col("doc_id")).collect()}
    assert rows[2]["seq_first"] == big // 3          # exact integer //
    assert rows[1]["seq_last"] == (big - 1) // 3


# ---------------- token-space pieces (pack_pieces) ----------------

TOK_ROWS = [(i, [f"t{i}_{j}" for j in range(0, (i * 37) % 53)])
            for i in range(60)]          # sizes 0..52 incl. empties
PL = 16


def _pieces(spark):
    from miekki.packing import pack_pieces

    df = spark.createDataFrame(TOK_ROWS, "doc_id long, tokens array<string>")
    return pack_pieces(
        df, seq_len=PL, n_buckets=4,
        bucket_col=F.expr("pmod(pmod(doc_id, 1000003) * 2654435761, 4)"),
        rank_col=F.expr("pmod(pmod(doc_id, 1000003) * 48271, 2147483648)"))


def test_pieces_conservation_per_doc(spark):
    """sum(n_piece) per doc = n_tok, and concatenating a doc's pieces
    in seq order reproduces its token array exactly."""
    rows = _pieces(spark).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    toks = dict(TOK_ROWS)
    for doc_id, tok in toks.items():
        got = sorted(by_doc.get(doc_id, []), key=lambda r: r["seq"])
        assert sum(r["n_piece"] for r in got) == len(tok)
        assert [t for r in got for t in r["piece"]] == tok
        if not tok:
            assert got == []          # zero-token docs emit no pieces


def test_pieces_tile_sequences(spark):
    """Within (bucket, seq) the pieces tile [0, seq_len) exactly once
    — except each bucket's final partial sequence, which tiles
    [0, total mod seq_len)."""
    rows = _pieces(spark).collect()
    by_seq, bucket_tot = {}, {}
    for r in rows:
        by_seq.setdefault((r["bucket"], r["seq"]), []).append(r)
        bucket_tot[r["bucket"]] = bucket_tot.get(r["bucket"], 0) + r["n_piece"]
    for (b, s), ps in by_seq.items():
        ps.sort(key=lambda r: r["seq_off"])
        pos = 0
        for p in ps:
            assert p["seq_off"] == pos, (b, s, p)
            pos += p["n_piece"]
        last = (bucket_tot[b] - 1) // PL
        assert pos == (PL if s < last else bucket_tot[b] - last * PL)


def test_pieces_one_shuffle_plan(spark):
    """pack_pieces keeps seq_pack's single-Exchange shape: the token
    array rides the bucket shuffle, the explode is map-only after."""
    plan = _pieces(spark)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pieces_duckdb_twin_parity(spark):
    import pandas as pd

    from miekki.packing import pack_pieces_duck_sql

    got = (_pieces(spark)
           .withColumn("piece", F.concat_ws(" ", "piece"))
           .toPandas().sort_values(["doc_id", "seq"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("d", pd.DataFrame(TOK_ROWS, columns=["doc_id", "toks"]))
    duck = (con.sql(pack_pieces_duck_sql(
        "SELECT doc_id, toks FROM d", seq_len=PL, n_buckets=4)).df()
        .sort_values(["doc_id", "seq"]).reset_index(drop=True))
    cols = sorted(got.columns)
    assert sorted(duck.columns) == cols
    assert got[cols].astype(str).equals(duck[cols].astype(str))
