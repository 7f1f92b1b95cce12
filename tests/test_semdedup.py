"""X31 SemDeDup unit pins (miekki/semdedup.py).

The driver key `semantic_dedup` is a planted-twin contract at sf0.01;
these tests pin the keep-one semantics on crafted clusters and verify
the distributed per-cell pairing against an independent whole-corpus
numpy reimplementation of the pinned spec (order by (cent_cos, id),
dup iff an earlier-ordered same-cell member has cosine >= tau).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from miekki.embeddings import kmeans_centroids
from miekki.semdedup import semantic_dedup

DIM = 8
TAU = 0.95


def _crafted_rows():
    """Two tight clusters + orthogonal scatter (exact basis vectors,
    so scatter cosines are 0 by construction)."""
    rng = np.random.Generator(np.random.PCG64(7))
    rows = []
    for i in range(4):                       # cluster A around e0
        v = np.eye(DIM)[0] + 0.01 * rng.standard_normal(DIM)
        rows.append((i, [float(x) for x in v]))
    for i in range(4, 7):                    # cluster B around e1
        v = np.eye(DIM)[1] + 0.01 * rng.standard_normal(DIM)
        rows.append((i, [float(x) for x in v]))
    for i in range(7, 12):                   # scatter: e2..e6
        rows.append((i, [float(x) for x in np.eye(DIM)[i - 5]]))
    return rows


@pytest.fixture(scope="module")
def crafted(spark):
    rows = _crafted_rows()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]) \
              .withColumn("embedding",
                          F.col("embedding").cast("array<float>"))
    out = semantic_dedup(df, n_cells=4, threshold=TAU)
    return rows, df, sorted(out.collect())


def test_rows_preserved_and_keep_one(crafted):
    rows, _, out = crafted
    assert len(out) == len(rows)
    assert sorted(r["vec_id"] for r in out) == [r[0] for r in rows]
    by_id = {r["vec_id"]: r for r in out}
    # each tight cluster keeps exactly one survivor...
    for members in (range(4), range(4, 7)):
        flags = [by_id[i]["is_semantic_dup"] for i in members]
        assert flags.count(False) == 1 and flags.count(True) == len(flags) - 1
    # ...and the orthogonal scatter is never flagged
    assert not any(by_id[i]["is_semantic_dup"] for i in range(7, 12))


def test_matches_numpy_reference(crafted, spark):
    """Distributed flags == a from-scratch single-matrix numpy
    implementation of the pinned spec (same centroids — the quantizer
    is deterministic driver-side numpy by construction)."""
    rows, df, out = crafted
    cents = kmeans_centroids(df, 4)
    m = np.array([r[1] for r in rows], dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ cents.T
    cell = sims.argmax(axis=1)
    cent_cos = sims[np.arange(len(m)), cell]
    ids = np.array([r[0] for r in rows])
    expect = {}
    for c in set(cell):
        idx = np.where(cell == c)[0]
        order = idx[np.lexsort((ids[idx], cent_cos[idx]))]
        for pos, gi in enumerate(order):
            earlier = order[:pos]
            expect[int(ids[gi])] = bool(
                len(earlier) and (m[earlier] @ m[gi] >= TAU).any())
    got = {r["vec_id"]: r["is_semantic_dup"] for r in out}
    assert got == expect


def test_deterministic(crafted, spark):
    rows, df, out = crafted
    again = sorted(semantic_dedup(df, n_cells=4, threshold=TAU).collect())
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


def test_blocked_gram_matches_unblocked(spark):
    """The block-streamed prefix gram (memory bound at scale) must
    equal the naive whole-matrix pairing — exercised with a corpus
    larger than the block size via the block parameter."""
    rng = np.random.Generator(np.random.PCG64(11))
    base = rng.standard_normal((30, DIM))
    rows = [(i, [float(x) for x in base[i % 10] + 0.001 * rng.standard_normal(DIM)])
            for i in range(30)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]) \
              .withColumn("embedding",
                          F.col("embedding").cast("array<float>"))
    blocked = sorted(semantic_dedup(df, n_cells=2, threshold=TAU,
                                    block=4).collect())
    plain = sorted(semantic_dedup(df, n_cells=2, threshold=TAU).collect())
    assert [tuple(r) for r in blocked] == [tuple(r) for r in plain]
    # 10 base directions x 3 copies: at least one dup must exist
    assert any(r["is_semantic_dup"] for r in blocked)
