"""X36 hashed-shingle random-projection text embeddings
(miekki/text_embed.py) + SemDeDup-over-text composition."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from miekki.text_embed import text_embed


@pytest.fixture(scope="module")
def corpus(spark):
    base = ("the quick brown fox jumps over the lazy dog "
            "and keeps jumping over it all day long %d")
    rows = [(i, base % (i // 2)) for i in range(100)]      # exact pairs
    rows += [(500 + i, f"u{i} " + " ".join(
        f"w{(i * 31 + j * 7) % 997}" for j in range(40)))
        for i in range(50)]                                # unrelated
    rows += [(900, ""), (901, ""), (902, None)]            # empties
    return spark.createDataFrame(rows, "doc_id long, norm string")


@pytest.fixture(scope="module")
def vecs(corpus):
    pdf = text_embed(corpus).toPandas()
    return dict(zip(pdf.doc_id, (np.array(v) for v in pdf.vec)))


def test_unit_norm_and_dims(vecs):
    V = np.array(list(vecs.values()))
    assert V.shape[1] == 64
    assert np.allclose(np.linalg.norm(V, axis=1), 1.0)


def test_exact_dups_identical_vectors(vecs):
    for k in range(50):
        assert np.array_equal(vecs[2 * k], vecs[2 * k + 1])


def test_empty_and_null_embed_identically(vecs):
    assert np.array_equal(vecs[900], vecs[901])
    assert np.array_equal(vecs[900], vecs[902])   # NULL ≡ '' (pinned)
    assert not np.isnan(vecs[900]).any()


def test_near_vs_unrelated_separation(vecs):
    near = float(vecs[0] @ vecs[2])        # one token differs
    unrelated = max(float(vecs[500] @ vecs[500 + i]) for i in range(1, 50))
    assert near > 0.9
    assert unrelated < 0.7, unrelated


def test_deterministic_under_repartition(corpus, vecs):
    pdf = text_embed(corpus.repartition(7)).toPandas()
    for d, v in zip(pdf.doc_id, pdf.vec):
        assert np.array_equal(np.array(v), vecs[d])


def test_map_only_plan(corpus):
    plan = (text_embed(corpus)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan


def test_semdedup_over_text_planted(spark, corpus):
    """The X31 composition on TEXT: exact/near planted pairs collapse
    to one survivor; unrelated docs are never flagged."""
    from miekki.semdedup import semantic_dedup

    out = (semantic_dedup(text_embed(corpus), n_cells=4, threshold=0.95,
                          vec_col="vec", id_col="doc_id")
           .toPandas().set_index("doc_id").is_semantic_dup)
    # every exact pair loses at least one member
    assert all(out[2 * k] or out[2 * k + 1] for k in range(50))
    # unrelated docs: zero false dups
    assert not out[[500 + i for i in range(50)]].any()
