"""X35 hashed-feature quality classifier (miekki/quality_clf.py):
planted separation, fit determinism, cross-engine fit parity, the
DuckDB score twin, and the broadcast-join/one-shuffle plan shape."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from miekki.quality_clf import (clf_score, fit_quality_clf,
                                fit_triples_duck, md5_bucket,
                                quality_clf_duck_sql)

B = 512


@pytest.fixture(scope="module")
def planted(spark):
    rows = ([(i, "alpha beta gamma delta epsilon common words " * 4)
             for i in range(100)]
            + [(i + 100, "zork quux blarg fnord wibble common words " * 4)
               for i in range(100)])
    return spark.createDataFrame(rows, "doc_id long, norm string")


@pytest.fixture(scope="module")
def planted_model(planted):
    pos = planted.where("doc_id < 100")
    neg = planted.where("doc_id >= 100")
    return fit_quality_clf(pos, neg, b=B, bucket_fn=md5_bucket(B),
                           sample=50)


def test_planted_separation(planted, planted_model):
    """Docs built from the positive vocabulary must score above 0.5,
    the negative vocabulary below — including held-out docs the fit
    never saw (sample=50 of each 100)."""
    s = clf_score(planted, planted_model).toPandas()
    pos, neg = s[s.doc_id < 100], s[s.doc_id >= 100]
    assert pos.score.min() > 0.7 and pos.kept.all()
    assert neg.score.max() < 0.3 and not neg.kept.any()


def test_fit_deterministic(planted, planted_model):
    m2 = fit_quality_clf(planted.where("doc_id < 100").repartition(7),
                         planted.where("doc_id >= 100").repartition(5),
                         b=B, bucket_fn=md5_bucket(B), sample=50)
    assert np.array_equal(m2.w, planted_model.w)
    assert m2.bias == planted_model.bias


def test_duck_fit_and_score_twin(spark, planted, planted_model):
    """The DuckDB oracle path refits INDEPENDENTLY from the same
    pinned sample spec — weights must be bit-identical — and the
    score twin must reproduce every per-doc row."""
    pdf = planted.toPandas()
    con = duckdb.connect()
    con.register("docs_py", pdf)
    w, bias = fit_triples_duck(
        con, "SELECT doc_id, norm FROM docs_py WHERE doc_id < 100",
        "SELECT doc_id, norm FROM docs_py WHERE doc_id >= 100",
        b=B, sample=50)
    assert np.array_equal(w, planted_model.w)
    assert bias == planted_model.bias

    got = (clf_score(planted, planted_model).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    nz = np.flatnonzero(planted_model.w)
    duck = (con.sql(quality_clf_duck_sql(
        "SELECT doc_id, norm FROM docs_py",
        [(int(i), float(planted_model.w[i])) for i in nz],
        planted_model.bias, 0.5, b=B)).df()
        .sort_values("doc_id").reset_index(drop=True))
    cols = sorted(got.columns)
    assert sorted(duck.columns) == cols
    assert got[cols].astype(str).equals(duck[cols].astype(str))


def test_zero_feature_doc_pinned(spark, planted_model):
    df = spark.createDataFrame([(1, ""), (2, None), (3, "alpha beta")],
                               "doc_id long, norm string")
    s = {r["doc_id"]: r for r in clf_score(df, planted_model).collect()}
    exp_logit = round(planted_model.bias, 4)
    for d in (1, 2):
        assert s[d]["n_feat"] == 0 and s[d]["logit"] == exp_logit
    assert s[3]["n_feat"] == 3       # 2 unigrams + 1 bigram


def test_score_plan_shape(planted, planted_model):
    """Scoring: weight join broadcast, ONE hash exchange (the doc_id
    aggregate), no python UDFs."""
    plan = (clf_score(planted, planted_model)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    # one exchange for the groupBy(doc_id) agg on each union branch
    # is collapsed by reuse; allow <=2 (scored + empties-union side)
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
