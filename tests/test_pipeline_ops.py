"""Unit tests for the training-data pipeline operators (dedup /
similarity / text / multimodal plumbing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from optiprism_spark.operators.dedup import exact_dedup, jaccard_pairs, minhash_signatures
from optiprism_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    media_from_documents,
    resize_stub,
)
from optiprism_spark.operators.similarity import cosine_topk


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_lowest_id(spark):
    df = docs_df(spark, [(1, "a b c"), (2, "a b c"), (3, "x y z")])
    out = {r.doc_id: r.dup_count for r in exact_dedup(df).collect()}
    assert out == {1: 2, 3: 1}


def test_minhash_identical_docs_share_signature(spark):
    df = docs_df(spark, [(1, "w1 w2 w3 w4 w5"), (2, "w1 w2 w3 w4 w5"), (3, "q r s t u")])
    rows = {r.doc_id: (r.sig_0, r.sig_1) for r in minhash_signatures(df, k=2).collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_jaccard_pairs_exact_value(spark):
    # 5 words -> 3 shingles each; docs share 2 of 4 distinct shingles
    df = docs_df(spark, [(1, "a b c d e"), (2, "b c d e f")])
    out = jaccard_pairs(df, threshold=0.0, candidates="all").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.jaccard == pytest.approx(2 / 4)


def test_connected_components_chain_and_island(spark):
    from optiprism_spark.operators.dedup import connected_components

    # chain 1-2-3 (diameter 2, needs >1 propagation round) + island 7-8
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (7, 8)], "doc_a long, doc_b long"
    )
    out = {r.node: r.component for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_connected_components_empty_edges(spark):
    from optiprism_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(pairs).count() == 0


def test_cosine_topk_orders_by_similarity(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [1.0, 0.05]),
        ],
        "vec_id long, embedding array<float>",
    )
    q = emb.filter(F.col("vec_id") == 0)
    out = cosine_topk(emb, q, k=2).orderBy("rank").collect()
    assert [r.neighbor_id for r in out] == [3, 1]
    assert out[0].sim > out[1].sim > 0.9


def test_multimodal_feature_plumbing(spark, tmp_path):
    docs = docs_df(spark, [(1, "hello world"), (2, "spark engine")])
    media = media_from_documents(docs.withColumnRenamed("id", "doc_id"))
    feats = extract_features(media, dim=4).collect()
    by_id = {r.media_id: r for r in feats}
    assert by_id[1].n_bytes == len("hello world")
    assert len(by_id[1].feature) == 4
    assert all(0 <= x <= 1 for x in by_id[1].feature)
    # determinism
    feats2 = extract_features(media, dim=4).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))


def test_multimodal_decode_stub_raises_when_real(spark):
    docs = docs_df(spark, [(1, "hello")])
    media = media_from_documents(docs)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        extract_features(media, decode_stub=False).collect()


def test_resize_and_frame_sampling(spark):
    docs = docs_df(spark, [(1, "hello")])
    media = resize_stub(media_from_documents(docs), 224, 224)
    meta = media.select("meta.width", "meta.height").collect()[0]
    assert (meta.width, meta.height) == (224, 224)
    vid = media.withColumn(
        "meta",
        F.struct(
            F.lit("video").alias("kind"), F.lit("raw").alias("format"),
            F.lit(0).alias("width"), F.lit(0).alias("height"),
            F.lit(3000).cast("long").alias("duration_ms"),
        ),
    )
    frames = frame_sample_plan(vid, every_ms=1000).collect()
    assert [r.frame_ts_ms for r in frames] == [0, 1000, 2000, 3000]


def test_ivf_kmeans_centroids_recall(spark):
    """Trained-KMeans IVF must recover most of the brute-force top-k:
    the quantizer seam swaps without changing the plan, and recall
    against exact top-5 stays high on the fixture embeddings."""
    from optiprism_spark.operators.similarity import cosine_topk, cosine_topk_ivf
    from optiprism_spark.schema import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_ivf(
            emb, queries, k=5, n_centroids=4, nprobe=2, centroids="kmeans"
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"recall {recall:.2f}"
