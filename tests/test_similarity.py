"""Similarity operators: the pandas_udf alternative path agrees with the
native expression path, and IVF recall is sane vs brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_power_bi_dashboard_spark.operators import similarity

from .conftest import SF_DIR


def test_pandas_udf_cosine_matches_native(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qa"), F.col("embedding").cast("array<double>").alias("va")
    )
    b = emb.filter(F.col("vec_id").between(5, 30)).select(
        F.col("vec_id").alias("qb"), F.col("embedding").cast("array<double>").alias("vb")
    )
    pairs = a.crossJoin(b)
    udf_cos = similarity.cosine_pandas_udf()
    both = pairs.select(
        "qa",
        "qb",
        similarity.cosine(F.col("va"), F.col("vb")).alias("native"),
        udf_cos(F.col("va"), F.col("vb")).alias("vectorized"),
    ).collect()
    assert len(both) > 0
    for r in both:
        assert abs(r.native - r.vectorized) < 1e-9


def test_lsh_multi_table_monotone_recall(spark):
    """A second LSH hash table can only ADD verified pairs (table 0 is
    always included), and every surfaced pair really clears the cosine
    threshold — the multi-table recall contract from SCALE.md."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").filter(
        F.col("vec_id") < 300
    )
    one = {
        (r.vec_a, r.vec_b): r.cosine
        for r in similarity.lsh_neardup_pairs(emb, threshold=0.25, n_tables=1).collect()
    }
    two = {
        (r.vec_a, r.vec_b): r.cosine
        for r in similarity.lsh_neardup_pairs(emb, threshold=0.25, n_tables=2).collect()
    }
    assert set(one) <= set(two)
    assert len(two) > 0
    assert all(c >= 0.25 for c in two.values())


def test_ivf_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.cosine_topk(emb, queries, k=3).collect()
    }
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    approx = {
        (r.query_id, r.vec_id)
        for r in similarity.ivf_topk(emb, centroids, queries, k=3, n_probe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    # approximate by design, and this corpus is only weakly clustered
    # (max pairwise cosine ~0.51), so probing 3 of 10 coarse cells keeps
    # less than half of the true neighborhood — assert the floor that
    # distinguishes "working ANN" from "broken bucketing"
    assert recall >= 0.3, f"IVF recall suspiciously low: {recall}"
