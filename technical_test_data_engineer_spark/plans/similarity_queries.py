"""Similarity-search queries over the embeddings table (north-star
§2.11). The brute-force query has a full DuckDB oracle (exact decimal
dot products on both sides); the LSH variant is approximate by design →
rows-only check, with recall asserted in unit tests instead.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from technical_test_data_engineer_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)
from technical_test_data_engineer_spark.plans.star_queries import query
from technical_test_data_engineer_spark.sources.parquet_source import load_table

N_QUERIES = 5
TOP_K = 5


@query(
    "knn_bruteforce",
    f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qvec
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
        SELECT q.query_id, e.vec_id,
               CAST((
                   SELECT SUM(CAST(x * y AS DECIMAL(38,30)))
                   FROM (SELECT UNNEST(CAST(q.qvec AS DOUBLE[])) AS x,
                                UNNEST(CAST(e.embedding AS DOUBLE[])) AS y)
               ) AS DOUBLE) AS score
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, rank, score
    FROM (
        SELECT query_id, vec_id, score,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY score DESC, vec_id ASC
               ) AS INTEGER) AS rank
        FROM scored
    )
    WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """,
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 nearest neighbors (dot product ≡ cosine — the corpus
    is unit-normalized) for 5 probe vectors, broadcast-scan plan."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_QUERIES)
    out = brute_force_topk(emb, probes, k=TOP_K)
    return out.orderBy("query_id", "rank").withColumn(
        "rank", F.col("rank").cast("int")
    ).select("query_id", "vec_id", "rank", "score")


# rows-only (approximate): recall vs brute force asserted in tests
@query("knn_lsh_ann")
def knn_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via signed-random-projection LSH, 8 tables × 3
    hyperplanes (seeded; measured 0.92 recall vs brute force on the
    sf0.001 fixture). Candidates only from matching sign-buckets; exact
    re-score; same output contract as knn_bruteforce. The
    planes-per-table / table-count pair is the recall↔cost dial: more
    planes → smaller buckets → cheaper + lower recall."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_QUERIES)
    rng = random.Random(42)
    dim = 64
    planes_tables = [
        [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(3)] for _ in range(8)
    ]
    out = lsh_topk(emb, probes, planes_tables, k=TOP_K)
    return out.orderBy("query_id", "rank").withColumn(
        "rank", F.col("rank").cast("int")
    ).select("query_id", "vec_id", "rank", "score")


# rows-only (approximate): recall vs brute force asserted in tests
@query("knn_ivf_ann")
def knn_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via IVF (FAISS-style coarse quantizer): corpus
    bucketed into 16 Voronoi cells scan-side, each query probes its 4
    nearest cells (25% of the corpus scored instead of 100%). Centroids
    come from seeded distributed k-means (pyspark.ml) — see
    operators/similarity.train_ivf_centroids. Recall at fixed probe
    fraction depends on how clustered the corpus is; tests assert ≥0.9
    on clustered data and the exact-in-the-limit property (probing all
    cells ≡ brute force) on this uniform-random fixture."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_QUERIES)
    out = ivf_topk(emb, probes, n_centroids=16, n_probe=4, k=TOP_K)
    return out.orderBy("query_id", "rank").withColumn(
        "rank", F.col("rank").cast("int")
    ).select("query_id", "vec_id", "rank", "score")


# rows-only (approximate): PQ reconstruction is lossy by design; recall
# + compression invariants are asserted in tests/test_similarity.py
@query("knn_pq_ann")
def knn_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via product quantization + asymmetric distance
    (FAISS PQ/ADC): each 64-d float32 vector compresses to 8 subspace
    codes (32× smaller), and scoring sums 8 lookup-table entries per
    corpus row — no raw corpus vectors move after encoding. The
    compression tier under IVF/LSH for corpora whose raw embeddings
    don't fit the cluster's storage budget."""
    from technical_test_data_engineer_spark.operators.similarity import (
        pq_adc_topk,
        train_pq_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_QUERIES)
    books = train_pq_codebooks(emb, m=8, n_codes=64)
    # two-stage: ADC shortlist of 25 from codes, exact re-rank to top-5
    out = pq_adc_topk(emb, probes, books, k=TOP_K, rerank=25)
    return out.orderBy("query_id", "rank").withColumn(
        "rank", F.col("rank").cast("int")
    ).select("query_id", "vec_id", "rank", "score")
