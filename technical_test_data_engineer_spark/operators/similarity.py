"""Vector similarity search over embedding columns (north-star §2.11).

Two tiers:
- ``brute_force_topk`` — exact cosine top-k via broadcast of the query
  set; the dot product is a JVM ``zip_with``+``aggregate`` fold (no
  Python, no shuffle of the corpus). Correct at any scale where the
  QUERY set is small; cost is one full corpus scan per batch of queries.
- ``lsh_topk`` — random-hyperplane (SRP) LSH bucketing: corpus and
  queries hash to sign-bit buckets; only same-bucket pairs are scored.
  The scale path: the corpus shuffle is by bucket id, each bucket is a
  tiny cross product, recall tunable via n_planes/n_tables.

Embeddings are float32 arrays; dot products fold in DECIMAL(38,30) so
scores are exactly reproducible across partitionings (and match the
DuckDB oracle bit-for-bit) — see functions/scalars.py for why double
summation cannot be.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DEC = "decimal(38,30)"


def exact_dot(a: Column, b: Column) -> Column:
    """Order-stable inner product: per-element double products (IEEE
    mult is exact-rounded, identical everywhere), summed exactly in
    decimal, surfaced as double."""
    products = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(_DEC)
    )
    # Spark widens decimal adds to scale-1; cast back each step to keep
    # the fold type-stable (step rounding ~1e-29 ≪ double ulp of the
    # surfaced result, so the double output is unaffected).
    return F.aggregate(
        products, F.lit(0).cast(_DEC), lambda acc, x: (acc + x).cast(_DEC)
    ).cast("double")


def l2_norm(a: Column) -> Column:
    sq = F.transform(a, lambda x: (x.cast("double") * x.cast("double")).cast(_DEC))
    return F.sqrt(
        F.aggregate(
            sq, F.lit(0).cast(_DEC), lambda acc, x: (acc + x).cast(_DEC)
        ).cast("double")
    )


def cosine(a: Column, b: Column) -> Column:
    return exact_dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    metric: str = "dot",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    ``queries`` must be small (it is broadcast whole); the corpus is
    never shuffled — each scan task scores its partition and the top-k
    window reduces per query. Output: (query_id, vec_id, rank, score).
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qvec")
        )
    )
    paired = corpus.crossJoin(q).filter(F.col(id_col) != F.col(query_id_col))
    score = (
        exact_dot(F.col("_qvec"), F.col(vec_col))
        if metric == "dot"
        else cosine(F.col("_qvec"), F.col(vec_col))
    )
    scored = paired.select(query_id_col, id_col, score.alias("score"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "score")
    )


def srp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection signature: one sign bit per hyperplane,
    packed into a long. Planes are fixed literals (seeded driver-side),
    so the signature is deterministic and computable scan-side."""
    bits = []
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        d = F.aggregate(
            F.zip_with(vec, p, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes_tables: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an SRP bucket
    with the query in ≥1 hash table.

    ``planes_tables`` is ``n_tables`` lists of hyperplanes. Per table:
    corpus rows shuffle by (table, signature); queries (small) broadcast.
    Union of candidates, dedup, exact re-score, top-k — the standard
    recall/cost dial for ANN at 100 TB.
    """
    cands = None
    for t, planes in enumerate(planes_tables):
        c_sig = corpus.select(
            id_col, vec_col, srp_signature(F.col(vec_col), planes).alias("_sig")
        )
        q_sig = F.broadcast(
            queries.select(
                F.col(id_col).alias(query_id_col),
                F.col(vec_col).alias("_qvec"),
                srp_signature(F.col(vec_col), planes).alias("_sig"),
            )
        )
        pair = c_sig.join(q_sig, "_sig").drop("_sig")
        cands = pair if cands is None else cands.unionByName(pair)
    cands = cands.dropDuplicates([query_id_col, id_col]).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = cands.select(
        query_id_col, id_col, exact_dot(F.col("_qvec"), F.col(vec_col)).alias("score")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "score")
    )
