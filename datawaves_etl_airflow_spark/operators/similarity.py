"""Embedding similarity search: brute-force cosine top-k (exact
baseline) and random-hyperplane LSH bucketing (the scale path).

Vectors are ``array<float>`` columns. All arithmetic runs JVM-side via
higher-order functions (``zip_with``/``aggregate``) in double precision
— left-to-right accumulation, so results are deterministic and
reproducible by any engine that sums the same way.

Scale posture: brute force is O(n·q) — correct for reranking a
candidate set or small q; the LSH variant buckets by sign-pattern over
``n_planes`` fixed random hyperplanes so each query only scores its
bucket (plus optional multi-probe neighbors at 1-bit flips). At 100 TB
the bucketed join shuffles by (plane_sig), never the cross product.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double, left-to-right."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k of every query against the full corpus.

    ``queries`` carries (query_id, query_vec). Deterministic tiebreak:
    (cosine desc, corpus id asc).
    """
    joined = queries.crossJoin(vectors).withColumn(
        "cosine", cosine(F.col("query_vec"), F.col(vec_col))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("match_id"),
            "rank",
            F.round("cosine", 6).alias("cosine_sim"),
        )
    )


def neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ t).

    Exact all-pairs form — the oracle-checkable baseline; at scale,
    feed LSH buckets through the same scoring instead.
    """
    a = vectors.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select(
            "id_a", "id_b", F.round("cosine", 6).alias("cosine_sim")
        )
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def plane_signature(
    vec: Column, planes: list[list[float]]
) -> Column:
    """Sign-pattern bucket id over fixed hyperplanes (bigint)."""
    sig = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bit = F.when(dot(vec, plane) >= 0, F.expr(f"CAST(1 AS BIGINT) << {i}")).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = sig.bitwiseXOR(bit)
    return sig


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's
    hyperplane bucket. Recall grows with fewer planes / multi-probe;
    the shuffle key is the bucket signature, never the cross product.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    v = vectors.withColumn("bucket", plane_signature(F.col(vec_col), planes))
    q = queries.withColumn("bucket", plane_signature(F.col("query_vec"), planes))
    joined = q.join(v, "bucket", "inner").withColumn(
        "cosine", cosine(F.col("query_vec"), F.col(vec_col))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("match_id"),
            "rank",
            F.round("cosine", 6).alias("cosine_sim"),
        )
    )
