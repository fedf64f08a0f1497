"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline; an LSH-bucketed
(random-hyperplane) variant as the scale path — candidates meet in an
equi-join on the bucket key, so cost is O(pairs within buckets), not
O(n^2). All arithmetic via JVM higher-order functions
(zip_with/aggregate); no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    ))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos) — k rows per query.

    Cross join + window rank; the small side (queries) is broadcast.
    Deterministic tie-break on neighbor id. Self-matches excluded.
    """
    from pyspark.sql import Window

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", F.round(F.col("cos"), 6).alias("cos"))
    )


def hyperplane_lsh_buckets(
    vectors: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH: (id, bucket) where bucket packs the sign
    bits of n_planes seeded random projections.

    Plane weights are a deterministic function of (seed, plane, coord)
    via Spark's hash() — no driver-side random state, resume-stable.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    v = F.col(vec_col)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        w = F.array(*[F.lit(float(x)) for x in planes[p]])
        proj = F.aggregate(
            F.zip_with(v, w, lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, t: acc + t,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return vectors.select(F.col(id_col).alias("id"), bucket.alias("bucket"))


def embedding_near_dups(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: bool = False,
    n_planes: int = 6,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= threshold).

    use_lsh=True restricts candidates to same-LSH-bucket vectors (the
    scale path for big corpora); False is the exact all-pairs baseline.
    """
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if use_lsh:
        b = hyperplane_lsh_buckets(vectors, n_planes, seed, id_col, vec_col, dim)
        v = v.join(b, "id")
        cond = (F.col("a.bucket") == F.col("c.bucket")) & (F.col("a.id") < F.col("c.id"))
    else:
        cond = F.col("a.id") < F.col("c.id")
    a, c = v.alias("a"), v.alias("c")
    return (
        a.join(c, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("c.id").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("c.v")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def lsh_topk(
    vectors: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate all-pairs top-k: candidates restricted to same-bucket
    vectors (equi-join on bucket), exact cosine inside the bucket.
    Recall grows with fewer planes / multiple tables; this single-table
    variant is the scale skeleton."""
    from pyspark.sql import Window

    b = hyperplane_lsh_buckets(vectors, n_planes, seed, id_col, vec_col, dim)
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).join(b, "id")
    a, c = v.alias("a"), v.alias("c")
    scored = (
        a.join(c, (F.col("a.bucket") == F.col("c.bucket")) & (F.col("a.id") != F.col("c.id")))
        .select(
            F.col("a.id").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
            cosine(F.col("a.v"), F.col("c.v")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", F.round(F.col("cos"), 6).alias("cos"))
    )
