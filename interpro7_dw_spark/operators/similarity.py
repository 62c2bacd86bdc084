"""Similarity search over embedding columns (array<float>).

``cosine_topk`` is the exact brute-force baseline: a broadcast of the
query set against the corpus, dot products computed with higher-order
functions (JVM-side, no Python). Deterministic: accumulation is
left-to-right in list order in double precision, so any IEEE-754
engine (incl. the DuckDB oracle) produces bit-identical sums.

``lsh_topk`` is the scale path: random-hyperplane signs bucket the
corpus so each query only scans its own bucket (plus optionally
neighboring buckets). Hyperplanes are derived from md5 of the
(plane, dimension) index — reproducible, no RNG state.

At 100 TB: corpus side stays partitioned, query side broadcasts;
for huge query sets swap to a bucket-bucket join on the LSH key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return emb.withColumn("__v", v).withColumn("__norm", F.sqrt(_dot(F.col("__v"), F.col("__v"))))


def cosine_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every row matching query_pred."""
    n = with_norm(emb, vec_col)
    q = n.filter(query_pred).select(
        F.col(id_col).alias("qid"), F.col("__v").alias("qv"), F.col("__norm").alias("qn")
    )
    c = n.select(
        F.col(id_col).alias("vid"), F.col("__v").alias("cv"), F.col("__norm").alias("cn")
    )
    sims = (
        F.broadcast(q)
        .join(c, F.col("qid") != F.col("vid"))
        .select(
            "qid",
            "vid",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vid"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vid", "sim")
    )


def _hyperplane(planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — no RNG state."""
    import hashlib

    out = []
    for p in range(planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append((h / 0xFFFFFFFF) * 2.0 - 1.0)
        out.append(row)
    return out


def lsh_bucket(
    emb: DataFrame, planes: int = 8, dim: int = 64, vec_col: str = "embedding"
) -> DataFrame:
    """Random-hyperplane LSH bucket id per row (sign pattern as int)."""
    hp = _hyperplane(planes, dim)
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for p, row in enumerate(hp):
        plane = F.array(*[F.lit(x) for x in row])
        sign = (_dot(v, plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(sign, p)
    return emb.withColumn("bucket", bucket)


def lsh_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket."""
    b = with_norm(lsh_bucket(emb, planes, dim, vec_col), vec_col)
    q = b.filter(query_pred).select(
        F.col(id_col).alias("qid"), F.col("__v").alias("qv"),
        F.col("__norm").alias("qn"), F.col("bucket").alias("qb"),
    )
    c = b.select(
        F.col(id_col).alias("vid"), F.col("__v").alias("cv"),
        F.col("__norm").alias("cn"), F.col("bucket").alias("cb"),
    )
    sims = (
        F.broadcast(q)
        .join(c, (F.col("qb") == F.col("cb")) & (F.col("qid") != F.col("vid")))
        .select(
            "qid", "vid",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vid"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vid", "sim")
    )
