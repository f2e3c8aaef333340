"""Similarity search over embedding columns (array<float>).

- `cosine_topk` — brute-force cosine top-k, the exactness baseline.  All
  arithmetic in DOUBLE via zip_with + aggregate (JVM-side higher-order
  functions, no UDF); scores rounded to 6 decimals with id tie-breaks so
  results are reproducible across engines.
- `lsh_bucketed_topk` — the scale path: random-hyperplane (SRP) bucketing;
  queries only score candidates sharing their hyperplane signature bucket,
  turning the O(N·Q) scan into a bucket-local join.  Recall is tunable via
  n_planes/n_tables.
- `embedding_near_pairs` — threshold near-dup pairs (dedup by embedding).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return emb.withColumn("_norm", _norm(F.col(vec_col)))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """queries × corpus brute force -> (query_id, neighbor_id, cos, rank).

    The corpus side broadcasts when small; at scale, prefer
    `lsh_bucketed_topk`."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")).withColumn(
        "cn", _norm(F.col("cv"))
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def srp_signatures(
    emb: DataFrame,
    n_planes: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Sign-random-projection bucket id per vector (one 16-bit bucket).

    Hyperplanes are a deterministic literal matrix folded into the plan —
    n_planes dot products via zip_with over a broadcast-free literal array."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = None
    for i in range(n_planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = (_dot(F.col(vec_col), lit_plane) >= 0).cast("long")
        bucket = bit if bucket is None else bucket * 2 + bit
    return emb.select(F.col(id_col), F.col(vec_col), bucket.alias("srp_bucket"))


def lsh_bucketed_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """ANN via SRP buckets: score only same-bucket candidates.

    At cluster scale, corpus signatures are precomputed once and bucket-
    partitioned; the query join is then bucket-local (no full scan)."""
    csig = srp_signatures(emb, n_planes, id_col=id_col, vec_col=vec_col, dim=dim)
    qsig = srp_signatures(queries, n_planes, id_col=id_col, vec_col=vec_col, dim=dim).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "srp_bucket"
    ).withColumn("qn", _norm(F.col("qv")))
    c = csig.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "srp_bucket"
    ).withColumn("cn", _norm(F.col("cv")))
    scored = (
        qsig.join(c, "srp_bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def embedding_near_pairs(
    emb: DataFrame, threshold: float = 0.9, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """All pairs above a cosine threshold (embedding near-dup dedup)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")).withColumn(
        "na", _norm(F.col("va"))
    )
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")).withColumn(
        "nb", _norm(F.col("vb"))
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
