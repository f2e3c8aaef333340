"""Similarity search over embedding columns (array<float>).

- `cosine_topk` — brute-force cosine top-k, the exactness baseline.  All
  arithmetic in DOUBLE via zip_with + aggregate (JVM-side higher-order
  functions, no UDF); scores rounded to 6 decimals with id tie-breaks so
  results are reproducible across engines.
- `lsh_bucketed_topk` — the scale path: multi-table random-hyperplane (SRP)
  bucketing; queries only score candidates sharing a hyperplane-signature
  bucket in at least one table, turning the O(N·Q) scan into bucket-local
  joins.  Recall is tunable via n_planes (bucket granularity) × n_tables
  (independent chances).
- `srp_near_pairs` — the scale path for threshold near-dup pairs: pair
  generation happens only within (table, bucket), never all-pairs.
- `embedding_near_pairs` — brute-force threshold pairs, kept as the
  small-scale oracle for the bucketed variant.

Hyperplanes are a deterministic seeded literal matrix folded into the plan
(`srp_planes`), so an external engine (the DuckDB oracle) can reproduce the
bucketing bit-for-bit.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deduputil_spark.cache import track


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


def srp_planes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    """Deterministic hyperplane matrix (n_planes × dim) for SRP bucketing.
    Shared by the Spark operators and the SQL-oracle generator so both engines
    compute identical buckets."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def table_seed(seed: int, table: int) -> int:
    """Per-table plane seed (stable scheme shared with the SQL oracle)."""
    return seed + 7919 * table


def _srp_bucket_col(vec_col: str, planes: np.ndarray):
    """Bucket id column: plane 0 is the most significant bit (JVM fold form,
    kept for `srp_signatures` API compatibility and as the semantics spec)."""
    bucket = None
    for row in planes:
        lit_plane = F.array(*[F.lit(float(x)) for x in row])
        bit = (_dot(F.col(vec_col), lit_plane) >= 0).cast("long")
        bucket = bit if bucket is None else bucket * 2 + bit
    return bucket


def _srp_multi_buckets(
    emb: DataFrame,
    n_planes: int,
    n_tables: int,
    seed: int,
    dim: int,
    id_col: str,
    vec_col: str,
    out_id: str,
) -> DataFrame:
    """All n_tables bucket ids per vector in ONE vectorized numpy pass
    (mapInPandas batch matmul) -> (out_id, b0..b{n_tables-1}).

    This is the scale form of the signature step: one narrow map over the
    corpus instead of n_tables×n_planes chained fold expressions in codegen.
    Bit semantics match `_srp_bucket_col` exactly (sign of the double dot;
    the summation-order difference is ~1e-12 against dot magnitudes ≥1e-5 on
    any non-degenerate data, and oracle parity tests pin it)."""
    import pandas as pd

    all_planes = np.vstack(
        [srp_planes(n_planes, dim, table_seed(seed, t)) for t in range(n_tables)]
    )  # (n_tables*n_planes, dim)
    weights = np.tile(1 << np.arange(n_planes)[::-1], n_tables)
    table_idx = np.repeat(np.arange(n_tables), n_planes)
    cols = [out_id] + [f"b{t}" for t in range(n_tables)]
    id_type = emb.schema[id_col].dataType.simpleString()
    schema = f"{out_id} {id_type}, " + ", ".join(f"b{t} long" for t in range(n_tables))

    def run(batches):
        for pdf in batches:
            vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if len(vecs) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            bits = (vecs @ all_planes.T) >= 0  # (n, n_tables*n_planes)
            contrib = bits * weights
            out = {out_id: pdf[id_col]}
            for t in range(n_tables):
                out[f"b{t}"] = contrib[:, table_idx == t].sum(axis=1).astype(np.int64)
            yield pd.DataFrame(out)

    return emb.select(id_col, vec_col).mapInPandas(run, schema=schema)


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int | None = None,
) -> DataFrame:
    """queries × corpus brute force -> (query_id, neighbor_id, cos, rank).

    The corpus side broadcasts when small; at scale, prefer
    `lsh_bucketed_topk`.  Pass `max_rows` to hard-cap the corpus side (the
    driver oracle entries set it so the brute path can never run at corpus
    scale by accident)."""
    emb = _guard_brute(emb, "cosine_topk", max_rows)
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
    """Sign-random-projection bucket id per vector (one n_planes-bit bucket)."""
    bucket = _srp_bucket_col(vec_col, srp_planes(n_planes, dim, seed))
    return emb.select(F.col(id_col), F.col(vec_col), bucket.alias("srp_bucket"))


def lsh_bucketed_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 1,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """ANN via multi-table SRP buckets: score only candidates sharing a bucket
    with the query in ≥1 table.

    At cluster scale, corpus signatures are precomputed once per table and
    bucket-partitioned; the query join is then bucket-local (no full scan) and
    the candidate union is distinct-ed before the (expensive) scoring join."""
    # all n_tables bucket ids in ONE vectorized numpy pass per side, then ONE
    # join on the composite (table, bucket) key — posexplode replaces the
    # former per-table join loop (n_tables exchanges + persists) with a single
    # exchange; distinct dedups candidates that co-bucket in several tables
    qsig = _srp_multi_buckets(queries, n_planes, n_tables, seed, dim, id_col, vec_col, "query_id")
    nsig = _srp_multi_buckets(emb, n_planes, n_tables, seed, dim, id_col, vec_col, "neighbor_id")
    tb = F.posexplode(F.array(*[F.col(f"b{t}") for t in range(n_tables)])).alias("t", "b")
    qlong = qsig.select("query_id", tb)
    nlong = nsig.select("neighbor_id", tb)
    cand = (
        qlong.join(nlong, ["t", "b"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")).withColumn(
        "qn", _norm(F.col("qv"))
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")).withColumn(
        "cn", _norm(F.col("cv"))
    )
    scored = (
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
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


def srp_near_pairs(
    emb: DataFrame,
    threshold: float = 0.35,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Bucketed threshold near-pairs: candidates are generated ONLY within
    (table, srp_bucket) — never all-pairs — then scored exactly and filtered.

    Recall vs `embedding_near_pairs` is governed by (1-(1-p^n_planes)^n_tables)
    with p = 1 - angle/π; the pytest gate measures it on the planted corpus.
    """
    # one vectorized signature pass over the corpus, one (table, bucket)
    # self-join: posexplode fuses the former per-table join loop (n_tables
    # exchanges behind a persist) into a single exchange
    sig = _srp_multi_buckets(emb, n_planes, n_tables, seed, dim, id_col, vec_col, "_id")
    tb = F.posexplode(F.array(*[F.col(f"b{t}") for t in range(n_tables)])).alias("t", "b")
    a = sig.select(F.col("_id").alias("id_a"), tb)
    b = sig.select(F.col("_id").alias("id_b"), tb)
    cand = (
        a.join(b, ["t", "b"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")).withColumn(
        "na", _norm(F.col("va"))
    )
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")).withColumn(
        "nb", _norm(F.col("vb"))
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


#: hard ceiling for the brute-force O(N²)/O(N·Q) paths: they exist as
#: small-scale oracles for the bucketed variants and must never be pointed at
#: a corpus-scale table by accident (200k rows ≈ 2·10¹⁰ candidate pairs is
#: already far past where srp_near_pairs/lsh_bucketed_topk win).
BRUTE_FORCE_MAX_ROWS = 200_000


def _guard_brute(df: DataFrame, what: str, max_rows: int | None) -> DataFrame:
    """Size-cap for the brute paths.  NOTE: EAGER — runs a bounded
    limit(max_rows+1).count() Spark job at plan-construction time (ADVICE r3:
    this is a deliberate, documented action, not a lazy transform).  The input
    is persisted (cache.track) first so the guard's scan is reused by the real
    job instead of re-executing upstream lineage; the caller releases via
    release_caches() as with every tracked frame."""
    if max_rows is None:
        return df
    df = track(df)
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"{what}: input exceeds {max_rows} rows — this is the brute-force "
            "small-scale oracle path; use the SRP-bucketed variant "
            "(srp_near_pairs / lsh_bucketed_topk) at corpus scale, or pass "
            "max_rows=None to force."
        )
    return df


def embedding_near_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int | None = BRUTE_FORCE_MAX_ROWS,
) -> DataFrame:
    """All pairs above a cosine threshold — brute force O(N²).

    Kept as the small-scale oracle for `srp_near_pairs`; never the plan of
    record at corpus scale (hard-capped at `max_rows` input rows)."""
    emb = _guard_brute(emb, "embedding_near_pairs", max_rows)
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
