"""MinHash signatures + LSH banding.

Two interchangeable hash families:

- "md5"   — minhash_i = MIN(md5(shingle || '#' || i)).  Lexicographic min over
  a uniform 128-bit hex hash is a valid min-wise permutation approximation,
  and — crucially — `md5` is bit-identical in Spark and DuckDB, so signatures,
  band keys, and candidate pairs get EXACT SQL oracles (the correctness gate).
- "xxhash" — one xxhash64 per shingle, then num_perm universal-hash rehashes
  ((a_i·h + b_i) mod p) — the fast path (64-bit int ops instead of num_perm
  md5s per shingle row).

Both are single hash-aggregate shuffles: num_perm MIN() aggregate expressions
per document (columnar, partial aggregation applies — Catalyst computes
map-side partial mins before the exchange, so the shuffle carries one
num_perm-wide row per (doc × partition), NOT per shingle).

This two-tier cheap-signature → expensive-verify staging is the distributed
re-realization of the reference's weak→strong probe
(/root/reference/src/dedup.c:594-611, /root/reference/src/sync.c:275-281).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduputil_spark.config import DedupConfig

# 2^31-1: keeps a·h+b < 2^62 (Spark 4 runs ANSI mode — long overflow throws).
# 31-bit minhash space is ample: only relative order matters, and per-pair
# collision probability 2^-31 is negligible at document shingle-set sizes.
MERSENNE_P = (1 << 31) - 1


def _coeffs(num_perm: int, seed: int = 12345) -> tuple[list[int], list[int]]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_perm, dtype=np.int64).tolist()
    b = rng.integers(0, MERSENNE_P, size=num_perm, dtype=np.int64).tolist()
    return a, b


def minhash_signatures(
    shingle_df: DataFrame, cfg: DedupConfig | None = None, family: str = "md5"
) -> DataFrame:
    """(conv_id, shingle) -> (conv_id, sig array<string|long>[num_perm])."""
    cfg = cfg or DedupConfig()
    p = cfg.num_perm
    if family == "md5":
        aggs = [
            F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"h{i}")
            for i in range(p)
        ]
    elif family == "xxhash":
        a, b = _coeffs(p)
        h = F.pmod(F.xxhash64(F.col("shingle")), F.lit(MERSENNE_P))  # 31-bit reduce first
        aggs = [
            F.min(F.pmod(F.lit(a[i]) * h + F.lit(b[i]), F.lit(MERSENNE_P))).alias(f"h{i}")
            for i in range(p)
        ]
    else:
        raise ValueError(f"unknown minhash family {family!r}")
    sig = shingle_df.groupBy("conv_id").agg(*aggs)
    return sig.select("conv_id", F.array(*[F.col(f"h{i}") for i in range(p)]).alias("sig"))


def lsh_bands(signatures: DataFrame, cfg: DedupConfig | None = None) -> DataFrame:
    """(conv_id, sig) -> (conv_id, band_idx, band_hash).

    band_hash = md5 of the '|'-joined row signatures of that band — a compact
    fixed-width band key (keeps the shuffle narrow at num_perm=128+).
    """
    cfg = cfg or DedupConfig()
    r = cfg.lsh_rows
    bands = signatures.select(
        "conv_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(cfg.lsh_bands - 1)),
                lambda b: F.md5(
                    F.array_join(
                        F.transform(
                            F.slice(F.col("sig"), b * r + 1, r), lambda x: x.cast("string")
                        ),
                        "|",
                    )
                ),
            )
        ).alias("band_idx", "band_hash"),
    )
    return bands.withColumn("band_idx", F.col("band_idx").cast("int"))


def minhash_jaccard_estimate(signatures: DataFrame, pairs: DataFrame) -> DataFrame:
    """Signature-agreement Jaccard estimate for given (conv_a, conv_b) pairs:
    fraction of equal components (zip_with + aggregate, JVM-side)."""
    a = signatures.select(F.col("conv_id").alias("conv_a"), F.col("sig").alias("sig_a"))
    b = signatures.select(F.col("conv_id").alias("conv_b"), F.col("sig").alias("sig_b"))
    return (
        pairs.join(a, "conv_a").join(b, "conv_b")
        .select(
            "conv_a",
            "conv_b",
            (
                F.aggregate(
                    F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                    F.lit(0),
                    lambda acc, v: acc + v,
                )
                / F.size("sig_a")
            ).alias("est_jaccard"),
        )
    )
