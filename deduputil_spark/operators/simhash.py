"""SimHash — the second signature family (SURVEY.md §7.2).

64-bit SimHash over token hashes: each token contributes +1/-1 to 64 bit
buckets according to its xxhash64 bits; the signature's bit i is the sign of
bucket i.  Near-duplicates have small Hamming distance.

Implemented as 64 SUM(CASE…) aggregate expressions — entirely JVM-side
whole-stage-codegen, partial aggregation applies (no UDF, per input contract).

Candidate generation: split the 64 bits into `bands` equal pieces and
exact-join on any piece — guarantees recall for Hamming distance < bands
(pigeonhole), the standard simhash banding."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simhash_signatures(docs: DataFrame, text_col: str = "doc_text") -> DataFrame:
    """docs -> (conv_id, simhash: long).  Token = whitespace word."""
    toks = docs.select(
        "conv_id", F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    aggs = [
        F.sum(
            F.when(F.expr(f"(h >> {i}) & 1") == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{i}")
        for i in range(64)
    ]
    bucketed = toks.groupBy("conv_id").agg(*aggs)
    # assemble the long from sign bits; bit 63 via two's complement
    expr = " + ".join(
        [f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)" for i in range(63)]
    )
    sig = F.expr(f"({expr}) + (CASE WHEN b63 > 0 THEN CAST(-9223372036854775808 AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
    return bucketed.select("conv_id", sig.alias("simhash"))


def hamming_distance(col_a, col_b):
    """Popcount of XOR via bit_count (Spark 3.3+ built-in)."""
    return F.expr(f"bit_count({col_a} ^ {col_b})")


def simhash_candidates(
    sigs: DataFrame, bands: int = 4, max_hamming: int = 3
) -> DataFrame:
    """(conv_id, simhash) -> (conv_a, conv_b, hamming ≤ max_hamming).

    Guaranteed recall for hamming < bands; band join is exact-key (narrow)."""
    width = 64 // bands
    pieces = sigs.select(
        "conv_id",
        "simhash",
        F.posexplode(
            F.array(*[
                F.expr(f"(simhash >> {i * width}) & {(1 << width) - 1}") for i in range(bands)
            ])
        ).alias("piece_idx", "piece"),
    )
    a = pieces.select(F.col("conv_id").alias("conv_a"), F.col("simhash").alias("sh_a"), "piece_idx", "piece")
    b = pieces.select(F.col("conv_id").alias("conv_b"), F.col("simhash").alias("sh_b"), "piece_idx", "piece")
    return (
        a.join(b, ["piece_idx", "piece"])
        .filter(F.col("conv_a") < F.col("conv_b"))
        .select("conv_a", "conv_b", F.expr("bit_count(sh_a ^ sh_b)").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
