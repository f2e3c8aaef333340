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
    """(conv_id, shingle) -> (conv_id, sig array<string|long>[num_perm]).

    families: "md5" (DuckDB-oracle-exact), "xxhash" (fast path over string
    shingles), "keys" (fastest: numeric skey column from shingle_keys()).
    """
    cfg = cfg or DedupConfig()
    p = cfg.num_perm
    if family == "md5":
        base = shingle_df
        aggs = [
            F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"h{i}")
            for i in range(p)
        ]
    elif family in ("xxhash", "keys"):
        a, b = _coeffs(p)
        src = F.col("skey") if family == "keys" else F.col("shingle")
        # materialize the base hash as a column so the num_perm aggregates
        # reuse it instead of re-hashing per permutation
        base = shingle_df.select("conv_id", F.pmod(F.xxhash64(src), F.lit(MERSENNE_P)).alias("_h"))
        aggs = [
            F.min(F.pmod(F.lit(a[i]) * F.col("_h") + F.lit(b[i]), F.lit(MERSENNE_P))).alias(f"h{i}")
            for i in range(p)
        ]
    else:
        raise ValueError(f"unknown minhash family {family!r}")
    sig = base.groupBy("conv_id").agg(*aggs)
    return sig.select("conv_id", F.array(*[F.col(f"h{i}") for i in range(p)]).alias("sig"))


_SIG_SCHEMA = "conv_id string, sig array<bigint>"
KGRAM_P = (1 << 57) - 13


def _kgrams_from_hashes(th: np.ndarray, k: int) -> np.ndarray:
    """Unique k-gram keys from a doc's token-hash array (polynomial fold)."""
    if len(th) == 0:
        return np.zeros(0, dtype=np.int64)
    if len(th) >= k:
        kg = th[: len(th) - k + 1].copy()
        for j in range(1, k):
            kg = (kg * 31 + th[j : len(th) - k + 1 + j]) % KGRAM_P
    else:
        kg = th[:1].copy()
        for j in range(1, len(th)):
            kg = (kg * 31 + th[j : j + 1]) % KGRAM_P
    return np.unique(kg)


def batch_token_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """Hash EVERY token of a batch of texts in one vectorized pass.

    Returns (flat token-hash array reduced mod KGRAM_P, doc boundary offsets
    of length len(texts)+1).  One pandas hash call per Arrow batch — per-doc
    Series construction otherwise dominates for short documents."""
    import pandas as pd

    tok_lists = [t.split() for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists))
    offsets = np.concatenate(([0], np.cumsum(lens)))
    flat: list[str] = [tok for toks in tok_lists for tok in toks]
    if flat:
        th = pd.util.hash_pandas_object(pd.Series(flat), index=False).to_numpy().astype(np.int64)
        th = np.abs(th) % KGRAM_P
    else:
        th = np.zeros(0, dtype=np.int64)
    return th, offsets


def doc_kgram_hashes(text: str, k: int) -> np.ndarray:
    """Unique k-gram hash keys of one document (single-doc convenience;
    batch paths use batch_token_hashes + _kgrams_from_hashes directly).
    Shared set definition for numpy minhash AND the array Jaccard verifier."""
    th, _ = batch_token_hashes([text])
    return _kgrams_from_hashes(th, k)


def minhash_signatures_numpy(
    docs: DataFrame, cfg: DedupConfig | None = None, text_col: str = "doc_text", seed: int = 12345
) -> DataFrame:
    """Vectorized-numpy MinHash over assembled documents (mapInPandas).

    NARROW — no exploded-shingle shuffle at all: tokens are hashed with a
    vectorized polynomial, k-gram keys are a shifted-add fold, and the
    num_perm universal rehashes are one (num_perm × m) matrix min per doc.
    This is the scale path: signature cost is pure map CPU, and the only
    shuffle in the whole signature→band flow is the final band exchange.
    """
    import pandas as pd

    cfg = cfg or DedupConfig()
    k = cfg.shingle_k
    p = cfg.num_perm
    rng = np.random.default_rng(seed)
    A = rng.integers(1, MERSENNE_P, size=p, dtype=np.int64)[:, None]
    B = rng.integers(0, MERSENNE_P, size=p, dtype=np.int64)[:, None]

    BLK = 192  # num_perm×BLK int64 intermediate ≈ 190 KB — stays L2-resident
    # (the naive num_perm×m matrix is ~1 MB/doc; 32 concurrent workers then
    # thrash the shared L3 and the stage goes memory-bound instead of CPU)

    def sig_batches(batches):
        for pdf in batches:
            texts = list(pdf[text_col])
            th, offs = batch_token_hashes(texts)
            out = []
            for i, cid in enumerate(pdf["conv_id"]):
                u = _kgrams_from_hashes(th[offs[i] : offs[i + 1]], k) % MERSENNE_P
                if len(u) == 0:
                    out.append((cid, [0] * p))
                    continue
                sig = np.full(p, MERSENNE_P, dtype=np.int64)
                for s in range(0, len(u), BLK):
                    blk = u[s : s + BLK]
                    cand = (A * blk[None, :] + B) % MERSENNE_P
                    np.minimum(sig, cand.min(axis=1), out=sig)
                out.append((cid, sig.tolist()))
            yield pd.DataFrame(out, columns=["conv_id", "sig"])

    return docs.select("conv_id", text_col).mapInPandas(sig_batches, schema=_SIG_SCHEMA)


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
