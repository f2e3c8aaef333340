"""Candidate-pair verification — the "strong check" tier.

Three verifiers, mirroring the reference's similarity semantics:

- `jaccard_verify` — exact set Jaccard over shingles, relational (join on
  shingle equality + set-size aggregate).  This is the pipeline gate.
- `bsim_similarity` — the reference's weighted block-frequency formula
  sim = 2·Σ len·min(n1,n2) / Σ len·(n1+n2)  (/root/reference/src/bsim.c:277-294)
  over chunk-md5 multisets, relational.
- `lcs_similarity` — the reference's ordered LCS similarity
  (/root/reference/src/bsim.c:177-275): O(n·m) DP over the two documents'
  chunk-hash sequences, run ONLY on surviving candidate pairs via a
  vectorized-batch pandas UDF (quadratic work must never touch the corpus).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deduputil_spark.cache import track


_KSET_SCHEMA = "conv_id string, kset array<bigint>"


def _kgram_sets(docs: DataFrame, k: int, text_col: str = "doc_text") -> DataFrame:
    """(conv_id, kset array<long>) — per-doc UNIQUE k-gram hash set, one row
    per doc (numpy via mapInArrow, zero-copy off the Arrow UTF-8 buffer; same
    set definition as the numpy minhash)."""
    from deduputil_spark.operators.minhash import (
        _kgrams_from_hashes,
        batch_token_hashes,
        token_hashes_from_buffer,
        utf8_buffer_view,
    )

    def run(batches):
        import pyarrow as pa

        for batch in batches:
            names = batch.schema.names
            cid = batch.column(names.index("conv_id"))
            txt = batch.column(names.index(text_col))
            view = utf8_buffer_view(txt)
            if view is not None:
                th, offs = token_hashes_from_buffer(*view)
            else:
                th, offs = batch_token_hashes([t if t is not None else "" for t in txt.to_pylist()])
            sets = [_kgrams_from_hashes(th[offs[i] : offs[i + 1]], k) for i in range(len(txt))]
            bounds = np.zeros(len(sets) + 1, dtype=np.int64)
            np.cumsum(np.fromiter(map(len, sets), dtype=np.int64, count=len(sets)), out=bounds[1:])
            flat = np.concatenate(sets) if sets else np.zeros(0, dtype=np.int64)
            # int32 list offsets silently wrap past 2^31 total entries; a batch
            # that large would already have exhausted memory, but fail loudly
            # rather than build corrupt offsets (ADVICE r3)
            if bounds[-1] >= (1 << 31):
                raise ValueError(f"kset batch overflows int32 list offsets ({int(bounds[-1])} entries)")
            kset = pa.ListArray.from_arrays(bounds.astype(np.int32), pa.array(flat, type=pa.int64()))
            yield pa.RecordBatch.from_arrays([cid.cast(pa.string()), kset], names=["conv_id", "kset"])

    return docs.select("conv_id", text_col).mapInArrow(run, schema=_KSET_SCHEMA)


def jaccard_verify_docs(
    pairs: DataFrame,
    docs: DataFrame,
    k: int = 5,
    threshold: float | None = None,
) -> DataFrame:
    """Exact Jaccard verify with NO exploded-shingle shuffle.

    Candidate docs are pruned (semi-join; AQE broadcasts when small) BEFORE any tokenization,
    each candidate doc becomes ONE row carrying its k-gram hash set as an
    array, and |A∩B| is a JVM array_intersect per pair — so verification
    shuffles O(candidate_docs · set_size) longs once, and never touches
    non-candidate documents."""
    # no .distinct() on members: LEFT SEMI dedups by construction, so the
    # distinct's extra exchange+aggregate bought nothing (one stage saved)
    members = (
        pairs.select(F.col("conv_a").alias("conv_id"))
        .unionByName(pairs.select(F.col("conv_b").alias("conv_id")))
    )
    # no forced broadcast: distinct pair members can reach tens of millions at
    # corpus scale — let AQE pick broadcast vs shuffled semi-join by size
    cand_docs = docs.join(members, "conv_id", "left_semi")
    # persist feeds both join sides of the same returned plan; registered with
    # cache.track so the caller releases it after materializing (see cache.py)
    ksets = track(_kgram_sets(cand_docs, k))
    a = ksets.select(F.col("conv_id").alias("conv_a"), F.col("kset").alias("ka"))
    b = ksets.select(F.col("conv_id").alias("conv_b"), F.col("kset").alias("kb"))
    out = (
        pairs.join(a, "conv_a")
        .join(b, "conv_b")
        .select(
            "conv_a",
            "conv_b",
            F.size(F.array_intersect("ka", "kb")).alias("inter"),
            (F.size("ka") + F.size("kb")).alias("nsum"),
        )
        .select(
            "conv_a",
            "conv_b",
            (F.col("inter") / (F.col("nsum") - F.col("inter"))).alias("jaccard"),
        )
    )
    if threshold is not None:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def jaccard_verify(
    pairs: DataFrame, shingle_df: DataFrame, threshold: float | None = None
) -> DataFrame:
    """(conv_a, conv_b) × (conv_id, shingle) -> (conv_a, conv_b, jaccard).

    |A∩B| via join on shingle; |A∪B| = |A|+|B|-|A∩B|.  Filter at `threshold`.

    SCALE: the shingle table is first SEMI-PRUNED to convs that appear in a
    candidate pair (semi-join — pairs are small next to the corpus, AQE
    broadcasts when they fit), and only then deduplicated.  Verification cost therefore scales with the
    candidate set, never with the corpus.  `shingle_df` may be the raw
    (non-distinct) narrow shingle map.
    """
    members = (
        pairs.select(F.col("conv_a").alias("conv_id"))
        .unionByName(pairs.select(F.col("conv_b").alias("conv_id")))
    )  # no .distinct(): the LEFT SEMI below dedups by construction
    # persist: pruned feeds sizes + both join sides; without it the prune +
    # distinct shuffle re-executes three times.  Shingles are reduced to
    # 64-bit xxhash keys first — the distinct + equi-joins then shuffle longs
    # instead of ~50-char strings (collision odds 2^-64·|set|² are negligible
    # for set-size arithmetic).
    # semi-prune without a forced broadcast (unbounded cardinality; AQE decides)
    pruned = track(
        shingle_df.join(members, "conv_id", "left_semi")
        .select("conv_id", F.xxhash64("shingle").alias("shingle"))
        .distinct()
    )
    return _jaccard_on_sets(pairs, pruned, threshold)


def _jaccard_on_sets(pairs: DataFrame, pruned: DataFrame, threshold: float | None) -> DataFrame:
    """Shared core: (conv_id, shingle) DISTINCT sets -> pair Jaccard."""
    sizes = pruned.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
    sa = pruned.select(F.col("conv_id").alias("conv_a"), "shingle")
    sb = pruned.select(F.col("conv_id").alias("conv_b"), "shingle")
    inter = (
        pairs.join(sa, "conv_a")
        .join(sb, ["conv_b", "shingle"])
        .groupBy("conv_a", "conv_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        pairs.join(inter, ["conv_a", "conv_b"], "left")
        .fillna(0, subset=["inter"])
        .join(sizes.select(F.col("conv_id").alias("conv_a"), F.col("n").alias("na")), "conv_a")
        .join(sizes.select(F.col("conv_id").alias("conv_b"), F.col("n").alias("nb")), "conv_b")
        .select(
            "conv_a",
            "conv_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
    )
    if threshold is not None:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def bsim_components(pairs: DataFrame, chunks: DataFrame) -> DataFrame:
    """Reference bsim J1 as INTEGER-EXACT components per pair:
    (w_inter = Σ len·min(n_a, n_b), wsum = Σ_a len·n_a + Σ_b len·n_b);
    sim = 2·w_inter / wsum (/root/reference/src/bsim.c:277-294)."""
    freq = (
        chunks.filter(~F.col("is_tail"))
        .groupBy("conv_id", "md5")
        .agg(F.count(F.lit(1)).alias("n"), F.first("chunk_len").alias("len"))
    )
    tot = freq.groupBy("conv_id").agg(F.sum(F.col("n") * F.col("len")).alias("total"))
    fa = freq.select(F.col("conv_id").alias("conv_a"), "md5", F.col("n").alias("na"), "len")
    fb = freq.select(F.col("conv_id").alias("conv_b"), "md5", F.col("n").alias("nb"))
    inter = (
        pairs.join(fa, "conv_a")
        .join(fb, ["conv_b", "md5"])
        .groupBy("conv_a", "conv_b")
        .agg(F.sum(F.least("na", "nb") * F.col("len")).alias("w_inter"))
    )
    return (
        pairs.join(inter, ["conv_a", "conv_b"], "left")
        .fillna(0, subset=["w_inter"])
        .join(tot.select(F.col("conv_id").alias("conv_a"), F.col("total").alias("ta")), "conv_a")
        .join(tot.select(F.col("conv_id").alias("conv_b"), F.col("total").alias("tb")), "conv_b")
        .select(
            "conv_a",
            "conv_b",
            F.col("w_inter").cast("long").alias("w_inter"),
            (F.col("ta") + F.col("tb")).cast("long").alias("wsum"),
        )
    )


def bsim_similarity(pairs: DataFrame, chunks: DataFrame) -> DataFrame:
    """Reference bsim J1: per-pair weighted multiset similarity over chunk md5s.

    chunk frequency tables per doc (md5 -> count, len), then
    sim = 2·Σ len·min(n_a, n_b) / (Σ_a len·n_a + Σ_b len·n_b).
    """
    return bsim_components(pairs, chunks).select(
        "conv_a",
        "conv_b",
        (F.lit(2) * F.col("w_inter") / F.col("wsum")).alias("bsim"),
    )


_LCS_SCHEMA = T.StructType(
    [
        T.StructField("conv_a", T.StringType()),
        T.StructField("conv_b", T.StringType()),
        T.StructField("lcs_sim", T.DoubleType()),
    ]
)


_DIAG, _UP, _LEFT = 2, 1, 0


def _lcs_weighted(seq_a: np.ndarray, len_a: np.ndarray, seq_b: np.ndarray, len_b: np.ndarray) -> float:
    lcs_bytes, sim_union = _lcs_components(seq_a, len_a, seq_b, len_b)
    return (2.0 * lcs_bytes / sim_union) if sim_union else 0.0


def _lcs_components(
    seq_a: np.ndarray, len_a: np.ndarray, seq_b: np.ndarray, len_b: np.ndarray
) -> tuple[int, int]:
    """Exact transliteration of the reference LCS similarity
    (/root/reference/src/bsim.c:177-275 + similarity_detect :284-294),
    returning the INTEGER components (lcs_bytes, sim_union):

    1. unweighted LCS DP over the two chunk-hash sequences (match = +1),
       with the reference's tie-breaking (LEFT overrides UP overrides DIAG,
       each with >=),
    2. backtrack the R matrix summing the byte length of each matched hash
       (length = first-seen occurrence, file-1-first, mirroring hash_checkin),
    3. sim = 2·lcs_bytes / Σ len·(n1+n2).

    DP rows are numpy-vectorized (the cur[j-1] dependency resolves to a
    running max because LCS rows are monotone); backtrack is O(n+m).
    """
    n, m = len(seq_a), len(seq_b)
    # union weight uses first-seen lengths, file-1 first (hash_checkin order)
    lens: dict = {}
    for s, l in zip(seq_a, len_a):
        lens.setdefault(s, int(l))
    for s, l in zip(seq_b, len_b):
        lens.setdefault(s, int(l))
    sim_union = int(len_a.sum()) + int(len_b.sum())  # Σ len·(n1+n2) with len≡first-seen
    if sim_union == 0 or n == 0 or m == 0:
        return 0, sim_union
    prev = np.zeros(m + 1, dtype=np.int32)
    R = np.empty((n + 1, m + 1), dtype=np.int8)
    R[:, 0] = _UP
    R[0, :] = _LEFT
    for i in range(1, n + 1):
        eq = seq_a[i - 1] == seq_b
        cand = prev[:-1] + eq.astype(np.int32)  # S[i-1][j-1] (+1 on match)
        up = prev[1:]
        base = np.where(up >= cand, up, cand)
        cur_tail = np.maximum.accumulate(base)  # resolves the LEFT running max
        # R with reference priority: LEFT (>=) beats UP (>=) beats DIAG
        left = np.concatenate(([0], cur_tail[:-1]))
        r = np.where(eq, _DIAG, _UP)  # NEITHER is unreachable (up >= diag always)
        r = np.where(up >= cand, _UP, r)
        r = np.where(left >= np.maximum(up, cand), _LEFT, r)
        R[i, 1:] = r
        prev = np.concatenate(([0], cur_tail))
    # backtrack
    ii, jj = n, m
    lcs_bytes = 0
    while ii > 0 or jj > 0:
        rr = R[ii, jj]
        if rr == _DIAG:
            ii -= 1
            jj -= 1
            lcs_bytes += lens.get(seq_a[ii], 0)
        elif rr == _UP:
            ii -= 1
        else:
            jj -= 1
    return lcs_bytes, sim_union


_LCS_COMPONENT_SCHEMA = T.StructType(
    [
        T.StructField("conv_a", T.StringType()),
        T.StructField("conv_b", T.StringType()),
        T.StructField("lcs_bytes", T.LongType()),
        T.StructField("union_bytes", T.LongType()),
    ]
)


def lcs_verify_components(pairs_with_seqs: DataFrame) -> DataFrame:
    """Integer-exact J2: (lcs_bytes, union_bytes) per pair;
    sim = 2·lcs_bytes / union_bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lb, ub = [], []
            for ra, rla, rb, rlb in zip(pdf["seq_a"], pdf["lens_a"], pdf["seq_b"], pdf["lens_b"]):
                sa = np.asarray(ra, dtype=object)
                sb = np.asarray(rb, dtype=object)
                la = np.asarray(rla, dtype=np.int64)
                lbn = np.asarray(rlb, dtype=np.int64)
                x, y = _lcs_components(sa, la, sb, lbn)
                lb.append(x)
                ub.append(y)
            yield pd.DataFrame(
                {"conv_a": pdf["conv_a"], "conv_b": pdf["conv_b"], "lcs_bytes": lb, "union_bytes": ub}
            )

    return pairs_with_seqs.mapInPandas(run, schema=_LCS_COMPONENT_SCHEMA)


def lcs_verify(pairs_with_seqs: DataFrame) -> DataFrame:
    """pairs(conv_a, conv_b, seq_a array<str>, lens_a array<int>, seq_b, lens_b)
    -> (conv_a, conv_b, lcs_sim).  Pandas-batched; only run post-LSH."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sims = []
            for ra, rla, rb, rlb in zip(pdf["seq_a"], pdf["lens_a"], pdf["seq_b"], pdf["lens_b"]):
                sa = np.asarray(ra, dtype=object)
                sb = np.asarray(rb, dtype=object)
                la = np.asarray(rla, dtype=np.int64)
                lb = np.asarray(rlb, dtype=np.int64)
                sims.append(_lcs_weighted(sa, la, sb, lb))
            yield pd.DataFrame(
                {"conv_a": pdf["conv_a"], "conv_b": pdf["conv_b"], "lcs_sim": sims}
            )

    return pairs_with_seqs.mapInPandas(run, schema=_LCS_SCHEMA)


def pair_chunk_sequences(pairs: DataFrame, chunks: DataFrame) -> DataFrame:
    """Attach ordered chunk-md5 sequences + lengths to each pair (input to
    `lcs_verify`)."""
    seqs = (
        chunks.filter(~F.col("is_tail"))
        .groupBy("conv_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "md5", "chunk_len"))),
                lambda s: s["md5"],
            ).alias("seq"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "md5", "chunk_len"))),
                lambda s: s["chunk_len"],
            ).alias("lens"),
        )
    )
    a = seqs.select(F.col("conv_id").alias("conv_a"), F.col("seq").alias("seq_a"), F.col("lens").alias("lens_a"))
    b = seqs.select(F.col("conv_id").alias("conv_b"), F.col("seq").alias("seq_b"), F.col("lens").alias("lens_b"))
    return pairs.join(a, "conv_a").join(b, "conv_b")
