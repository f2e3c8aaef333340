"""The flagship plan: transcripts → near-duplicate clusters, resumable.

Stage graph (each stage = one checkpoint table + one metrics row):

  assemble → chunk → blocks/meta (exact dedup)
                  ↘ shingle → minhash → bands → candidates → verify → clusters

Checkpointing (north rule: "every stage checkpoints per-partition lineage and
metrics … so the pipeline resumes mid-run"): a stage whose checkpoint exists
with the SAME config hash is read back, not recomputed — kill the driver after
stage k, rerun, and stages 1..k are loaded while k+1.. continue.  Metrics rows
record stage, rows_out, wall_ms, config_hash, partitions.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deduputil_spark.cache import track
from deduputil_spark.config import DedupConfig
from deduputil_spark.io import read_table, table_exists, write_table
from deduputil_spark.operators.assemble import assemble_documents
from deduputil_spark.operators.chunk import chunk_documents
from deduputil_spark.operators.cluster import connected_components
from deduputil_spark.operators.dedup import build_block_store, build_file_meta
from deduputil_spark.operators.lsh import candidate_pairs
from deduputil_spark.operators.minhash import lsh_bands, minhash_signatures, minhash_signatures_numpy
from deduputil_spark.operators.shingle import shingle_keys, shingles
from deduputil_spark.operators.verify import jaccard_verify, jaccard_verify_docs


@dataclass
class StageMetric:
    stage: str
    rows_out: int
    wall_ms: int
    partitions: int
    config_hash: str
    resumed: bool


@dataclass
class PipelineResult:
    clusters: DataFrame
    verified_pairs: DataFrame
    blocks: DataFrame
    file_meta: DataFrame
    metrics: list[StageMetric] = field(default_factory=list)


class Runner:
    """Checkpoint-aware stage runner."""

    def __init__(self, spark: SparkSession, cfg, checkpoint_dir: str | None):
        # cfg is duck-typed: anything with config_hash() (DedupConfig, _SuffixCfg)
        self.spark = spark
        self.cfg = cfg
        self.dir = checkpoint_dir
        self.metrics: list[StageMetric] = []
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)

    def _loc(self, stage: str) -> str:
        return os.path.join(self.dir, f"{stage}_{self.cfg.config_hash()}")

    def run(self, stage: str, build, count_rows: bool = True) -> DataFrame:
        t0 = time.monotonic()
        resumed = False
        if self.dir and table_exists(self.spark, self._loc(stage)):
            df = read_table(self.spark, self._loc(stage))
            resumed = True
        else:
            df = build()
            if self.dir:
                write_table(df, self._loc(stage))
                df = read_table(self.spark, self._loc(stage))
            else:
                # no checkpoint table -> persist, or every downstream stage
                # (and this count) recomputes the entire upstream lineage
                df = track(df)
        rows = df.count() if count_rows else -1
        self.metrics.append(
            StageMetric(
                stage=stage,
                rows_out=rows,
                wall_ms=int((time.monotonic() - t0) * 1000),
                partitions=df.rdd.getNumPartitions() if count_rows else -1,
                config_hash=self.cfg.config_hash(),
                resumed=resumed,
            )
        )
        return df

    def dump_metrics(self) -> None:
        if not self.dir:
            return
        path = os.path.join(self.dir, "metrics.jsonl")
        with open(path, "a") as f:
            for m in self.metrics:
                f.write(json.dumps(m.__dict__) + "\n")


def run_pipeline_lean(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: DedupConfig | None = None,
) -> PipelineResult:
    """Production dataflow shape: no per-stage counts/checkpoints — one lazy
    plan with only the persists correctness requires (docs feeds 3 consumers,
    candidate pairs feed 3 joins, verified feeds the CC fixpoint).  This is
    what runs when you just want clusters written to a table; the metered
    `run_pipeline` is for resumable checkpointed runs."""
    cfg = cfg or DedupConfig()
    docs = track(assemble_documents(transcripts))
    # persist the COMPACT signature table (one row/doc) instead of the
    # bands×-bigger exploded band table; bands re-derive from the cache with
    # one JVM explode per consumer (see candidate_pairs persist_bands)
    sigs = track(minhash_signatures_numpy(docs, cfg))
    bands = lsh_bands(sigs, cfg, band_key="xxhash")  # no per-band string build
    cands = track(candidate_pairs(bands, cfg, persist_bands=False))
    verified = track(jaccard_verify_docs(cands, docs, cfg.shingle_k, threshold=cfg.jaccard_threshold))
    clusters = connected_components(
        verified.select("conv_a", "conv_b"), cfg.max_cc_iterations,
        all_vertices=docs.select("conv_id"),
    )
    return PipelineResult(clusters=clusters, verified_pairs=verified, blocks=None, file_meta=None)


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: DedupConfig | None = None,
    checkpoint_dir: str | None = None,
    minhash_family: str = "xxhash",
    with_exact_dedup: bool = True,
) -> PipelineResult:
    cfg = cfg or DedupConfig()
    r = Runner(spark, cfg, checkpoint_dir)

    docs = r.run("assemble", lambda: assemble_documents(transcripts))
    track(docs)

    if with_exact_dedup:
        chunks = r.run("chunks", lambda: chunk_documents(docs, cfg))
        blocks = r.run("blocks", lambda: build_block_store(chunks))
        meta = r.run("file_meta", lambda: build_file_meta(chunks, blocks))
    else:
        chunks = blocks = meta = None

    # Signature path choices (fast→oracle-exact):
    #  - "numpy": vectorized mapInPandas minhash, NO exploded-shingle shuffle
    #    at all (the scale default);
    #  - "keys"/"xxhash": relational minhash over a lazy narrow shingle map
    #    (min-over-multiset ⇒ no distinct() shuffle needed);
    #  - "md5": bit-identical to the DuckDB oracle (correctness runs).
    if minhash_family == "numpy":
        sigs = r.run("minhash", lambda: minhash_signatures_numpy(docs, cfg))
    else:
        if minhash_family == "keys":
            sh = shingle_keys(docs, cfg.shingle_k)
        else:
            sh = shingles(docs, cfg.shingle_k, distinct=False)
        sigs = r.run("minhash", lambda: minhash_signatures(sh, cfg, family=minhash_family))
    bands = r.run("bands", lambda: lsh_bands(sigs, cfg))
    if cfg.max_pair_degree is None:
        cands = r.run("candidates", lambda: candidate_pairs(bands, cfg))
    else:
        # degree cap ON: meter the raw and capped candidate sets as separate
        # stages and emit the dropped-edge count as its own metrics row —
        # thinning is never silent (the contract lsh.cap_pair_degree promises)
        from dataclasses import replace as _replace

        from deduputil_spark.operators.lsh import cap_pair_degree

        raw = r.run("candidates_raw", lambda: candidate_pairs(bands, _replace(cfg, max_pair_degree=None)))
        cands = r.run("candidates", lambda: cap_pair_degree(raw, cfg.max_pair_degree))
        raw_n, cap_n = r.metrics[-2].rows_out, r.metrics[-1].rows_out
        r.metrics.append(
            StageMetric(
                stage="degree_cap_dropped",
                rows_out=raw_n - cap_n,
                wall_ms=0,
                partitions=-1,
                config_hash=cfg.config_hash(),
                resumed=False,
            )
        )
    # verify prunes DOCS before exploding shingles: cost scales with the
    # candidate set, not the corpus
    verified = r.run(
        "verified",
        lambda: jaccard_verify_docs(cands, docs, cfg.shingle_k, threshold=cfg.jaccard_threshold),
    )
    clusters = r.run(
        "clusters",
        lambda: connected_components(
            verified.select("conv_a", "conv_b"),
            cfg.max_cc_iterations,
            all_vertices=docs.select("conv_id"),
        ),
    )
    r.dump_metrics()
    return PipelineResult(
        clusters=clusters,
        verified_pairs=verified,
        blocks=blocks,
        file_meta=meta,
        metrics=r.metrics,
    )


@dataclass
class ExactSubstringResult:
    clean_docs: DataFrame
    spans: DataFrame
    metrics: list[StageMetric] = field(default_factory=list)


class _SuffixCfg:
    """Duck-typed config for Runner: hashes the exact-substring knobs so a
    checkpoint from a different (L, method) is never read back."""

    def __init__(self, L: int, method: str):
        self.L, self.method = int(L), method

    def config_hash(self) -> str:
        import hashlib

        return hashlib.md5(f"suffix:{self.L}:{self.method}".encode()).hexdigest()[:12]


def run_exact_substring(
    spark: SparkSession,
    docs: DataFrame,
    L: int = 20,
    method: str = "rolling",
    checkpoint_dir: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ExactSubstringResult:
    """The exact-substring dedup plan (Lee et al. ExactSubstr): corpus-wide
    duplicated spans → cleaned corpus, as two resumable metered stages
    (same Runner/checkpoint semantics as `run_pipeline`: kill after the
    spans stage, rerun, and the spans table is read back, not recomputed).
    `method="rolling"` is the scale path (8 bytes/position on the wire,
    exact gram re-verification)."""
    from deduputil_spark.operators.suffixarray import duplicated_spans, strip_duplicated_spans

    r = Runner(spark, _SuffixCfg(L, method), checkpoint_dir)
    spans = r.run("suffix_spans", lambda: duplicated_spans(docs, L, method, id_col, text_col))
    clean = r.run(
        "suffix_strip",
        lambda: strip_duplicated_spans(docs, L, method, id_col, text_col, spans=spans),
    )
    r.dump_metrics()
    return ExactSubstringResult(clean_docs=clean, spans=spans, metrics=r.metrics)


def pair_recall(verified_or_clusters: DataFrame, truth_pairs: DataFrame, via_clusters: bool = True) -> float:
    """Planted-pair recall (BASELINE.json metric).  `truth_pairs` rows with
    kind != collision_nonpair must co-cluster (or appear among verified pairs)."""
    truth = truth_pairs.filter(F.col("kind") != "collision_nonpair")
    n_truth = truth.count()
    if n_truth == 0:
        return 1.0
    if via_clusters:
        lab = verified_or_clusters  # (conv_id, cluster_id)
        la = lab.select(F.col("conv_id").alias("conv_a"), F.col("cluster_id").alias("ca"))
        lb = lab.select(F.col("conv_id").alias("conv_b"), F.col("cluster_id").alias("cb"))
        hit = truth.join(la, "conv_a").join(lb, "conv_b").filter(F.col("ca") == F.col("cb")).count()
    else:
        hit = truth.join(verified_or_clusters, ["conv_a", "conv_b"], "left_semi").count()
    return hit / n_truth
