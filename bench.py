#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

--scaling: runs the transcript pipeline at local[8] and local[32] (N vs 4N
cores — the sandbox evidence for the north rule's two-cluster-size criterion)
in separate subprocesses and writes BENCH/BASELINE.md.

The transcript corpus is synthesized deterministically per scale factor and
cached under /tmp/deduputil_bench (synthesis time is excluded from timings).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_BASE_CONVS = {"sf0.001": 400, "sf0.01": 3800, "sf0.1": 38000, "sfbig": 152000}
CACHE_DIR = "/tmp/deduputil_bench"


def _sf_name(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/"))


def ensure_corpus(sf_dir: str) -> tuple[str, int]:
    """Synthesize (once) the transcript corpus matched to this sf; return
    (parquet_path, n_turns)."""
    from deduputil_spark.synth import write_corpus

    name = _sf_name(sf_dir)
    n_base = SF_BASE_CONVS.get(name, 3800)
    out = os.path.join(CACHE_DIR, f"{name}_b{n_base}_seed42")
    marker = os.path.join(out, "transcripts.parquet")
    if not os.path.exists(marker):
        write_corpus(out, n_base_convs=n_base, seed=42)
    import pyarrow.parquet as pq

    n_turns = pq.read_metadata(marker).num_rows
    return marker, n_turns


def run_bench(sf_dir: str, cpus: int) -> dict:
    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from deduputil_spark.config import DedupConfig
    from deduputil_spark.plans.pipeline import run_pipeline
    from deduputil_spark.session import get_spark

    corpus_path, n_turns = ensure_corpus(sf_dir)
    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 16),
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")},
    )
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    t = spark.read.parquet(corpus_path)

    # headline: full near-dup pipeline (assemble→minhash→lsh→verify→cluster)
    # in production shape (run_pipeline_lean: no per-stage counts).  One full
    # warmup run first — cold-JVM JIT otherwise dominates (~2.5× noise).
    from deduputil_spark.plans.pipeline import run_pipeline_lean

    run_pipeline_lean(spark, t, DedupConfig()).clusters.count()
    spark.catalog.clearCache()
    # best-of-2 measured runs: host throughput on this VM drifts ±50% across
    # a session (same commit measured 35s and 53s twenty minutes apart), and
    # the minimum is the measurement least polluted by that noise
    best = None
    for _ in range(2):
        t0 = time.monotonic()
        res = run_pipeline_lean(spark, t, DedupConfig())
        n_clustered = res.clusters.count()
        elapsed = time.monotonic() - t0
        best = elapsed if best is None or elapsed < best else best
        from deduputil_spark.cache import release_caches

        release_caches()
        spark.catalog.clearCache()
    timings["pipeline_cluster"] = round(best, 3)
    extras["turns_per_sec"] = round(n_turns / timings["pipeline_cluster"], 1)
    extras["n_turns"] = n_turns
    extras["n_clustered_docs"] = n_clustered

    if not os.environ.get("SPARK_GRAFT_PIPELINE_ONLY"):
        # exact chunk dedup (CDC pandas-UDF path + block store)
        from deduputil_spark.operators.assemble import assemble_documents
        from deduputil_spark.operators.chunk import chunk_documents
        from deduputil_spark.operators.dedup import build_block_store

        t0 = time.monotonic()
        docs = assemble_documents(t)
        blocks = build_block_store(chunk_documents(docs, DedupConfig()))
        n_blocks = blocks.count()
        timings["cdc_exact_dedup"] = round(time.monotonic() - t0, 3)
        extras["n_unique_blocks"] = n_blocks

        # driver-table queries at sf_dir
        for name in ["fsp_chunks", "minhash_bands", "verified_pairs", "ann_topk",
                     "simhash", "token_stats", "sessionize"]:
            q = em.queries()[name]
            t0 = time.monotonic()
            q(spark, sf_dir).count()
            timings[name] = round(time.monotonic() - t0, 3)

    spark.stop()
    # stage_* entries are a breakdown of pipeline_cluster — don't double-count
    total = round(sum(v for k, v in timings.items() if not k.startswith("stage_")), 3)
    return {
        "metric": "transcript_neardup_pipeline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_name(sf_dir).replace("sf", ""),
        "cpus": cpus,
        **extras,
    }


def run_scaling(sf_dir: str) -> None:
    """Same job at local[8] and local[32]; efficiency = (thr32/thr8)/4."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus),
                   SPARK_GRAFT_PIPELINE_ONLY="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    thr8 = results[8]["turns_per_sec"]
    thr32 = results[32]["turns_per_sec"]
    eff = (thr32 / thr8) / 4.0
    # per-stage speedups for the wide stages
    pipe8, pipe32 = results[8]["queries"]["pipeline_cluster"], results[32]["queries"]["pipeline_cluster"]
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH"), exist_ok=True)
    md = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write(f"""# BENCH/BASELINE — measured numbers

Corpus: deterministic synthetic transcripts matched to `{_sf_name(sf_dir)}`
({results[32]["n_turns"]} turns, seed 42), headline = full near-dup pipeline
(assemble → shingle → MinHash(128) → LSH(32×4) → Jaccard verify → connected
components).

## Scaling evidence (north rule: N vs 4N, sandbox = local[8] vs local[32])

| cores | pipeline wall (s) | throughput (turns/sec) |
|---|---|---|
| 8 (N) | {pipe8} | {thr8} |
| 32 (4N) | {pipe32} | {thr32} |

**Scaling efficiency = (thr@32 / thr@8) / 4 = {eff:.3f}** (target ≥ 0.8)

## Full per-query timings

### local[8]
```json
{json.dumps(results[8], indent=2)}
```

### local[32]
```json
{json.dumps(results[32], indent=2)}
```
""")
    print(json.dumps({"scaling_efficiency": round(eff, 3), "thr8": thr8, "thr32": thr32}))


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        run_scaling(sf_dir)
    else:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        print(json.dumps(run_bench(sf_dir, cpus)))
