"""ANN scale-path gates: SRP-bucketed near-pairs / top-k vs brute force.

The bucketed variants are the 100-TB plan of record; brute force
(`cosine_topk` / `embedding_near_pairs`) is the small-scale oracle.  Gates:

1. On planted near-dup families (cos ≥ ~0.99 — the regime a dedup threshold
   actually targets), the bucketed path has recall 1.0 vs brute force.
2. On the diffuse driver testdata at threshold 0.35 (max cos ≈ 0.5 — far
   below any dedup setting), recall stays ≥ 0.7 while generating a fraction
   of all-pairs candidates.
3. The bucketed plans contain no cartesian product.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deduputil_spark.operators.ann import (
    cosine_topk,
    embedding_near_pairs,
    lsh_bucketed_topk,
    srp_near_pairs,
)

DIM = 64


@pytest.fixture(scope="module")
def planted(spark):
    """40 families × (1 base + 2 near copies at cos ≥ ~0.99) + 80 random."""
    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    for _ in range(40):
        base = rng.standard_normal(DIM)
        base /= np.linalg.norm(base)
        for _ in range(3):
            v = base + 0.02 * rng.standard_normal(DIM)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(80):
        v = rng.standard_normal(DIM)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.cache()


def test_srp_near_pairs_full_recall_on_planted(spark, planted):
    brute = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_pairs(planted, threshold=0.9).collect()
    }
    assert len(brute) >= 40, "planted families must produce high-cos pairs"
    srp = {
        (r["id_a"], r["id_b"])
        for r in srp_near_pairs(planted, threshold=0.9, n_planes=4, n_tables=8, dim=DIM).collect()
    }
    missed = brute - srp
    assert not missed, f"bucketed path missed {len(missed)} of {len(brute)} high-cos pairs: {sorted(missed)[:5]}"
    assert srp <= brute, "bucketed result must be a subset of brute force (same scoring)"


def test_lsh_bucketed_topk_matches_brute_on_planted(spark, planted):
    queries = planted.filter(F.col("vec_id") % 3 == 0).limit(20)
    brute = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(planted, queries, k=2).collect()
    }
    bucketed = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in lsh_bucketed_topk(
            planted, queries, k=2, n_planes=4, n_tables=8, dim=DIM
        ).collect()
    }
    # the true top-2 of a planted family member are its family — high cos,
    # so the bucketed path must recover them exactly
    assert bucketed == brute


def test_srp_recall_on_diffuse_testdata(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    brute = {(r["id_a"], r["id_b"]) for r in embedding_near_pairs(emb, threshold=0.35).collect()}
    srp = {
        (r["id_a"], r["id_b"])
        for r in srp_near_pairs(emb, threshold=0.35, n_planes=4, n_tables=8, dim=DIM).collect()
    }
    recall = len(brute & srp) / len(brute)
    assert recall >= 0.7, f"diffuse recall {recall:.3f} < 0.7"
    assert srp <= brute


def test_bucketed_plans_have_no_cartesian_product(spark, planted):
    for df in (
        srp_near_pairs(planted, threshold=0.9, n_planes=4, n_tables=2, dim=DIM),
        lsh_bucketed_topk(planted, planted.limit(5), k=2, n_planes=4, n_tables=2, dim=DIM),
    ):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "Join Cross" not in plan and "CartesianProduct" not in plan, plan[:2000]
