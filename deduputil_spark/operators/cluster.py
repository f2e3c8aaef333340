"""Iterative connected components over verified duplicate pairs.

Driver-side fixpoint loop of min-label propagation (no GraphFrames
dependency): each iteration joins current labels across the edge list and
takes the elementwise min.  Cluster ids are canonical — min(conv_id) in the
component — so results are deterministic under any parallelism (SURVEY.md
§7.4.4).  Near-dup components are clique-dense (LSH emits most intra-cluster
pairs directly), so convergence is typically 2-4 iterations; the loop is
bounded by cfg.max_cc_iterations and localCheckpoints every iteration to cut
lineage (SURVEY.md §4 custom-work item 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 20,
    all_vertices: DataFrame | None = None,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """pairs(conv_a, conv_b) -> (conv_id, cluster_id).

    If `all_vertices` (a conv_id DataFrame) is given, vertices without edges
    come back as singletons (cluster_id = conv_id).

    Hybrid execution: below `driver_threshold` edges the component graph fits
    trivially on the driver — path-compressed union-find there beats N Spark
    jobs of fixed overhead by 10-30×.  Above it, the distributed min-label
    loop runs (each iteration one join + aggregate, checkpointed).  Verified
    duplicate edges are a sliver of corpus size even at 10^12 turns, but the
    distributed path keeps the pipeline total when they aren't.
    """
    n_edges = pairs.count()
    if n_edges <= driver_threshold:
        return _driver_union_find(pairs, all_vertices)
    edges = (
        pairs.select(F.col("conv_a").alias("src"), F.col("conv_b").alias("dst"))
        .unionByName(pairs.select(F.col("conv_b").alias("src"), F.col("conv_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("conv_id")).distinct()
        .withColumn("cluster_id", F.col("conv_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        nbr_min = (
            edges.join(labels.withColumnRenamed("conv_id", "src"), "src")
            .groupBy("dst")
            .agg(F.min("cluster_id").alias("nbr_min"))
            .withColumnRenamed("dst", "conv_id")
        )
        new_labels = (
            labels.join(nbr_min, "conv_id", "left")
            .select(
                "conv_id",
                F.least(F.col("cluster_id"), F.coalesce("nbr_min", F.col("cluster_id"))).alias(
                    "new_cluster_id"
                ),
                "cluster_id",
            )
        )
        changed = new_labels.filter(F.col("new_cluster_id") != F.col("cluster_id")).count()
        labels = (
            new_labels.select("conv_id", F.col("new_cluster_id").alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        if changed == 0:
            break
    if all_vertices is not None:
        labels = (
            all_vertices.select("conv_id")
            .join(labels, "conv_id", "left")
            .withColumn("cluster_id", F.coalesce("cluster_id", F.col("conv_id")))
        )
    return labels


def _driver_union_find(pairs: DataFrame, all_vertices: DataFrame | None) -> DataFrame:
    """Small-graph fast path: collect edges, union-find with path compression,
    canonical min-id roots; singletons joined back distributed."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for row in pairs.select("conv_a", "conv_b").toLocalIterator():
        ra, rb = find(row["conv_a"]), find(row["conv_b"])
        if ra != rb:
            # union by canonical min so roots stay the min conv_id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    spark = pairs.sparkSession
    rows = [(v, find(v)) for v in list(parent)]
    if rows:
        labels = spark.createDataFrame(rows, "conv_id string, cluster_id string")
    else:
        labels = spark.createDataFrame([], "conv_id string, cluster_id string")
    if all_vertices is not None:
        labels = (
            all_vertices.select("conv_id")
            .join(F.broadcast(labels), "conv_id", "left")
            .withColumn("cluster_id", F.coalesce("cluster_id", F.col("conv_id")))
        )
    return labels


def cluster_sizes(labels: DataFrame) -> DataFrame:
    return labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("size"))
