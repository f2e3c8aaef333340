"""Iterative connected components over verified duplicate pairs.

Two distributed algorithms (no GraphFrames dependency), one driver fast path:

- "star" (default): small-star/large-star alternation — the alternating-star
  algorithm of Kiveris et al., "Connected Components in MapReduce and
  Beyond" (SOCC 2014).  Converges in O(log n) rounds even on chain/path
  graphs, where plain label propagation needs O(diameter).  Each half-round
  is one aggregate + one join; no per-node adjacency lists are ever
  materialized (mega-components stay safe).
- "minlabel": min-label propagation (each iteration joins labels across the
  edge list and takes the elementwise min) — O(diameter) rounds; kept as the
  cross-check implementation.

Cluster ids are canonical — min(conv_id) in the component — so results are
deterministic under any parallelism (SURVEY.md §7.4.4).  Every round
localCheckpoints to cut lineage (SURVEY.md §4 custom-work item 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 20,
    all_vertices: DataFrame | None = None,
    driver_threshold: int = 2_000_000,
    algorithm: str = "star",
) -> DataFrame:
    """pairs(conv_a, conv_b) -> (conv_id, cluster_id).

    If `all_vertices` (a conv_id DataFrame) is given, vertices without edges
    come back as singletons (cluster_id = conv_id).

    Hybrid execution: below `driver_threshold` edges the component graph fits
    trivially on the driver — path-compressed union-find there beats N Spark
    jobs of fixed overhead by 10-30×.  Above it, the distributed loop runs
    (`algorithm`: "star" O(log n) rounds, or "minlabel" O(diameter)).
    Verified duplicate edges are a sliver of corpus size even at 10^12 turns,
    but the distributed path keeps the pipeline total when they aren't.
    """
    n_edges = pairs.count()
    if n_edges <= driver_threshold:
        return _driver_union_find(pairs, all_vertices)
    if algorithm == "star":
        labels, _ = _star_components(pairs, max_iterations)
    elif algorithm == "minlabel":
        labels = _minlabel_components(pairs, max_iterations)
    else:
        raise ValueError(f"unknown cc algorithm {algorithm!r}")
    if all_vertices is not None:
        labels = (
            all_vertices.select("conv_id")
            .join(labels, "conv_id", "left")
            .withColumn("cluster_id", F.coalesce("cluster_id", F.col("conv_id")))
        )
    return labels


def _star_components(pairs: DataFrame, max_iterations: int) -> tuple[DataFrame, int]:
    """Small-star/large-star alternation -> (labels(conv_id, cluster_id),
    rounds used).  At the fixpoint every edge points (node -> component min).

    large-star: every node u links each GREATER neighbor to min(Γ(u) ∪ {u});
    small-star: with edges oriented high->low, u links each (smaller)
    neighbor and itself to min(Γ(u) ∪ {u}).  Fixpoint detected by a cheap
    (count, bit_xor-of-hash) edge-set fingerprint."""
    nodes = (
        pairs.select(F.col("conv_a").alias("conv_id"))
        .unionByName(pairs.select(F.col("conv_b").alias("conv_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = (
        pairs.select(F.col("conv_a").alias("u"), F.col("conv_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_fp = None
    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        # large-star
        sym = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", F.col("u")).alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star (edges oriented high -> low)
        d = (
            large.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        j = d.join(d.groupBy("u").agg(F.min("v").alias("m")), "u")
        edges = (
            j.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(j.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        fp = edges.agg(
            F.count(F.lit(1)).alias("n"), F.expr("bit_xor(xxhash64(u, v))").alias("x")
        ).collect()[0]
        fp = (fp["n"], fp["x"])
        if fp == prev_fp:
            break
        prev_fp = fp
    lbl = edges.groupBy("u").agg(F.min("v").alias("cluster_id")).withColumnRenamed("u", "conv_id")
    labels = (
        nodes.join(lbl, "conv_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("conv_id")))
    )
    return labels, rounds


def _minlabel_components(pairs: DataFrame, max_iterations: int) -> DataFrame:
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

    # ONE Arrow collect: toLocalIterator launches a job per partition
    # sequentially (64 mini-jobs ≈ 4 s of scheduler round-trips at local[32])
    # and this path is already bounded by driver_threshold edges
    pdf = pairs.select("conv_a", "conv_b").toPandas()
    for a, b in zip(pdf["conv_a"], pdf["conv_b"]):
        ra, rb = find(a), find(b)
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
