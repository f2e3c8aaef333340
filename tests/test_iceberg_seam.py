"""Iceberg integration through the io.py seam (VERDICT r2 item 8).

This sandbox bundles no Iceberg runtime jar and has no network, so the test
SKIPS with a precise reason today — but it is wired to go live the moment a
jar appears (drop one in $SPARK_HOME/jars, pyspark's jars dir, ~/.ivy2, or
point $ICEBERG_JAR at it): it then builds a session with a hadoop-catalog
Iceberg catalog, pushes a table through write_table/read_table by CATALOG
NAME (not path), and round-trips it.
"""

from __future__ import annotations

import glob
import os

import pytest

from deduputil_spark.io import iceberg_available, read_table, table_exists, write_table

_JAR_GLOBS = [
    os.environ.get("ICEBERG_JAR", ""),
    os.path.join(os.environ.get("SPARK_HOME", "/nonexistent"), "jars", "iceberg-spark-runtime*.jar"),
    os.path.expanduser("~/.ivy2/**/iceberg-spark-runtime*.jar"),
    "/opt/**/iceberg-spark-runtime*.jar",
]


def _find_jar() -> str | None:
    import pyspark

    globs = _JAR_GLOBS + [os.path.join(os.path.dirname(pyspark.__file__), "jars", "iceberg-spark-runtime*.jar")]
    for pat in globs:
        if not pat:
            continue
        hits = glob.glob(pat, recursive=True)
        if hits:
            return hits[0]
    return None


def test_io_seam_round_trips_through_iceberg(tmp_path):
    jar = _find_jar()
    if jar is None:
        pytest.skip(
            "no iceberg-spark-runtime jar on this host (checked $ICEBERG_JAR, "
            "$SPARK_HOME/jars, pyspark jars, ~/.ivy2, /opt) and no network to "
            "fetch one — io.py seam exercise requires the runtime jar"
        )
    from pyspark.sql import SparkSession

    wh = str(tmp_path / "warehouse")
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("iceberg-seam")
        .config("spark.jars", jar)
        .config("spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.it.type", "hadoop")
        .config("spark.sql.catalog.it.warehouse", wh)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    try:
        assert iceberg_available(spark), "jar present but SparkCatalog not loadable"
        df = spark.createDataFrame(
            [("c1", 0, "hello"), ("c1", 1, "world"), ("c2", 0, "solo")],
            "conv_id string, turn_idx int, text string",
        )
        name = "it.db.transcripts"
        write_table(df, name)  # catalog-name branch, not the parquet fallback
        assert table_exists(spark, name)
        back = read_table(spark, name)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
        write_table(df.filter("conv_id = 'c2'"), name, mode="append")
        assert read_table(spark, name).count() == 4
    finally:
        spark.stop()
