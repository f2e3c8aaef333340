"""Storage seam (SURVEY.md §7.0): Iceberg when available, parquet fallback.

The north rule targets Iceberg tables; this sandbox bundles no Iceberg jars
with local PySpark (verified), so the seam keeps every operator
storage-agnostic.  `use_iceberg()` flips automatically when the runtime
catalog supports it (e.g. spark-submit --packages
org.apache.iceberg:iceberg-spark-runtime-4.0_2.13 on a real cluster with
spark.sql.catalog.* configured).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_table(df: DataFrame, location: str, mode: str = "overwrite") -> None:
    """`location` is a path (parquet) or catalog table name (iceberg: contains
    no '/' and iceberg classes are present)."""
    spark = df.sparkSession
    if "/" not in location and iceberg_available(spark):
        writer = df.writeTo(location)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    df.write.mode(mode).parquet(location)


def read_table(spark: SparkSession, location: str) -> DataFrame:
    if "/" not in location and iceberg_available(spark):
        return spark.read.table(location)
    return spark.read.parquet(location)


def table_exists(spark: SparkSession, location: str) -> bool:
    if "/" not in location and iceberg_available(spark):
        return spark.catalog.tableExists(location)
    return os.path.exists(os.path.join(location, "_SUCCESS"))
