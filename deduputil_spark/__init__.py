"""deduputil_spark — a PySpark-native near-duplicate detection + clustering engine.

Re-realizes the semantics of the reference `deduputil` (content-defined
chunking, chunk-hash fingerprinting, hashtable duplicate lookup with
byte-verify, block-frequency similarity) as idiomatic Spark DataFrame / SQL
dataflow over multi-turn conversation transcript tables.

This is NOT a port: the reference is a single-process C engine
(`/root/reference/src/dedup.c`); here every stage is a declarative Spark plan
so Catalyst/AQE handle pushdown, partial aggregation, shuffle sizing and skew.
"""

from deduputil_spark.config import DedupConfig

__version__ = "0.1.0"

__all__ = ["DedupConfig", "__version__"]
