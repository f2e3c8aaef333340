"""The "dedup package" as tables (S3/S4/S5 —
/root/reference/src/dedup.c:1082-1202,1207-1268,1817-1895).

The reference packs `header | unique block data | logic block data | file
metadata` into one archive file.  The Spark-native package is a directory of
four tables plus a one-row manifest mirroring the header fields
(/root/reference/src/dedup.h:59-70):

  manifest:    block_size, block_num, file_num, magic_num, config_hash, …
  blocks:      bid, md5, chunk_bytes, chunk_len, weak32, refcount
  file_meta:   conv_id, bids, n_blocks, tail_bytes
  (block_index is folded into blocks — parquet row-group offsets replace the
   reference's physical (offset, len) ldata entries)

`create_package` = dedup -c, `list_package` = dedup -t, `package_stats` =
dedup -s, `extract_package` = dedup -x, `append_package` = dedup -a,
`remove_from_package` = dedup -r.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deduputil_spark.config import DedupConfig
from deduputil_spark.operators.assemble import assemble_documents
from deduputil_spark.operators.chunk import chunk_documents
from deduputil_spark.operators.dedup import (
    DedupStats,
    append_documents,
    build_block_store,
    build_file_meta,
    dedup_stats,
    remove_documents,
)
from deduputil_spark.operators.reconstruct import reconstruct_documents

MAGIC = 0x1329149  # reference magic (/root/reference/src/dedup.h:62)


def _p(pkg_dir: str, name: str) -> str:
    return os.path.join(pkg_dir, name)


def create_package(
    spark: SparkSession, transcripts: DataFrame, pkg_dir: str, cfg: DedupConfig | None = None
) -> DedupStats:
    """dedup -c: chunk + dedup `transcripts` into a package directory."""
    cfg = cfg or DedupConfig()
    docs = assemble_documents(transcripts)
    chunks = chunk_documents(docs, cfg)
    blocks = build_block_store(chunks).persist()
    meta = build_file_meta(chunks, blocks).persist()
    blocks.write.mode("overwrite").parquet(_p(pkg_dir, "blocks"))
    meta.write.mode("overwrite").parquet(_p(pkg_dir, "file_meta"))
    st = dedup_stats(blocks, meta)
    manifest = spark.createDataFrame(
        [(cfg.block_size, st.unique_blocks, int(meta.count()), MAGIC, cfg.config_hash(),
          cfg.chunk_algo, st.total_bytes, st.unique_bytes)],
        "block_size int, block_num long, file_num long, magic_num long, "
        "config_hash string, chunk_algo string, total_bytes long, stored_bytes long",
    )
    manifest.write.mode("overwrite").parquet(_p(pkg_dir, "manifest"))
    return st


def open_package(spark: SparkSession, pkg_dir: str) -> dict[str, DataFrame]:
    manifest = spark.read.parquet(_p(pkg_dir, "manifest"))
    if manifest.collect()[0]["magic_num"] != MAGIC:
        raise ValueError("not a dedup package (bad magic)")
    return {
        "manifest": manifest,
        "blocks": spark.read.parquet(_p(pkg_dir, "blocks")),
        "file_meta": spark.read.parquet(_p(pkg_dir, "file_meta")),
    }


def list_package(spark: SparkSession, pkg_dir: str) -> DataFrame:
    """dedup -t: the stored document names."""
    return open_package(spark, pkg_dir)["file_meta"].select("conv_id").orderBy("conv_id")


def package_stats(spark: SparkSession, pkg_dir: str) -> DedupStats:
    """dedup -s."""
    pkg = open_package(spark, pkg_dir)
    return dedup_stats(pkg["blocks"], pkg["file_meta"])


def extract_package(spark: SparkSession, pkg_dir: str) -> DataFrame:
    """dedup -x: reconstruct every document -> (conv_id, doc_text)."""
    pkg = open_package(spark, pkg_dir)
    return reconstruct_documents(pkg["file_meta"], pkg["blocks"])


def append_package(
    spark: SparkSession, transcripts: DataFrame, pkg_dir: str, cfg: DedupConfig | None = None
) -> None:
    """dedup -a: dedup new conversations against the existing store."""
    cfg = cfg or DedupConfig()
    pkg = open_package(spark, pkg_dir)
    new = transcripts.join(pkg["file_meta"].select("conv_id"), "conv_id", "left_anti")
    chunks = chunk_documents(assemble_documents(new), cfg)
    nb, nm = append_documents(pkg["blocks"], pkg["file_meta"], chunks)
    _rewrite(spark, pkg_dir, nb, nm)


def remove_from_package(spark: SparkSession, conv_ids: DataFrame, pkg_dir: str) -> None:
    """dedup -r: drop documents, drop zero-ref blocks, renumber densely."""
    pkg = open_package(spark, pkg_dir)
    nb, nm = remove_documents(pkg["blocks"], pkg["file_meta"], conv_ids)
    _rewrite(spark, pkg_dir, nb, nm)


def _swap(pkg_dir: str, name: str) -> None:
    final = _p(pkg_dir, name)
    shutil.rmtree(final, ignore_errors=True)
    os.rename(final + "_tmp", final)


def _rewrite(spark: SparkSession, pkg_dir: str, blocks: DataFrame, meta: DataFrame) -> None:
    """Stage-then-rename (parquet can't overwrite its own input mid-plan).

    The tmp write fully materializes the new tables; the swap is a pure
    filesystem rename — data is written ONCE, not twice.  On an object-store
    deployment the io.py Iceberg seam replaces this with a snapshot commit."""
    blocks.write.mode("overwrite").parquet(_p(pkg_dir, "blocks_tmp"))
    meta.write.mode("overwrite").parquet(_p(pkg_dir, "file_meta_tmp"))
    # manifest must be collected BEFORE the swap unlinks its sibling tables'
    # old files (the read is lazy)
    manifest = spark.read.parquet(_p(pkg_dir, "manifest")).collect()[0].asDict()
    _swap(pkg_dir, "blocks")
    _swap(pkg_dir, "file_meta")
    b = spark.read.parquet(_p(pkg_dir, "blocks"))
    m = spark.read.parquet(_p(pkg_dir, "file_meta"))
    # refresh every derived header field (counts AND byte totals — the
    # reference recomputes its header on rewrite, dedup.c:1162-1189)
    st = dedup_stats(b, m)
    manifest["block_num"] = st.unique_blocks
    manifest["file_num"] = m.count()
    manifest["total_bytes"] = st.total_bytes
    manifest["stored_bytes"] = st.unique_bytes
    spark.createDataFrame([tuple(manifest.values())], list(manifest.keys())).write.mode(
        "overwrite"
    ).parquet(_p(pkg_dir, "manifest"))
