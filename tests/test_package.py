"""Package verb tests: create/list/stat/extract/append/remove round-trips
(the reference CLI surface, /root/reference/src/dedup.c:2089-2112)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from deduputil_spark.config import DedupConfig
from deduputil_spark.operators.assemble import assemble_documents
from deduputil_spark.operators.reconstruct import roundtrip_mismatches
from deduputil_spark.sources.package import (
    append_package,
    create_package,
    extract_package,
    list_package,
    open_package,
    package_stats,
    remove_from_package,
)

CFG = DedupConfig(block_size=256, block_min_size=64, block_max_size=1024)


@pytest.fixture(scope="module")
def pkg(spark, transcripts, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pkg"))
    st = create_package(spark, transcripts, d, CFG)
    return d, st


def test_create_and_stats(spark, pkg):
    d, st = pkg
    assert st.dedup_rate > 1.0  # planted exact dups guarantee savings
    st2 = package_stats(spark, d)
    assert st2.unique_blocks == st.unique_blocks
    assert st2.total_blocks == st.total_blocks


def test_list(spark, pkg, transcripts):
    d, _ = pkg
    names = [r["conv_id"] for r in list_package(spark, d).collect()]
    want = sorted(r["conv_id"] for r in transcripts.select("conv_id").distinct().collect())
    assert names == want


def test_extract_roundtrip(spark, pkg, transcripts):
    d, _ = pkg
    recon = extract_package(spark, d)
    assert roundtrip_mismatches(transcripts, recon).count() == 0


def test_append_then_extract(spark, pkg, transcripts):
    d, _ = pkg
    extra = spark.createDataFrame(
        [("zz0001", 0, "user", "brand new appended conversation " * 30, None, None)],
        schema=transcripts.schema,
    )
    append_package(spark, extra, d, CFG)
    names = [r["conv_id"] for r in list_package(spark, d).collect()]
    assert "zz0001" in names
    recon = extract_package(spark, d).filter(F.col("conv_id") == "zz0001")
    want = assemble_documents(extra).collect()[0]["doc_text"]
    assert recon.collect()[0]["doc_text"] == want
    # original docs still intact after append (exclude the appended conv —
    # it isn't in `transcripts`, so the full-outer check would flag it)
    originals = extract_package(spark, d).filter(F.col("conv_id") != "zz0001")
    assert roundtrip_mismatches(transcripts, originals).count() == 0


def test_remove_then_extract(spark, pkg, transcripts):
    d, _ = pkg
    victims = spark.createDataFrame([("zz0001",)], "conv_id string")
    remove_from_package(spark, victims, d)
    names = [r["conv_id"] for r in list_package(spark, d).collect()]
    assert "zz0001" not in names
    # survivors reconstruct; bids stay dense
    assert roundtrip_mismatches(transcripts, extract_package(spark, d)).count() == 0
    blocks = open_package(spark, d)["blocks"]
    n = blocks.count()
    mm = blocks.agg(F.min("bid"), F.max("bid")).collect()[0]
    assert (mm[0], mm[1]) == (0, n - 1)
