"""Delta encode/apply round-trips (reference sync family semantics)."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from deduputil_spark.config import DedupConfig
from deduputil_spark.functions.hashes import adler32_checksum
from deduputil_spark.operators.assemble import assemble_documents
from deduputil_spark.operators.chunk import chunk_documents
from deduputil_spark.operators.delta import (
    _adler_all_positions,
    apply_deltas,
    bdiff,
    compute_deltas,
)

BS = 256
CFG = DedupConfig(chunk_algo="fsp", block_size=BS)
rng = random.Random(77)


def test_adler_all_positions_matches_scalar():
    data = bytes(rng.randrange(256) for _ in range(3000))
    arr = np.frombuffer(data, dtype=np.int8)
    hk = _adler_all_positions(arr, 256)
    for w in [0, 1, 100, 1000, len(hk) - 1]:
        assert int(hk[w]) == adler32_checksum(data[w : w + 256]), w


@pytest.fixture(scope="module")
def corpus_pair(spark):
    """source = target with an insertion + an edit (classic rsync shape)."""
    words = [f"w{i:03d}" for i in range(400)]
    tgt = " ".join(rng.choice(words) for _ in range(2000))
    src = tgt[: len(tgt) // 3] + " INSERTED NEW STUFF HERE " + tgt[len(tgt) // 3 :]
    src = src.replace("w00", "q99", 5)
    t = spark.createDataFrame(
        [("tgt", 0, "user", tgt, None, None), ("src", 0, "user", src, None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    docs = assemble_documents(t).cache()
    chunks = chunk_documents(docs, CFG).cache()
    pairs = spark.createDataFrame([("src", "tgt")], "conv_src string, conv_tgt string")
    return docs, chunks, pairs


@pytest.mark.parametrize("mode", ["fsp", "sbc"])
def test_delta_roundtrip(spark, corpus_pair, mode):
    docs, chunks, pairs = corpus_pair
    d = compute_deltas(pairs, docs, chunks, BS, mode=mode).cache()
    recon = apply_deltas(d, docs, chunks).collect()[0]["doc_text"]
    want = docs.filter(F.col("conv_id") == "src").collect()[0]["doc_text"]
    assert recon == want
    if mode == "sbc":
        # the sliding scan must find copy refs despite the unaligned insertion
        refs = d.filter(~F.col("embedded")).count()
        assert refs > 0, "sbc delta found no shared blocks across an insertion"


def test_fsp_delta_identical_docs_all_refs(spark, corpus_pair):
    docs, chunks, _ = corpus_pair
    pairs = spark.createDataFrame([("tgt", "tgt")], "conv_src string, conv_tgt string")
    d = compute_deltas(pairs, docs, chunks, BS, mode="fsp")
    body = d.filter(F.col("entry_idx") >= 0).collect()
    embedded = [e for e in body if e["embedded"]]
    # identical doc deltas are all copy-refs except the sub-block tail
    assert all(e["len"] < BS for e in embedded), embedded


def test_bdiff_report(spark, corpus_pair):
    docs, chunks, pairs = corpus_pair
    rep = bdiff(pairs, docs, chunks, BS)
    rows = rep.collect()
    assert rows
    assert any(r["diff"] for r in rows) and any(not r["diff"] for r in rows)
