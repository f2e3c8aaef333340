from __future__ import annotations

import pytest

from deduputil_spark.session import get_spark
from deduputil_spark.synth import synthesize


@pytest.fixture(scope="session")
def spark():
    s = get_spark("deduputil-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    """Tiny deterministic corpus (~200 convs incl. planted dups)."""
    return synthesize(n_base_convs=120, seed=42)


@pytest.fixture(scope="session")
def transcripts(spark, corpus):
    df = spark.createDataFrame(corpus.transcripts)
    df = df.withColumn("turn_idx", df["turn_idx"].cast("int"))
    return df.cache()
