"""Golden-fixture oracles for the three non-SQL-expressible driver queries
(VERDICT r3 #2): the fixtures are precomputed by scalar Spark-free code
(tests/fixtures/gen_fixtures.py) and read by the DuckDB oracle; these tests
(a) guard the committed fixtures against generator drift and (b) assert the
live Spark queries match them value-for-value — the same comparison the
driver's correctness gate performs."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from tests.fixtures.gen_fixtures import FIXTURE_DIR, GENERATORS, assembled_docs, write_fixtures


@pytest.fixture(scope="module")
def docs_pdf():
    return assembled_docs()


def test_committed_fixtures_match_generator(tmp_path, docs_pdf):
    """Regenerate into tmp; every committed fixture must be value-identical
    (catches silent generator or synth drift)."""
    paths = write_fixtures(str(tmp_path))
    for name, fresh_path in paths.items():
        committed = os.path.join(FIXTURE_DIR, f"{name}.parquet")
        assert os.path.exists(committed), f"fixture {name} not committed — run python -m tests.fixtures.gen_fixtures"
        a = pd.read_parquet(fresh_path)
        b = pd.read_parquet(committed)
        pd.testing.assert_frame_equal(a, b)


def _rows(df_rows, cols):
    return sorted(tuple(str(r[c]) for c in cols) for r in df_rows)


@pytest.mark.parametrize("name", list(GENERATORS))
def test_spark_query_matches_fixture(spark, name):
    """The live Spark query output equals the fixture rows+schema+values —
    for transcript_clusters this additionally certifies that minhash/LSH
    candidate generation missed NO above-threshold pair on this corpus (the
    fixture is all-pairs exact Jaccard, no LSH)."""
    import __spark_entry__ as e

    fixture = pd.read_parquet(os.path.join(FIXTURE_DIR, f"{name}.parquet"))
    out = e.queries()[name](spark, "/root/testdata/sf0.001")
    assert sorted(out.columns) == sorted(fixture.columns)
    cols = list(fixture.columns)
    got = _rows(out.collect(), cols)
    want = sorted(tuple(str(v) for v in row) for row in fixture[cols].itertuples(index=False))
    assert got == want
