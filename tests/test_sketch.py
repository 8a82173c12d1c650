"""Heavy hitters (operators/sketch.py): Misra–Gries invariants, the
exactness proof, both decision paths, and the n-gram front end."""

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from sybil_spark.operators.sketch import (_mg_summaries, heavy_hitters,
                                          top_ngrams)


def _items(spark, vals, parts=2):
    return (spark.createDataFrame([(v,) for v in vals], "item string")
                 .repartition(parts))


def test_mg_summary_invariants(spark):
    vals = ["a"] * 50 + ["b"] * 30 + ["c"] * 5 + \
        [f"x{i}" for i in range(40)]
    df = _items(spark, vals, parts=1)
    rows = _mg_summaries(df, m=4).collect()
    true = Counter(vals)
    D = sum(r["dsum"] for r in rows if r["item"] is None)
    ests = {r["item"]: r["est"] for r in rows if r["item"] is not None}
    assert len(ests) <= 4
    for it, est in ests.items():
        assert est <= true[it] <= est + D, (it, est, D)
    for it, c in true.items():
        if it not in ests:
            assert c <= D, (it, c, D)     # absent => count <= D


def test_heavy_hitters_sketch_path_exact(spark):
    # heavily skewed: the proof closes even at tiny m
    vals = ["a"] * 100 + ["b"] * 60 + ["c"] * 30 + \
        [f"t{i}" for i in range(20)]
    df = _items(spark, vals, parts=3)
    got = [(r["item"], r["cnt"]) for r in
           heavy_hitters(df, "item", k=3, m=8,
                         mode="sketch").collect()]
    assert got == [("a", 100), ("b", 60), ("c", 30)]


def test_heavy_hitters_sketch_raises_when_unprovable(spark):
    # perfectly flat: every item count 2, m=2 -> bound can't close
    vals = [f"t{i}" for i in range(50)] * 2
    df = _items(spark, vals, parts=4)
    with pytest.raises(RuntimeError, match="sketch proof failed"):
        heavy_hitters(df, "item", k=3, m=2, mode="sketch")
    # ...but auto falls back to the exact plan and stays correct
    got = [(r["item"], r["cnt"]) for r in
           heavy_hitters(df, "item", k=3, m=2).collect()]
    assert got == [("t0", 2), ("t1", 2), ("t10", 2)]


def test_heavy_hitters_fewer_than_k_items(spark):
    df = _items(spark, ["a", "a", "b"], parts=2)
    got = [(r["item"], r["cnt"]) for r in
           heavy_hitters(df, "item", k=10, m=64).collect()]
    assert got == [("a", 2), ("b", 1)]


@given(vals=st.lists(
    st.sampled_from(["a", "b", "c", "dd", "ee", "ff", "g1", "g2"]),
    min_size=1, max_size=120),
    m=st.integers(min_value=2, max_value=16),
    k=st.integers(min_value=1, max_value=5))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_heavy_hitters_fuzz_auto_equals_exact(spark, vals, m, k):
    df = _items(spark, vals, parts=3)
    auto = [(r["item"], r["cnt"]) for r in
            heavy_hitters(df, "item", k=k, m=m).collect()]
    exact = sorted(Counter(vals).items(),
                   key=lambda kv: (-kv[1], kv[0]))[:k]
    assert auto == exact


def test_top_ngrams_matches_bruteforce(spark):
    texts = ["the quick brown fox", "the quick brown cat",
             "the quick", "lone", "a b"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = [(r["gram"], r["cnt"]) for r in
           top_ngrams(df, "text", n=3, k=5, m=64).collect()]
    # slice-truncation convention: short docs contribute their whole
    # text once (text.ngrams)
    grams = []
    for t in texts:
        w = t.split(" ")
        if len(w) <= 3:
            grams.append(t)
        else:
            grams.extend(" ".join(w[i:i + 3])
                         for i in range(len(w) - 2))
    exp = sorted(Counter(grams).items(),
                 key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == exp


def test_heavy_hitters_mode_validation(spark):
    df = _items(spark, ["a"], parts=1)
    with pytest.raises(ValueError, match="unknown mode"):
        heavy_hitters(df, "item", mode="best")
