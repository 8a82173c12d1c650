"""PageRank (operators/graph.py) vs the pure-python arithmetic twin
and hand-checked small graphs."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from sybil_spark.operators.graph import pagerank, pagerank_ref


def _edges(spark, pairs):
    return spark.createDataFrame([(str(a), str(b)) for a, b in pairs],
                                 "s string, t string")


def test_pagerank_two_node_cycle(spark):
    # a <-> b: symmetric, each score = 0.5 at every iteration
    got = {r["node"]: r["score"] for r in
           pagerank(_edges(spark, [("a", "b"), ("b", "a")]),
                    "s", "t", iters=3).collect()}
    assert got == pytest.approx({"a": 0.5, "b": 0.5}, abs=1e-12)


def test_pagerank_sink_absorbs_mass(spark):
    # a -> b (b dangling): no redistribution, so total < 1 and b
    # outranks a
    got = {r["node"]: r["score"] for r in
           pagerank(_edges(spark, [("a", "b")]), "s", "t",
                    iters=2).collect()}
    ref = pagerank_ref([("a", "b")], iters=2)
    assert got == ref
    assert got["b"] > got["a"]
    assert sum(got.values()) < 1.0


def test_pagerank_matches_reference_exactly(spark):
    pairs = [("u1", "h1"), ("u1", "h2"), ("u2", "h1"), ("u3", "h3"),
             ("h1", "u1"), ("h2", "u1"), ("h1", "u2"), ("h3", "u3")]
    got = {r["node"]: r["score"] for r in
           pagerank(_edges(spark, pairs), "s", "t", iters=4).collect()}
    assert got == pagerank_ref(pairs, iters=4)   # bit-exact
    # a node referenced by the popular hub outranks the leaf pair
    assert got["h1"] > got["h3"]


@given(pairs=st.lists(
    st.tuples(st.sampled_from("abcdef"), st.sampled_from("abcdef")),
    min_size=1, max_size=14),
    iters=st.integers(min_value=1, max_value=4))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pagerank_fuzz_bit_exact(spark, pairs, iters):
    got = {r["node"]: r["score"] for r in
           pagerank(_edges(spark, pairs), "s", "t",
                    iters=iters).collect()}
    assert got == pagerank_ref(pairs, iters=iters)


def test_pagerank_validates_iters(spark):
    with pytest.raises(ValueError, match="iters"):
        pagerank(_edges(spark, [("a", "b")]), "s", "t", iters=0)


def test_personalized_pagerank(spark):
    pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
             ("d", "d")]
    got = {r["node"]: r["score"] for r in
           pagerank(_edges(spark, pairs), "s", "t", iters=3,
                    seeds=["a"]).collect()}
    assert got == pagerank_ref(pairs, iters=3, seeds=["a"])
    # the disconnected self-loop node gets NO mass under restart-at-a
    assert got["d"] == 0.0
    assert got["a"] > got["c"]          # proximity to the seed
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not in the graph"):
        pagerank(_edges(spark, pairs), "s", "t", seeds=["zz"])
    with _pytest.raises(ValueError, match="empty seeds"):
        pagerank(_edges(spark, pairs), "s", "t", seeds=[])
