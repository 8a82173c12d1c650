"""As-of and range join semantics on tiny hand-checked frames."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sybil_spark.operators import temporal


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame([
        Row(sym="a", t=5, px=100),
        Row(sym="a", t=15, px=110),
        Row(sym="b", t=8, px=50),
    ])


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame([
        Row(sym="a", t=10, qty=1),   # -> quote @5
        Row(sym="a", t=15, qty=2),   # -> quote @15 (same-time matches)
        Row(sym="a", t=3, qty=3),    # -> no quote yet (NULL)
        Row(sym="b", t=9, qty=4),    # -> quote @8
    ])


def test_asof_backward(spark, trades, quotes):
    out = {(r["sym"], r["t"]): r for r in
           temporal.asof_join(trades, quotes, ["sym"], "t", "t",
                              right_cols=["px"]).collect()}
    assert out[("a", 10)]["px_r"] == 100 and out[("a", 10)]["t_r"] == 5
    assert out[("a", 15)]["px_r"] == 110   # rt == lt matches
    assert out[("a", 3)]["px_r"] is None   # nothing at-or-before
    assert out[("b", 9)]["px_r"] == 50
    assert out[("a", 10)]["qty"] == 1      # left payload carried


def test_asof_forward(spark, trades, quotes):
    out = {(r["sym"], r["t"]): r for r in
           temporal.asof_join(trades, quotes, ["sym"], "t", "t",
                              right_cols=["px"],
                              direction="forward").collect()}
    assert out[("a", 3)]["px_r"] == 100    # earliest at-or-after
    assert out[("a", 10)]["px_r"] == 110
    assert out[("a", 15)]["px_r"] == 110   # same-time matches
    assert out[("b", 9)]["px_r"] is None


def test_asof_single_shuffle(spark, trades, quotes):
    from sybil_spark.plans import inspect as I
    j = temporal.asof_join(trades, quotes, ["sym"], "t", "t",
                           right_cols=["px"])
    # union + window = one hash exchange on the key, no join node
    assert I.shuffle_exchange_count(j) == 1, I.formatted_plan(j)


def test_range_join_matches_naive(spark):
    points = spark.createDataFrame(
        [Row(k="x", t=i * 7) for i in range(50)])
    ivals = spark.createDataFrame([
        Row(k="x", s=0, e=50, iv=1),
        Row(k="x", s=45, e=46, iv=2),     # sub-bucket interval
        Row(k="x", s=100, e=300, iv=3),   # spans many buckets
        Row(k="y", s=0, e=1000, iv=4),    # wrong key: never matches
    ])
    got = {(r["t"], r["iv"]) for r in
           temporal.range_join(points, "t", ivals, "s", "e",
                               on=["k"], bucket=16.0).collect()}
    naive = {(r["t"], r["iv"]) for r in
             points.join(ivals, "k")
                   .where((F.col("t") >= F.col("s"))
                          & (F.col("t") < F.col("e"))).collect()}
    assert got == naive and len(got) > 0


def test_sessionize_gap_boundary(spark):
    rows = [Row(u="a", t=0, i=0), Row(u="a", t=1800, i=1),   # gap == 1800 stays
            Row(u="a", t=3601, i=2),                          # > 1800 breaks
            Row(u="b", t=0, i=3)]
    out = {(r["u"], r["sess"]): r for r in
           temporal.sessionize(spark.createDataFrame(rows), "u", "t",
                               gap_s=1800, tiebreak="i").collect()}
    assert out[("a", 1)]["n_events"] == 2
    assert out[("a", 1)]["session_end"] == 1800
    assert out[("a", 2)]["n_events"] == 1
    assert out[("a", 2)]["session_start"] == 3601
    assert out[("b", 1)]["n_events"] == 1
