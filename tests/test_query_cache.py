"""Per-block query cache: hit/miss planning, zone-map filter
dropping (the sliding-time-window case), bit-exact cached answers,
and invalidation (reference src/lib/query_cache.go:30-242)."""

import os

import pytest
from pyspark.sql import functions as F

from sybil_spark.sources import query_cache as QC
from sybil_spark.sources.query_cache import CacheSpec


@pytest.fixture()
def blocks(spark, tmp_path):
    """Three time-sorted parquet blocks: t spans [0,1000),
    [1000,2000), [2000,3000), 250 rows each, plus a value column."""
    paths = []
    for i in range(3):
        df = spark.range(250).select(
            (F.col("id") * 4 + i * 1000).alias("t"),
            (F.col("id") % 5).cast("string").alias("g"),
            (F.col("id") * 1.5 + i).alias("v"))
        p = str(tmp_path / f"block{i}")
        df.coalesce(1).write.parquet(p)
        paths.append(p)
    return paths


def _direct(spark, paths, t_min):
    raw = spark.read.parquet(*paths).where(F.col("t") >= t_min)
    return {(r["g"],): (r["n"], float(r["s"]))
            for r in raw.groupBy("g")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("v").cast("decimal(38,6)")).cast("double")
                  .alias("s")).collect()}


def _served(df):
    return {(r["g"],): (r["count"], float(r["sum_v"]))
            for r in df.collect()}


def test_cold_warm_bit_exact(spark, blocks, tmp_path):
    croot = str(tmp_path / "cache")
    spec = CacheSpec(group_cols=("g",), num_cols=("v",),
                     filters=(("int", "ge", "t", 0),))
    cold = _served(QC.run(spark, blocks, spec, croot, cache_min_rows=1))
    warm = _served(QC.run(spark, blocks, spec, croot, cache_min_rows=1))
    assert cold == warm == _direct(spark, blocks, 0)


def test_sliding_window_hits_interior_blocks(spark, blocks, tmp_path):
    """The reference's headline cache property: a moving absolute
    time threshold re-uses interior blocks' cached partials because
    a filter trivially true for a block is excluded from its key
    (query_cache.go:69-131). Blocks fully covered by BOTH windows
    share one cache entry; only the straddling block recomputes."""
    croot = str(tmp_path / "cache")
    files = [b for p in blocks for b in QC._list_blocks(p)]

    spec1 = CacheSpec(group_cols=("g",), num_cols=("v",),
                      filters=(("int", "ge", "t", 500),))
    r1 = _served(QC.run(spark, blocks, spec1, croot, cache_min_rows=1))
    assert r1 == _direct(spark, blocks, 500)

    # shifted window, same shape: t >= 700 instead of 500
    spec2 = CacheSpec(group_cols=("g",), num_cols=("v",),
                      filters=(("int", "ge", "t", 700),))
    pl2 = QC.plan(files, spec2, croot, cache_min_rows=1)
    # blocks 1 and 2 (t >= 1000) satisfy both filters trivially ->
    # same key as under spec1 -> HIT; block 0 straddles -> MISS
    assert len(pl2.hits) == 2 and len(pl2.misses) == 1
    assert "block0" in pl2.misses[0]
    r2 = _served(QC.run(spark, blocks, spec2, croot, cache_min_rows=1))
    assert r2 == _direct(spark, blocks, 700)

    # warm re-run of the shifted window: all three blocks hit
    pl3 = QC.plan(files, spec2, croot, cache_min_rows=1)
    assert len(pl3.hits) == 3 and not pl3.misses


def test_new_blocks_only_miss(spark, blocks, tmp_path):
    """Append-only growth: after new data lands, a repeated query
    recomputes ONLY the new block."""
    croot = str(tmp_path / "cache")
    spec = CacheSpec(group_cols=("g",), num_cols=("v",))
    QC.run(spark, blocks, spec, croot, cache_min_rows=1)

    p_new = str(tmp_path / "block3")
    spark.range(300).select(
        (F.col("id") + 3000).alias("t"),
        (F.col("id") % 5).cast("string").alias("g"),
        (F.col("id") * 1.5 + 3).alias("v")).coalesce(1).write.parquet(p_new)
    all_blocks = blocks + [p_new]
    files = [b for p in all_blocks for b in QC._list_blocks(p)]
    pl = QC.plan(files, spec, croot, cache_min_rows=1)
    assert len(pl.hits) == 3 and len(pl.misses) == 1
    assert "block3" in pl.misses[0]
    got = _served(QC.run(spark, all_blocks, spec, croot, cache_min_rows=1))
    assert got == _direct(spark, all_blocks, -1)


def test_small_blocks_not_persisted(spark, blocks, tmp_path):
    """The reference skips caching partial blocks
    (query_cache.go:185-188): below cache_min_rows nothing lands on
    disk, but answers are still correct."""
    croot = str(tmp_path / "cache")
    spec = CacheSpec(group_cols=("g",), num_cols=("v",))
    r = _served(QC.run(spark, blocks, spec, croot,
                       cache_min_rows=10_000))
    assert r == _direct(spark, blocks, -1)
    assert not os.path.isdir(croot) or not os.listdir(croot)


def test_eq_and_str_filters_never_dropped(spark, blocks, tmp_path):
    """Only extent-provable gt/lt/ge/le int filters are droppable
    (reference drops only lt/gt); eq and str filters always key."""
    croot = str(tmp_path / "cache")
    files = [b for p in blocks for b in QC._list_blocks(p)]
    s_eq = CacheSpec(group_cols=("g",), num_cols=("v",),
                     filters=(("int", "eq", "t", 1500),))
    s_str = CacheSpec(group_cols=("g",), num_cols=("v",),
                      filters=(("str", "eq", "g", "2"),))
    _, stats = QC._footer_stats(files[0])
    assert not QC._trivial(("int", "eq", "t", 1500), stats)
    assert not QC._trivial(("str", "eq", "g", "2"), stats)
    r = _served(QC.run(spark, blocks, s_str, croot, cache_min_rows=1))
    direct = {(rr["g"],): (rr["n"], float(rr["s"]))
              for rr in spark.read.parquet(*blocks).where("g = '2'")
              .groupBy("g")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.col("v").cast("decimal(38,6)")).cast("double")
                    .alias("s")).collect()}
    assert r == direct
    assert _served(QC.run(spark, blocks, s_eq, croot, cache_min_rows=1)) \
        == _direct_eq(spark, blocks)


def _direct_eq(spark, paths):
    return {(r["g"],): (r["n"], float(r["s"]))
            for r in spark.read.parquet(*paths).where("t = 1500")
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("v").cast("decimal(38,6)")).cast("double")
                  .alias("s")).collect()}


def test_vacuum_drops_dead_entries(spark, blocks, tmp_path):
    croot = str(tmp_path / "cache")
    spec = CacheSpec(group_cols=("g",), num_cols=("v",))
    QC.run(spark, blocks, spec, croot, cache_min_rows=1)
    # no dead entries yet
    live_root = str(tmp_path)
    assert QC.vacuum(live_root, croot) == 0
    # remove a block -> its entry becomes dead
    import shutil
    shutil.rmtree(blocks[0])
    assert QC.vacuum(live_root, croot) == 1


def test_timed_spec_buckets(spark, blocks, tmp_path):
    """time_col + bucket_s: served output matches the direct bucketed
    aggregation bit-for-bit."""
    croot = str(tmp_path / "cache")
    spec = CacheSpec(group_cols=(), num_cols=("v",),
                     time_col="t", bucket_s=500)
    got = {r["tbucket"]: (r["count"], float(r["sum_v"]))
           for r in QC.run(spark, blocks, spec, croot,
                           cache_min_rows=1).collect()}
    direct = {r["tb"]: (r["n"], float(r["s"]))
              for r in spark.read.parquet(*blocks)
              .groupBy((F.col("t") - F.col("t") % 500).alias("tb"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.col("v").cast("decimal(38,6)")).cast("double")
                    .alias("s")).collect()}
    assert got == direct
