"""Ingest typing rules + storage lifecycle (reference
src/cmd/cmd_ingest.go, src/lib/table_ingest.go; SURVEY.md §1.3, §2.1)."""

import json
import os

import pytest
from pyspark.sql import Row, functions as F

from sybil_spark.query.builder import Query
from sybil_spark.sources import compact, ingest
from sybil_spark.table import Table, TableMeta, list_tables, table_info


@pytest.fixture()
def db(tmp_path):
    return str(tmp_path / "db")


def _write_ndjson(path, records):
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return str(path)


def test_typing_rules(spark, db, tmp_path):
    """JSON number→int64 (floats truncated), bool→0/1, nested object
    flattened parent_child, array→set of strings
    (reference cmd_ingest.go:59-85)."""
    p = _write_ndjson(tmp_path / "a.ndjson", [
        {"s": "x", "f": 3.9, "b": True, "nested": {"inner": 7},
         "arr": [1, 2, 2]},
        {"s": "y", "f": -2.7, "b": False, "nested": {"inner": 8},
         "arr": ["a"]},
    ])
    t = Table(db, "typed")
    n = ingest.ingest_json(spark, p, t)
    assert n == 2
    got = {f.name: f.dataType.simpleString()
           for f in spark.read.parquet(t.ingest_path).schema.fields}
    assert got["s"] == "string"
    assert got["f"] == "bigint"          # truncated, reference-faithful
    assert got["b"] == "bigint"
    assert got["nested_inner"] == "bigint"
    assert got["arr"] == "array<string>"
    rows = {r["s"]: r for r in spark.read.parquet(t.ingest_path).collect()}
    assert rows["x"]["f"] == 3 and rows["y"]["f"] == -2  # toward zero
    assert rows["x"]["b"] == 1 and rows["y"]["b"] == 0
    assert sorted(rows["x"]["arr"]) == ["1", "2"]        # set semantics


def test_float_keep_mode(spark, db, tmp_path):
    p = _write_ndjson(tmp_path / "f.ndjson", [{"f": 3.9}])
    t = Table(db, "floats")
    ingest.ingest_json(spark, p, t,
                       ingest.IngestSpec(float_mode="keep"))
    assert spark.read.parquet(t.ingest_path).collect()[0]["f"] == 3.9


def test_ints_and_timestamps_flags(spark, db, tmp_path):
    p = _write_ndjson(tmp_path / "t.ndjson",
                      [{"n": "42", "when": "2024-05-01 00:00:00"}])
    t = Table(db, "flags")
    ingest.ingest_json(
        spark, p, t,
        ingest.IngestSpec(ints=["n"], timestamps=["when"]))
    r = spark.read.parquet(t.ingest_path).collect()[0]
    assert r["n"] == 42
    assert r["when"] == 1714521600  # unix seconds, UTC session


def test_json_path_selector(spark, db, tmp_path):
    p = _write_ndjson(tmp_path / "p.ndjson",
                      [{"outer": {"x": 1}}, {"outer": {"x": 2}}])
    t = Table(db, "pathsel")
    ingest.ingest_json(spark, p, t, ingest.IngestSpec(json_path="$.outer"))
    vals = sorted(r["x"] for r in spark.read.parquet(t.ingest_path).collect())
    assert vals == [1, 2]


def test_first_writer_wins_typing(spark, db, tmp_path):
    """A later batch re-typing a column has that column dropped
    (reference src/lib/table.go:155-170)."""
    t = Table(db, "conflict")
    ingest.ingest_json(spark, _write_ndjson(tmp_path / "1.ndjson",
                                            [{"c": 5}]), t)
    with pytest.warns(UserWarning, match="conflicts"):
        ingest.ingest_json(spark, _write_ndjson(tmp_path / "2.ndjson",
                                                [{"c": "oops", "d": 1}]), t)
    df = t.read(spark, read_log=True)
    assert df.where("c is not null").count() == 1   # conflicting write failed
    assert df.where("d = 1").count() == 1           # rest of batch landed


def test_digest_roundtrip_and_query(spark, db, tmp_path):
    """ingest → digest → query: the reference's minimum end-to-end
    slice (SURVEY.md §7). Digest moves the log into time-sorted
    blocks; results are identical before and after."""
    recs = [{"host": f"h{i % 3}", "ping": 10 + i % 5, "time": 1_700_000_000 + i}
            for i in range(500)]
    t = Table(db, "uptime")
    ingest.ingest_json(spark, _write_ndjson(tmp_path / "u.ndjson", recs), t,
                       time_col="time")
    before = (Query.table(t.read(spark, read_log=True))
              .group_by("host").agg("ping", "avg")
              .limit(None).execute(spark).collect())
    n = compact.digest(spark, t, time_col="time", chunk_size=128)
    assert n == 500
    assert not os.listdir(t.ingest_path)  # log drained
    files = [f for f in os.listdir(t.blocks_path) if f.endswith(".parquet")]
    assert len(files) >= 4                # 500 rows / 128-row chunks
    after = (Query.table(t.read(spark)).group_by("host").agg("ping", "avg")
             .limit(None).execute(spark).collect())
    assert sorted(map(str, before)) == sorted(map(str, after))


def test_digest_empty_is_noop(spark, db):
    t = Table(db, "empty")
    assert compact.digest(spark, t) == 0


def test_trim_by_time(spark, db, tmp_path):
    recs = [{"v": i, "time": 1_700_000_000 + i * 1000} for i in range(400)]
    t = Table(db, "trimme")
    ingest.ingest_json(spark, _write_ndjson(tmp_path / "tr.ndjson", recs), t,
                       time_col="time")
    compact.digest(spark, t, time_col="time", chunk_size=100)
    cutoff = 1_700_000_000 + 200 * 1000
    doomed = compact.trim(t, time_col="time", before=cutoff)
    assert doomed  # some blocks are wholly before the cutoff
    compact.trim(t, time_col="time", before=cutoff, delete=True)
    remaining = t.read(spark)
    assert remaining.where(f"time < {cutoff}").count() < 200
    assert remaining.where(f"time >= {cutoff}").count() == 200  # kept intact


def test_rebuild_and_info(spark, db, tmp_path):
    t = Table(db, "meta")
    ingest.ingest_json(spark, _write_ndjson(tmp_path / "m.ndjson",
                                            [{"a": 1, "b": "x"}]), t)
    os.remove(t.meta_path)
    meta = compact.rebuild_meta(spark, t)
    assert meta.key_types == {"a": "int", "b": "str"}
    assert meta.row_count == 1
    info = table_info(spark, db, "meta")
    assert info["row_count"] == 1 and "a" in info["columns"]
    assert "meta" in list_tables(db)


def test_csv_ingest(spark, db, tmp_path):
    p = tmp_path / "c.csv"
    p.write_text("name,score\nalice,10\nbob,20.5\n")
    t = Table(db, "csvt")
    ingest.ingest_csv(spark, str(p), t)
    rows = {r["name"]: r["score"]
            for r in spark.read.parquet(t.ingest_path).collect()}
    assert rows == {"alice": 10, "bob": 20}  # float→long reference rule


def test_compact_blocks_merges_smalls(spark, db, tmp_path):
    """Many small digests → many partial blocks; compact_blocks
    rewrites them into full chunks without changing query results
    (reference FillPartialBlock, table_block_io.go:48-107)."""
    import pyarrow.parquet as pq
    t = Table(db, "compacting")
    # five separate digests of 40 rows each → >= 5 tiny block files
    for b in range(5):
        recs = [{"host": f"h{i % 3}", "ping": i,
                 "time": 1_700_000_000 + b * 1000 + i} for i in range(40)]
        ingest.ingest_json(
            spark, _write_ndjson(tmp_path / f"c{b}.ndjson", recs), t,
            time_col="time")
        compact.digest(spark, t, time_col="time", chunk_size=128)
    files = [f for f in os.listdir(t.blocks_path) if f.endswith(".parquet")]
    assert len(files) >= 5
    before = sorted(map(str, t.read(spark).collect()))

    n = compact.compact_blocks(spark, t, time_col="time", chunk_size=128)
    assert n == 200
    after_files = [os.path.join(t.blocks_path, f)
                   for f in os.listdir(t.blocks_path)
                   if f.endswith(".parquet")]
    assert len(after_files) < len(files)
    # ceil(200/128)=2 near-balanced time-range files, each <= chunk
    sizes = sorted(pq.ParquetFile(p).metadata.num_rows
                   for p in after_files)
    assert sum(sizes) == 200 and len(sizes) == 2 and sizes[-1] <= 128
    assert sorted(map(str, t.read(spark).collect())) == before
    # idempotent on balanced output: both files >= half-chunk already
    assert compact.compact_blocks(spark, t, time_col="time",
                                  chunk_size=128) == 0


def test_register_views_sql(spark, db, tmp_path):
    from sybil_spark.table import register_views
    recs = [{"host": f"h{i % 2}", "ping": i, "time": 1_700_000_000 + i}
            for i in range(20)]
    t = Table(db, "sqlable")
    ingest.ingest_json(spark, _write_ndjson(tmp_path / "sq.ndjson", recs), t,
                       time_col="time")
    compact.digest(spark, t, time_col="time")
    names = register_views(spark, db)
    assert "sqlable" in names
    rows = spark.sql(
        "select host, count(*) n, avg(ping) a from sqlable group by host"
    ).collect()
    assert {r["host"]: r["n"] for r in rows} == {"h0": 10, "h1": 10}


def test_registry_stats_and_compat_hist(spark, db, tmp_path):
    """Digest maintains table-lifetime min/max (reference IntInfo,
    table_column_info.go); the compat hist sizes buckets from the
    REGISTRY, so a second digest widening the range changes bucket
    width even for queries over old rows — the reference's
    ingest-history-dependent quantization (SURVEY.md §7 hard part 1)."""
    t = Table(db, "registry")
    ingest.ingest_json(spark, _write_ndjson(
        tmp_path / "r1.ndjson",
        [{"v": i, "time": 1_700_000_000 + i} for i in range(100)]), t,
        time_col="time")
    compact.digest(spark, t, time_col="time")
    info = t.load_meta().int_info["v"]
    assert info["min"] == 0 and info["max"] == 99 and info["count"] == 100

    # second digest widens the registry range (lifetime, not batch)
    ingest.ingest_json(spark, _write_ndjson(
        tmp_path / "r2.ndjson",
        [{"v": 1000, "time": 1_700_000_200}]), t, time_col="time")
    compact.digest(spark, t, time_col="time")
    info = t.load_meta().int_info["v"]
    assert info["min"] == 0 and info["max"] == 1000 and info["count"] == 101

    h = (Query.table(t.read(spark)).limit(None)
         .hist(spark, "v", from_registry=t).collect())
    # bucket width = (1000-0)/1000 = 1 -> buckets are exact values
    assert {r["bucket"] for r in h} == set(range(100)) | {1000}
    # outlier discard: a value beyond 10x registry max is dropped
    ingest.ingest_json(spark, _write_ndjson(
        tmp_path / "r3.ndjson",
        [{"v": 50_000, "time": 1_700_000_300}]), t, time_col="time")
    h2 = (Query.table(t.read(spark, read_log=True)).limit(None)
          .hist(spark, "v", from_registry=t).collect())
    assert not any(r["bucket"] >= 20_000 for r in h2)


def test_str_cardinality_in_registry(spark, db, tmp_path):
    t = Table(db, "cardreg")
    ingest.ingest_json(spark, _write_ndjson(
        tmp_path / "cr.ndjson",
        [{"host": f"h{i % 7}", "v": i, "time": i} for i in range(100)]), t,
        time_col="time")
    compact.digest(spark, t, time_col="time")
    stats = t.load_meta().int_info
    assert stats["host"]["count"] == 100
    # approx cardinality of 7 distinct values is exact at this size
    assert stats["host"]["cardinality"] == 7
    info = table_info(spark, db, "cardreg")
    assert info["column_stats"]["host"]["cardinality"] == 7


def test_day_partitioned_digest_and_trim(spark, db, tmp_path):
    """The 100TB layout: digest writes day=YYYY-MM-DD partitions,
    time queries prune directories, trim drops whole partitions."""
    from sybil_spark.plans import inspect as I
    day = 86_400
    recs = [{"v": i, "time": 1_700_000_000 + i * (day // 4)}
            for i in range(40)]     # ~10 days of data
    t = Table(db, "daily")
    ingest.ingest_json(spark, _write_ndjson(tmp_path / "d.ndjson", recs), t,
                       time_col="time")
    compact.digest(spark, t, time_col="time", day_partitions=True)
    subdirs = [d for d in os.listdir(t.blocks_path) if d.startswith("day=")]
    assert len(subdirs) >= 10

    df = t.read(spark)
    assert df.count() == 40
    q = df.where(F.col("day") == subdirs[0].split("=", 1)[1])
    assert "PartitionFilters" in I.formatted_plan(q)

    cutoff = 1_700_000_000 + 5 * day
    doomed = compact.trim(t, time_col="time", before=cutoff, delete=True)
    assert doomed
    left = t.read(spark)
    assert left.where(f"time >= {cutoff}").count() == \
        sum(1 for r in recs if r["time"] >= cutoff)
    # emptied day dirs are gone
    for d in os.listdir(t.blocks_path):
        if d.startswith("day="):
            assert os.listdir(os.path.join(t.blocks_path, d))


def test_auto_digest_trigger(spark, db, monkeypatch):
    """A steady ingest loop auto-compacts once the landing dir passes
    the file threshold (reference MaybeCompactRecords,
    src/lib/table_ingest.go:63-71, row_store.go:77-123); results are
    identical to a manual-digest lifecycle."""
    monkeypatch.setattr(ingest, "FILE_DIGEST_THRESHOLD", 3)
    t = Table(db, "autodig")
    for i in range(6):
        df = spark.createDataFrame([Row(v=i, time=1_700_000_000 + i)])
        ingest.ingest_df(df, t, time_col="time")
    assert os.path.exists(t.blocks_path)        # a digest fired
    landing = [f for f in os.listdir(t.ingest_path)
               if not f.startswith(("_", "."))]
    assert len(landing) <= ingest.FILE_DIGEST_THRESHOLD + 1
    got = sorted(r["v"] for r in t.read(spark, read_log=True).collect())
    assert got == list(range(6))                # nothing lost or doubled
    # opting out leaves the landing dir alone
    t2 = Table(db, "nodigest")
    for i in range(6):
        df = spark.createDataFrame([Row(v=i, time=i)])
        ingest.ingest_df(df, t2, time_col="time", auto_digest=False)
    assert not os.path.exists(t2.blocks_path)


def test_outlier_suppressed_registry(spark, db, tmp_path):
    """One junk 10^9 value must not widen the registry min/max used
    for compat-hist bucket sizing (reference STD_CUTOFF=1000 rule,
    table_column_info.go:71-131); skip_outliers=False keeps the raw
    extreme (reference -skip-outliers=false)."""
    recs = [{"v": i % 100, "time": 1_700_000_000 + i} for i in range(500)]
    recs.append({"v": 10**9, "time": 1_700_000_500})
    t = Table(db, "outliers")
    ingest.ingest_json(spark, _write_ndjson(tmp_path / "o.ndjson", recs), t,
                       time_col="time")
    compact.digest(spark, t, time_col="time")
    info = t.load_meta().int_info["v"]
    assert info["min"] == 0 and info["max"] == 99     # outlier ignored
    assert info["count"] == 501                       # but still counted
    # registry-derived hist keeps its tight bucket width
    h = (Query.table(t.read(spark)).limit(None)
         .hist(spark, "v", from_registry=t).collect())
    assert all(r["bucket"] < 20_000 for r in h)

    t2 = Table(db, "outliers_raw")
    ingest.ingest_json(spark, _write_ndjson(tmp_path / "o2.ndjson", recs), t2,
                       time_col="time")
    compact.digest(spark, t2, time_col="time", skip_outliers=False)
    assert t2.load_meta().int_info["v"]["max"] == 10**9


def test_top_string_values_in_registry(spark, db, tmp_path):
    """Digest tracks the top-K most frequent values per string column
    (reference StrInfo.TopStringCount, table_column_info.go:42-59),
    surfaced through -info; counts accumulate across digests."""
    t = Table(db, "topvals")
    recs = [{"host": f"h{i % 3}", "time": i} for i in range(60)]
    ingest.ingest_json(spark, _write_ndjson(tmp_path / "tv1.ndjson", recs), t,
                       time_col="time")
    compact.digest(spark, t, time_col="time")
    tv = t.load_meta().int_info["host"]["top_values"]
    assert tv == {"h0": 20, "h1": 20, "h2": 20}
    # second digest accumulates
    ingest.ingest_json(spark, _write_ndjson(
        tmp_path / "tv2.ndjson",
        [{"host": "h0", "time": 100 + i} for i in range(5)]), t,
        time_col="time")
    compact.digest(spark, t, time_col="time")
    tv = t.load_meta().int_info["host"]["top_values"]
    assert tv["h0"] == 25 and tv["h1"] == 20
    info = table_info(spark, db, "topvals")
    assert info["column_stats"]["host"]["top_values"]["h0"] == 25


def test_crashed_digest_stage_recovered(spark, db, tmp_path):
    """A digest that crashed after staging the ingest log into a
    stomache-* dir must not lose rows: the next lifecycle pass
    adopts the stranded files back into the log and digests them
    (reference re-reads leftover stomache dirs,
    table_ingest.go:106-161)."""
    import shutil

    p = _write_ndjson(tmp_path / "c.ndjson",
                      [{"host": f"h{i}", "t": i} for i in range(40)])
    t = Table(db, "crashy")
    ingest.ingest_json(spark, p, t, ingest.IngestSpec(), time_col="t")

    # simulate the crash: files staged away, no blocks written
    stage = os.path.join(t.path, "stomache-deadbeef")
    os.makedirs(stage)
    for f in os.listdir(t.ingest_path):
        src = os.path.join(t.ingest_path, f)
        if f.startswith(("_", ".")):
            shutil.rmtree(src) if os.path.isdir(src) else os.remove(src)
        else:
            os.rename(src, os.path.join(stage, f))
    assert not any(not f.startswith(("_", "."))
                   for f in os.listdir(t.ingest_path))

    n = compact.digest(spark, t)
    assert n == 40
    assert not any(d.startswith("stomache-") for d in os.listdir(t.path))
    assert t.read(spark).count() == 40


def test_crashed_compact_stage_recovered(spark, db, tmp_path):
    """Same protocol for compact_blocks: staged-away small BLOCK
    files stranded by a crash re-enter via the ingest log and are
    re-digested — no rows vanish from the queryable table."""
    p = _write_ndjson(tmp_path / "c2.ndjson",
                      [{"host": f"h{i}", "t": i} for i in range(30)])
    t = Table(db, "crashy2")
    ingest.ingest_json(spark, p, t, ingest.IngestSpec(), time_col="t")
    compact.digest(spark, t)
    blocks = [f for f in os.listdir(t.blocks_path)
              if f.endswith(".parquet")]
    assert blocks
    count_before = t.load_meta().int_info["t"]["count"]
    # simulate compact_blocks dying after staging one block away
    # (compact-origin stage name: its rows are already in the stats
    # registry and must not be re-counted by the recovery digest)
    stage = os.path.join(t.path, "stomache-c-cafef00d")
    os.makedirs(stage)
    os.rename(os.path.join(t.blocks_path, blocks[0]),
              os.path.join(stage, blocks[0]))

    recovered = compact.recover_stages(t)
    assert recovered == 1
    compact.digest(spark, t)
    assert t.read(spark).count() == 30
    # registry counts unchanged: recovered-counted-* files are
    # excluded from the re-digest's stats update
    assert t.load_meta().int_info["t"]["count"] == count_before


def test_ingest_parquet_and_orc_match_json_typing(spark, tmp_path):
    """Columnar re-ingest goes through the SAME coercions as JSON:
    floats truncate to long, bools to 0/1, structs flatten, arrays
    become string sets — source format must not leak into the
    table's types."""
    from sybil_spark.sources.ingest import ingest_orc, ingest_parquet
    src = spark.createDataFrame(
        [(1, 3.9, True, ("x", 7), ["a", "b", "a"]),
         (2, -1.2, False, ("y", 8), ["c"])],
        "id long, score double, ok boolean, "
        "nest struct<tag:string, n:long>, tags array<string>")
    pq = str(tmp_path / "src_pq")
    oc = str(tmp_path / "src_orc")
    src.write.parquet(pq)
    src.write.orc(oc)
    db = str(tmp_path / "db")
    for name, fn, path in [("t_pq", ingest_parquet, pq),
                           ("t_orc", ingest_orc, oc)]:
        t = Table(db, name)
        fn(spark, path, t)
        got = (spark.read.parquet(t.ingest_path)
                    .orderBy("id").collect())
        assert [r["score"] for r in got] == [3, -1]      # float → long
        assert [r["ok"] for r in got] == [1, 0]          # bool → 0/1
        assert got[0]["nest_tag"] == "x"                 # flattened
        assert sorted(got[0]["tags"]) == ["a", "b"]      # set semantics


def test_zorder_digest_narrows_zone_maps_on_both_dims(spark, tmp_path):
    """Z-ordered blocks: every file's footer min/max must cover a
    SMALL fraction of both clustered columns' ranges (multi-dim
    skipping), where the time-sorted layout leaves the second
    column's zone maps useless (~full range per file)."""
    import pyarrow.parquet as pq

    n = 20_000
    rows = [(i * 2654435761 % 100_000, (i * 40503) % 100_000, i)
            for i in range(n)]
    df = spark.createDataFrame(rows, "x long, y long, time long")

    def spans(tdir, **digest_kw):
        from sybil_spark.sources import compact as C
        t = Table(str(tdir), "zorder")
        os.makedirs(t.ingest_path, exist_ok=True)
        df.coalesce(2).write.mode("append").parquet(t.ingest_path)
        t.save_meta(TableMeta(name="zorder", time_col="time"))
        C.digest(spark, t, chunk_size=2000, **digest_kw)
        out = {}
        files = [f for f in os.listdir(t.blocks_path)
                 if f.endswith(".parquet")]
        assert len(files) >= 8
        for col in ("x", "y"):
            tot = 0.0
            for f in files:
                md = pq.read_metadata(os.path.join(t.blocks_path, f))
                lo = min(md.row_group(i).column(
                    md.schema.names.index(col)).statistics.min
                    for i in range(md.num_row_groups))
                hi = max(md.row_group(i).column(
                    md.schema.names.index(col)).statistics.max
                    for i in range(md.num_row_groups))
                tot += (hi - lo) / 100_000
            out[col] = tot / len(files)
        return out

    z = spans(tmp_path / "z", cluster_cols=["x", "y"])
    t = spans(tmp_path / "t")
    # time-sorted: x and y are uncorrelated with time -> each file
    # spans ~the full range of both
    assert t["x"] > 0.8 and t["y"] > 0.8
    # z-ordered: every file covers a small rectangle in (x, y)
    assert z["x"] < 0.5 and z["y"] < 0.5, z


def test_zorder_layout_is_sticky_and_guarded(spark, tmp_path):
    """cluster_cols persists in TableMeta: a later digest WITHOUT the
    flag keeps the z-order layout; bad columns fail BEFORE the log is
    staged away (no dark rows); day_partitions+cluster is rejected;
    NULLs in one dimension keep the other dimension's locality."""
    from sybil_spark.sources import compact as C
    t = Table(str(tmp_path / "db"), "zs")
    os.makedirs(t.ingest_path, exist_ok=True)
    rows = [(i * 2654435761 % 1000, (i * 40503) % 1000, i)
            for i in range(4000)]
    df = spark.createDataFrame(rows, "x long, y long, time long")
    df.write.mode("append").parquet(t.ingest_path)
    t.save_meta(TableMeta(name="zs", time_col="time"))

    # bad column: raises, and the ingest log is still intact
    with pytest.raises(ValueError, match="not in the ingest log"):
        C.digest(spark, t, cluster_cols=["x", "nope"])
    with pytest.raises(ValueError, match="day_partitions"):
        C.digest(spark, t, cluster_cols=["x", "y"], day_partitions=True)
    assert spark.read.parquet(t.ingest_path).count() == 4000

    assert C.digest(spark, t, chunk_size=1000,
                    cluster_cols=["x", "y"]) == 4000
    assert t.load_meta().cluster_cols == ["x", "y"]

    # second digest with NO flag: layout must stay clustered
    df.write.mode("append").parquet(t.ingest_path)
    assert C.digest(spark, t, chunk_size=1000) == 4000
    import pyarrow.parquet as pq
    spans = []
    files = [f for f in os.listdir(t.blocks_path)
             if f.endswith(".parquet")]
    for f in files:
        md = pq.read_metadata(os.path.join(t.blocks_path, f))
        for colname in ("x", "y"):
            i = md.schema.names.index(colname)
            st = md.row_group(0).column(i).statistics
            spans.append((st.max - st.min) / 1000)
    assert sum(spans) / len(spans) < 0.6, spans

    # NULL in one dim: key still varies with the other dim
    from sybil_spark.functions.zorder import zorder_key
    nd = spark.createDataFrame([(None, 10), (None, 900)],
                               "a bigint, b bigint")
    ks = [r["k"] for r in nd.select(zorder_key(
        [(F.col("a"), 0, 1000), (F.col("b"), 0, 1000)]).alias("k"))
        .collect()]
    assert ks[0] is not None and ks[0] != ks[1]


def test_schema_evolution_across_digests(spark, db, tmp_path):
    """The reference's data model is schema-on-ingest: any record may
    introduce a new column at any time (per-record typed cells,
    src/lib/column_info.go) — so blocks digested before a column
    existed must coexist with blocks that carry it. Spark side:
    every block read goes through mergeSchema=true (table.read,
    digest staging), so old blocks surface the new column as NULL
    and queries on it work across the whole table."""
    t = Table(db, "evolve")
    p1 = _write_ndjson(tmp_path / "b1.ndjson", [
        {"host": "a", "ping": 10, "time": 1_700_000_000},
        {"host": "b", "ping": 20, "time": 1_700_000_060},
    ])
    ingest.ingest_json(spark, p1, t)
    assert compact.digest(spark, t, time_col="time") == 2

    p2 = _write_ndjson(tmp_path / "b2.ndjson", [
        {"host": "a", "ping": 30, "time": 1_700_000_120,
         "region": "eu"},                       # new column appears
        {"host": "c", "ping": 40, "time": 1_700_000_180,
         "region": "us"},
    ])
    ingest.ingest_json(spark, p2, t)
    assert compact.digest(spark, t, time_col="time") == 2

    df = t.read(spark)
    assert df.count() == 4
    rows = {r["host"]: r for r in df.collect()}
    assert rows["a"]["region"] is None or rows["a"]["ping"] == 30
    # pre-evolution rows read NULL region
    assert rows["b"]["region"] is None
    assert rows["c"]["region"] == "us"
    # filters and grouping on the late column span the whole table
    got = (Query.table(df).str_filter("region", "eq", "eu")
                .group_by("host").limit(None).execute(spark).collect())
    assert len(got) == 1
    assert got[0]["host"] == "a" and got[0]["count"] == 1
    grouped = {r["region"]: r["count"]
               for r in Query.table(df).group_by("region")
                             .limit(None).execute(spark).collect()}
    assert grouped == {"eu": 1, "us": 1, None: 2}
    # a later compaction unifies mixed-schema blocks without loss
    compact.compact_blocks(spark, t)
    df2 = t.read(spark)
    assert df2.count() == 4
    assert dict(df2.dtypes)["region"] == "string"


def test_type_conflict_drops_column_from_batch(spark, db, tmp_path):
    """A column arriving with a different type than the table
    registered is dropped from that batch with a warning — the
    reference's failed field write (src/lib/table.go:155-170). The
    table keeps its registered type; later digests of the conflicted
    batch still merge cleanly (no mixed-type parquet in the log)."""
    t = Table(db, "conflict")
    p1 = _write_ndjson(tmp_path / "c1.ndjson",
                       [{"host": "a", "ping": 10, "time": 1}])
    ingest.ingest_json(spark, p1, t)
    assert compact.digest(spark, t, time_col="time") == 1

    p2 = _write_ndjson(tmp_path / "c2.ndjson",
                       [{"host": "b", "ping": "fast", "time": 2}])
    with pytest.warns(UserWarning, match="ping.*conflicts"):
        ingest.ingest_json(spark, p2, t)
    assert compact.digest(spark, t, time_col="time") == 1

    df = t.read(spark)
    assert dict(df.dtypes)["ping"] == "bigint"   # registered type wins
    rows = {r["host"]: r["ping"] for r in df.collect()}
    assert rows == {"a": 10, "b": None}          # conflicted cell dark
