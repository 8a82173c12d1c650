"""Property-based ingest typing: arbitrary JSON records always land
as sybil's three-type model (long / string / string-set), with the
reference's coercions applied (float truncation toward zero,
bool→0/1, nested flatten, arrays deduped) — hypothesis-generated
inputs instead of hand-picked cases (mirrors the reference's
random-record test style, SURVEY.md §5)."""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sybil_spark.sources.ingest import IngestSpec, coerce

scalars = st.one_of(
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False,
              min_value=-1e12, max_value=1e12),
    st.booleans(),
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=12),
)

record = st.fixed_dictionaries({
    "i": st.integers(min_value=-(2**53), max_value=2**53),
    "f": st.floats(allow_nan=False, allow_infinity=False,
                   min_value=-1e12, max_value=1e12),
    "b": st.booleans(),
    "s": st.text(alphabet=st.characters(min_codepoint=32,
                                        max_codepoint=126), max_size=12),
    "arr": st.lists(st.text(alphabet="abcde", min_size=1, max_size=3),
                    min_size=1, max_size=5),
    "nested": st.fixed_dictionaries(
        {"x": st.integers(min_value=-1000, max_value=1000)}),
})


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(recs=st.lists(record, min_size=1, max_size=20))
def test_typing_invariants(spark, tmp_path_factory, recs):
    p = tmp_path_factory.mktemp("prop") / "in.ndjson"
    p.write_text("\n".join(json.dumps(r) for r in recs))
    df = coerce(spark.read.json(str(p)), IngestSpec())
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    # three-type model, nested flattened
    assert types["i"] == "bigint"
    assert types["b"] == "bigint"
    assert types["s"] == "string"
    assert types["arr"] == "array<string>"
    assert types["nested_x"] == "bigint"
    assert types["f"] == "bigint"          # truncate mode (default)

    out = df.collect()
    assert len(out) == len(recs)
    assert sorted(r["i"] for r in out) == sorted(r["i"] for r in recs)
    # float64 -> int64 truncation toward zero
    assert (sorted(int(r["f"]) for r in recs)
            == sorted(r["f"] for r in out))
    # bools become 0/1
    assert sorted(int(r["b"]) for r in recs) == sorted(r["b"] for r in out)
    # arrays deduped
    for r in out:
        assert r["arr"] is None or len(r["arr"]) == len(set(r["arr"]))


lifecycle_batches = st.lists(
    st.lists(st.tuples(st.sampled_from(["h0", "h1", "h2"]),
                       st.integers(min_value=-100, max_value=100),
                       st.integers(min_value=0, max_value=10_000)),
             min_size=1, max_size=12),
    min_size=1, max_size=4)


@given(batches=lifecycle_batches,
       digests=st.lists(st.booleans(), min_size=4, max_size=4))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_ingest_digest_lifecycle_equivalence(spark, tmp_path_factory,
                                             batches, digests):
    """Any interleaving of ingest batches and digests yields the same
    queryable contents as the raw records — the reference's
    steady-ingest/digest stress (scripts/stress_ingest_digest.sh)
    as a property: digest moves data, never changes it."""
    from pyspark.sql import Row
    from sybil_spark.sources import compact
    from sybil_spark.sources.ingest import ingest_df
    from sybil_spark.table import Table

    d = tmp_path_factory.mktemp("lifecycle")
    t = Table(str(d / "db"), "lc")
    expect = []
    for i, batch in enumerate(batches):
        rows = [Row(host=h, ping=p, time=tm) for h, p, tm in batch]
        expect += batch
        ingest_df(spark.createDataFrame(rows), t, time_col="time",
                  auto_digest=False)
        if digests[i % len(digests)]:
            compact.digest(spark, t, time_col="time")
    got = sorted((r["host"], r["ping"], r["time"])
                 for r in t.read(spark, read_log=True).collect())
    assert got == sorted(expect)
    # registry count matches lifetime rows whenever a digest ran
    meta = t.load_meta()
    assert meta.row_count == len(expect)
