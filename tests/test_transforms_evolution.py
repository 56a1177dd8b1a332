"""Canonicalizer registry (T-family) + schema evolution tests."""

import pyarrow as pa
import pytest
from pyspark.sql import functions as F, types as T

from bcdc2bcdc_spark.evolution import (
    SchemaEvolutionError,
    evolve_events,
    reconcile_arrow_batches,
    reconcile_to_schema,
    unioned_schema,
)
from bcdc2bcdc_spark.schema import EVENTS_EVOLVED_SCHEMA, EVENTS_SCHEMA
from bcdc2bcdc_spark.transforms.builtin import BUILTIN_TRANSFORMS
from bcdc2bcdc_spark.transforms.registry import (
    TransformConfig,
    TransformConfigError,
    build_pipeline,
    build_transform,
)


def _df(spark, rows, schema="v string"):
    return spark.createDataFrame(rows, schema)


def test_fix_none_as_string(spark):
    df = _df(spark, [("None",), ("none",), ("ok",), (None,)])
    out = build_transform({"name": "fix_none_as_string", "columns": ["v"]})(df)
    vals = [r["v"] for r in out.collect()]
    assert vals == [None, None, "ok", None]


def test_canonical_nullish_extra(spark):
    df = _df(spark, [("",), ("N/A",), ("n.v.t.",), ("x",)])
    out = build_transform(
        {"name": "canonical_nullish", "columns": ["v"], "extra_nulls": ["n.v.t."]}
    )(df)
    assert [r["v"] for r in out.collect()] == [None, None, None, "x"]


def test_value_remap_and_domain(spark):
    df = _df(spark, [("HIGH-CONFIDENTIAL",), ("LOW",), ("bogus",)])
    remap = build_transform(
        {
            "name": "value_remap",
            "column": "v",
            "mapping": {"HIGH-CONFIDENTIAL": "HIGH-CLASSIFIED"},
        }
    )
    dom = build_transform(
        {
            "name": "domain_validate",
            "column": "v",
            "domain": ["HIGH-CLASSIFIED", "LOW"],
            "default": "HIGH-SENSITIVITY",
        }
    )
    out = dom(remap(df))
    assert [r["v"] for r in out.collect()] == [
        "HIGH-CLASSIFIED",
        "LOW",
        "HIGH-SENSITIVITY",
    ]


def test_word_match_domain(spark):
    df = _df(spark, [("public access",), (None,), ("top secret stuff",), ("???",)])
    t = build_transform(
        {
            "name": "word_match_domain",
            "column": "v",
            "domain": ["Public", "Secret"],
            "default": "Public",
        }
    )
    assert [r["v"] for r in t(df).collect()] == ["Public", "Public", "Secret", "Public"]


def test_canonical_json_arrow(spark):
    df = _df(spark, [('{"b":1,"a":2}',), ("[ 1, 2 ]",), (None,), ("not json",)])
    t = build_transform({"name": "canonical_json", "column": "v"})
    assert [r["v"] for r in t(df).collect()] == [
        '{"a":2,"b":1}',
        "[1,2]",
        "[]",
        "[]",
    ]


def test_rewrite_host(spark):
    df = _df(spark, [("https://src.example/x",), ("https://other/y",), (None,)])
    t = build_transform(
        {
            "name": "rewrite_host",
            "column": "v",
            "src_host": "src.example",
            "dest_host": "dst.example",
            "default": "https://dst.example/",
        }
    )
    assert [r["v"] for r in t(df).collect()] == [
        "https://dst.example/x",
        "https://other/y",
        "https://dst.example/",
    ]


def test_registry_rejects_unknown_and_bad_kwargs():
    with pytest.raises(TransformConfigError):
        build_transform({"name": "no_such_transform"})
    with pytest.raises(TransformConfigError):
        build_transform({"name": "force_constant", "column": "v"})  # missing value


def test_transform_config_phases(spark):
    cfg = TransformConfig(
        {
            "compare": [{"name": "canonical_nullish", "columns": ["v"]}],
            "update": [
                {"name": "canonical_nullish", "columns": ["v"]},
                {"name": "required_default", "column": "v", "default": "d"},
            ],
            "ignore_repos": ["x/y"],
        }
    )
    df = _df(spark, [("",), (None,)])
    assert [r["v"] for r in cfg.apply(df, "compare").collect()] == [None, None]
    assert [r["v"] for r in cfg.apply(df, "update").collect()] == ["d", "d"]
    assert cfg.ignore_repos == ("x/y",)
    with pytest.raises(TransformConfigError):
        cfg.pipeline("nope")
    # every builtin is reachable through config by name
    assert set(BUILTIN_TRANSFORMS) >= {"fix_none_as_string", "canonical_json"}


# ---------------------------------------------------------------------------
# schema evolution
# ---------------------------------------------------------------------------

def test_reconcile_plan_side(spark):
    old = spark.createDataFrame(
        [("r", "p", "c", 1)], "repo string, path string, commit string, event_seq int"
    )
    out = reconcile_to_schema(old, EVENTS_SCHEMA)
    assert [f.name for f in out.schema.fields] == [f.name for f in EVENTS_SCHEMA.fields]
    assert dict(out.dtypes)["event_seq"] == "bigint"  # int32 → int64 widened
    row = out.collect()[0]
    assert row["lang"] is None and row["content"] is None and row["op"] is None


def test_reconcile_rejects_narrowing(spark):
    wide = spark.createDataFrame([(1.5,)], "event_seq double")
    with pytest.raises(SchemaEvolutionError):
        reconcile_to_schema(wide, T.StructType([T.StructField("event_seq", T.LongType())]))


def test_unioned_schema_add_and_widen():
    evolved = unioned_schema(EVENTS_SCHEMA, EVENTS_EVOLVED_SCHEMA)
    names = [f.name for f in evolved.fields]
    assert names == [f.name for f in EVENTS_SCHEMA.fields] + ["size"]
    with pytest.raises(SchemaEvolutionError):
        unioned_schema(
            T.StructType([T.StructField("x", T.StringType())]),
            T.StructType([T.StructField("x", T.LongType())]),
        )


def test_reconcile_arrow_batches_widen_and_fill():
    batch = pa.RecordBatch.from_pydict(
        {"repo": ["a"], "event_seq": pa.array([7], type=pa.int32())}
    )
    target = pa.schema([("repo", pa.string()), ("event_seq", pa.int64()), ("size", pa.int64())])
    out = list(reconcile_arrow_batches(iter([batch]), target))
    assert out[0].schema == target
    assert out[0].column(1).to_pylist() == [7]
    assert out[0].column(2).to_pylist() == [None]


def test_evolve_events_map_in_arrow(spark):
    """Old-schema events (int32 event_seq, no size) flow through the
    mapInArrow reconciliation into the evolved engine schema."""
    old = spark.createDataFrame(
        [("r1", "p1", "c1", "py", "x", "ADD", 1), ("r2", "p2", "c2", None, None, "DELETE", 2)],
        "repo string, path string, commit string, lang string, content string, op string, event_seq int",
    )
    out = evolve_events(old, EVENTS_EVOLVED_SCHEMA)
    assert dict(out.dtypes)["event_seq"] == "bigint"
    rows = out.orderBy("event_seq").collect()
    assert rows[0]["size"] is None and rows[1]["op"] == "DELETE"
    assert out.count() == 2


def test_lake_auto_evolves_on_upsert(spark, tmp_path):
    """M7 end-to-end: an upsert carrying a NEW column widens the table
    schema (metadata-only); old rows read back NULL; later old-schema
    upserts still work (missing column → NULL payload)."""
    from pyspark.sql import functions as F

    from bcdc2bcdc_spark.functions.canonicalize import canonicalize_snapshot
    from bcdc2bcdc_spark.generator import gen_events, gen_repos
    from bcdc2bcdc_spark.operators.lww import lww_dedup
    from bcdc2bcdc_spark.sources.lake import HashBucketParquetTable

    base = canonicalize_snapshot(gen_repos(spark, n_keys=120, seed=31))
    table = HashBucketParquetTable(spark, str(tmp_path / "lake"), n_buckets=8)
    table.init(base)

    ev = gen_events(spark, n_events=400, n_keys=120, n_epochs=1, seed=31).drop("epoch")
    evolved_ev = ev.withColumn("size", F.octet_length("content").cast("long"))
    table.upsert(lww_dedup(evolved_ev))

    out = table.read()
    assert "size" in out.columns and dict(out.dtypes)["size"] == "bigint"
    # untouched base rows backfill NULL; upserted rows carry their size
    assert out.filter(F.col("size").isNotNull()).count() > 0
    assert out.filter(F.col("size").isNull()).count() > 0

    # an OLD-schema producer upserts afterwards: its rows get size=NULL
    old_ev = gen_events(spark, n_events=200, n_keys=120, n_epochs=1, seed=32).drop("epoch")
    old_ev = old_ev.withColumn("event_seq", F.col("event_seq") + 10_000)
    table.upsert(lww_dedup(old_ev))
    assert "size" in table.read().columns  # schema retained

    # narrowing attempt is rejected
    import pytest as _pytest

    from bcdc2bcdc_spark.evolution import SchemaEvolutionError

    bad = ev.withColumn("size", F.lit("not-a-long"))
    with _pytest.raises(SchemaEvolutionError):
        table.upsert(lww_dedup(bad))


def test_compare_set_lockstep_and_redigest(spark, tmp_path):
    """ADVICE regression: (a) an explicit compare set differing from the
    table's persisted one is rejected; (b) an evolved payload column JOINS
    the compare set, so an update changing ONLY that column is applied —
    not silently suppressed as a no-op against stale digests; (c)
    redigest() re-baselines the stored digests to the new compare set."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from bcdc2bcdc_spark.functions.canonicalize import canonicalize_snapshot
    from bcdc2bcdc_spark.generator import gen_repos
    from bcdc2bcdc_spark.sources.lake import HashBucketParquetTable

    base = canonicalize_snapshot(gen_repos(spark, n_keys=40, seed=5))
    table = HashBucketParquetTable(spark, str(tmp_path / "lake"), n_buckets=4)
    table.init(base)
    key = base.select("repo", "path", "lang", "content").first()

    # (a) foreign explicit compare set → rejected
    ch = spark.createDataFrame(
        [(key["repo"], key["path"], "zz", key["lang"], key["content"], "UPDATE", 1)],
        "repo string, path string, commit string, lang string, content string, op string, event_seq long",
    )
    with _pytest.raises(ValueError, match="persisted compare set"):
        table.upsert(ch, compare_cols=("content",))

    # (b) evolve with a `size` column, then update ONLY size for one key
    ev1 = ch.withColumn("size", F.lit(111).cast("long"))
    table.upsert(ev1)
    assert table.resolved_compare_cols() == ["lang", "content", "size"]
    assert table.read().filter(
        (F.col("repo") == key["repo"]) & (F.col("path") == key["path"])
    ).first()["size"] == 111

    ev2 = ev1.withColumn("size", F.lit(222).cast("long")).withColumn(
        "event_seq", F.lit(2).cast("long")
    ).withColumn("commit", F.lit("z2"))
    table.upsert(ev2)
    row = table.read().filter(
        (F.col("repo") == key["repo"]) & (F.col("path") == key["path"])
    ).first()
    assert row["size"] == 222, "size-only update was suppressed as a no-op"

    # (c) redigest restores the fast path and preserves content
    before = sorted(map(tuple, table.read().collect()))
    table.redigest()
    assert table._meta()["digest_cols"] == ["lang", "content", "size"]
    assert sorted(map(tuple, table.read().collect())) == before
    # an identical replay after redigest is still a no-op (digests trusted)
    table.upsert(ev2)
    assert table.read().filter(
        (F.col("repo") == key["repo"]) & (F.col("path") == key["path"])
    ).first()["size"] == 222
