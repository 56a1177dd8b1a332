"""stream_maintain: one Structured Streaming query keeps every derived
artifact (secondary index, SCD2 history, join view) synced to the base
table — drain-and-stop parity after multi-commit interval batches."""

import pytest
from pyspark.sql import functions as F

from bcdc2bcdc_spark.functions.canonicalize import canonicalize_snapshot
from bcdc2bcdc_spark.generator import gen_repos
from bcdc2bcdc_spark.operators.diff import datasets_equal
from bcdc2bcdc_spark.operators.joinview import IncrementalJoinView
from bcdc2bcdc_spark.operators.scd2 import SCD2History
from bcdc2bcdc_spark.schema import OP_ADD, OP_DELETE, OP_UPDATE
from bcdc2bcdc_spark.sources.index import SecondaryIndex
from bcdc2bcdc_spark.sources.lake import HashBucketParquetTable
from bcdc2bcdc_spark.streaming.maintain import stream_maintain


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string, op string"
    )


def test_stream_maintain_syncs_all_artifacts(spark, tmp_path):
    base = HashBucketParquetTable(
        spark, str(tmp_path / "base"), n_buckets=4, retain_generations=16
    )
    base.init(canonicalize_snapshot(gen_repos(spark, n_keys=150)))
    dim = HashBucketParquetTable(
        spark,
        str(tmp_path / "dim"),
        key_cols=("lang",),
        compare_cols=("family",),
        n_buckets=2,
        retain_generations=16,
    )
    dim.init(
        base.read()
        .select("lang")
        .distinct()
        .withColumn("family", F.concat(F.lit("fam-"), F.col("lang")))
    )
    idx = SecondaryIndex(base, str(tmp_path / "idx"), index_cols=("lang",), n_buckets=2)
    idx.build()
    hist = SCD2History(base, str(tmp_path / "hist"), n_buckets=2)
    hist.build()
    view = IncrementalJoinView(
        base, dim, str(tmp_path / "view"), on=("lang",), how="inner",
        fk_index=idx, n_buckets=4,
    )
    view.build()

    # three base commits while nothing is watching
    rows = base.read().orderBy("repo", "path").limit(2).collect()
    base.upsert(_changes(spark, [("zz", "s1.py", "c", "go", "x", OP_ADD)]))
    base.upsert(
        _changes(
            spark,
            [(rows[0]["repo"], rows[0]["path"], "c", "moved", rows[0]["content"], OP_UPDATE)],
        )
    )
    base.upsert(
        _changes(spark, [(rows[1]["repo"], rows[1]["path"], None, None, None, OP_DELETE)])
    )
    # "moved" is a NEW alt value with no dim row — the inner view drops it
    q = (
        stream_maintain(spark, base.path, [idx, hist, view])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    assert idx.indexed_seq() == base.commit_seq()
    assert hist.tracked_seq() == base.commit_seq()
    assert datasets_equal(
        idx.entries(),
        base.read().where(F.col("lang").isNotNull()).select("lang", "repo", "path"),
        key_cols=("lang", "repo", "path"),
        compare_cols=(),
    )
    cur = hist.history().where(F.col("valid_to_seq").isNull()).drop(
        "valid_from_seq", "valid_to_seq"
    )
    assert datasets_equal(cur, base.read())
    assert datasets_equal(
        view.read(),
        base.read().join(dim.read(), ["lang"], "inner"),
        compare_cols=("commit", "lang", "content", "family"),
    )


def test_stream_maintain_rejects_unknown_artifact(spark, tmp_path):
    from bcdc2bcdc_spark.streaming.maintain import _advance

    with pytest.raises(TypeError, match="no refresh"):
        _advance(object())
