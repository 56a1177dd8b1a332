"""Write-time sort clustering (cluster_cols — single-dimension Delta
OPTIMIZE ZORDER BY / Iceberg sort-order analog): generation files are
sorted within each bucket by the declared columns, making parquet
row-group min/max stats selective for predicates on them. Clustering is a
physical-layout property only — every read path must be unchanged.

The reference has no physical layout at all (complete in-memory dumps,
/root/reference/bcdc2bcdc/CKANData.py:1010-1050); this is the knob a
100 TB table needs so a range predicate on a non-bucket column skips row
groups instead of decoding every page of every surviving bucket.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from bcdc2bcdc_spark.operators.diff import datasets_equal
from bcdc2bcdc_spark.sources.lake import HashBucketParquetTable

N_BUCKETS = 4


def _df(spark, n=400):
    return spark.range(n).select(
        F.concat(F.lit("r"), (F.col("id") % 7)).alias("repo"),
        F.concat(F.lit("p"), F.col("id")).alias("path"),
        F.concat(F.lit("c"), F.col("id")).alias("commit"),
        F.concat(F.lit("L"), (F.col("id") % 3)).alias("lang"),
        # high-cardinality, ordered ≠ key order: zero-padded reverse id
        F.lpad((F.lit(10**6) - F.col("id")).cast("string"), 8, "0").alias("content"),
    )


def _gen_files(table, newest_only=False):
    """All parquet files of the table's data dir, grouped per file."""
    files = glob.glob(os.path.join(table.data_path, "gen-*", "_bucket=*", "*.parquet"))
    assert files
    return files


def _col_values_per_file(files, col):
    out = {}
    for f in files:
        t = pq.read_table(f, columns=[col])
        out[f] = t.column(col).to_pylist()
    return out


def _assert_sorted_within_files(files, col):
    for f, vals in _col_values_per_file(files, col).items():
        assert vals == sorted(vals), f"{col} not sorted within {f}"


def test_cluster_cols_sort_generation_files(spark, tmp_path):
    t = HashBucketParquetTable(
        spark,
        str(tmp_path / "t"),
        key_cols=("repo", "path"),
        n_buckets=N_BUCKETS,
        compare_cols=("lang", "content"),
        cluster_cols=("content",),
    )
    t.init(_df(spark))
    _assert_sorted_within_files(_gen_files(t), "content")
    # and reads are unchanged: layout only
    assert t.read().count() == 400
    assert datasets_equal(
        t.read(), _df(spark), key_cols=("repo", "path"), compare_cols=("lang", "content")
    )


def test_default_sort_is_key_order(spark, tmp_path):
    """Regression: without cluster_cols the files stay key-sorted (the
    point-lookup row-group locality from the key-sorted write path)."""
    t = HashBucketParquetTable(
        spark, str(tmp_path / "t"), key_cols=("repo", "path"), n_buckets=N_BUCKETS,
        compare_cols=("lang", "content"),
    )
    t.init(_df(spark))
    for f, vals in _col_values_per_file(
        _gen_files(t), "repo"
    ).items():  # leading key column non-decreasing
        assert vals == sorted(vals), f"repo not sorted within {f}"


def test_cluster_cols_persisted_and_flippable(spark, tmp_path):
    t = HashBucketParquetTable(
        spark,
        str(tmp_path / "t"),
        key_cols=("repo", "path"),
        n_buckets=N_BUCKETS,
        compare_cols=("lang", "content"),
        cluster_cols=("content",),
    )
    t.init(_df(spark, 200))
    # a fresh handle WITHOUT the ctor arg resolves the persisted set and
    # writes the next generation clustered
    t2 = HashBucketParquetTable(
        spark, str(tmp_path / "t"), key_cols=("repo", "path"), n_buckets=N_BUCKETS,
        compare_cols=("lang", "content"),
    )
    assert t2._cluster_cols_resolved() == ["content"]
    before = set(_gen_files(t))
    t2.upsert(
        _df(spark, 300).withColumn("op", F.lit("UPDATE")).withColumn(
            "event_seq", F.col("path").substr(2, 10).cast("long")
        )
    )
    new = [f for f in _gen_files(t2) if f not in before]
    assert new
    _assert_sorted_within_files(new, "content")
    # flip back to key order — a real commit
    seq = t2.commit_seq()
    t2.set_cluster_cols(())
    assert t2.commit_seq() == seq + 1
    assert t2._cluster_cols_resolved() == []
    # same-value flip: no commit
    t2.set_cluster_cols(())
    assert t2.commit_seq() == seq + 1
    before = set(_gen_files(t2))
    t2.upsert(
        _df(spark, 100).withColumn("op", F.lit("UPDATE")).withColumn(
            "event_seq", 10**7 + F.col("path").substr(2, 10).cast("long")
        )
    )
    newest = [f for f in _gen_files(t2) if f not in before]
    assert newest
    _assert_sorted_within_files(newest, "repo")


def test_clustered_read_where_parity(spark, tmp_path):
    """Clustering + stats + pruning compose; results still equal the
    unpruned filtered read in both write modes."""
    for mode in ("cow", "mor"):
        t = HashBucketParquetTable(
            spark,
            str(tmp_path / f"t_{mode}"),
            key_cols=("repo", "path"),
            bucket_cols=("repo",),
            n_buckets=N_BUCKETS,
            compare_cols=("lang", "content"),
            cluster_cols=("content",),
            stats_cols=("content",),
            write_mode=mode,
        )
        t.init(_df(spark))
        t.upsert(
            _df(spark, 120).withColumn("lang", F.lit("L9"))
            .withColumn("op", F.lit("UPDATE"))
            .withColumn("event_seq", F.col("path").substr(2, 10).cast("long"))
        )
        preds = [("repo", "in", ("r1", "r5")), ("content", "between", ("00999700", "00999900"))]
        got = t.read_where(preds)
        from bcdc2bcdc_spark.sources.lake import compile_predicates

        want = t.read().filter(compile_predicates(preds))
        assert datasets_equal(
            got, want, key_cols=("repo", "path"), compare_cols=("lang", "content")
        )
        assert got.count() > 0  # non-vacuous


def test_set_cluster_cols_concurrency_guard(spark, tmp_path):
    """A commit landing between two handles' flips: second writer must not
    silently revert — it either sees the new seq (wins cleanly) or loses
    with ConcurrentWriteError. Here we just assert the flip is a real
    commit visible cross-handle."""
    t = HashBucketParquetTable(
        spark, str(tmp_path / "t"), key_cols=("repo", "path"), n_buckets=N_BUCKETS,
        compare_cols=("lang", "content"),
    )
    t.init(_df(spark, 50))
    other = HashBucketParquetTable(
        spark, str(tmp_path / "t"), key_cols=("repo", "path"), n_buckets=N_BUCKETS,
        compare_cols=("lang", "content"),
    )
    t.set_cluster_cols(("content",))
    assert other._cluster_cols_resolved() == ["content"]
