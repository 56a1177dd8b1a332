"""Predicate DML (delete_where / update_where): convergence vs plain
DataFrame semantics, feed visibility (downstream consumers see ordinary
change rows), O(effective changes) commit behavior (no-op ⇒ no commit),
validation, and MOR-mode parity."""

import pytest
from pyspark.sql import functions as F

from bcdc2bcdc_spark.functions.canonicalize import canonicalize_snapshot
from bcdc2bcdc_spark.generator import gen_repos
from bcdc2bcdc_spark.operators.diff import datasets_equal
from bcdc2bcdc_spark.schema import OP_DELETE, OP_UPDATE
from bcdc2bcdc_spark.sources.lake import HashBucketParquetTable


@pytest.fixture(params=["cow", "mor"])
def table(spark, tmp_path, request):
    t = HashBucketParquetTable(
        spark,
        str(tmp_path / "t"),
        n_buckets=8,
        write_mode=request.param,
        retain_generations=8,
    )
    t.init(canonicalize_snapshot(gen_repos(spark, n_keys=400)))
    return t


def test_delete_where_converges_and_feeds(spark, table):
    before = table.read().persist()
    victims = before.where("lang = 'py'")
    n_victims = victims.count()
    assert n_victims > 0
    seq0 = table.commit_seq()

    n = table.delete_where(F.col("lang") == "py")
    assert n == n_victims
    assert table.commit_seq() == seq0 + 1
    assert datasets_equal(table.read(), before.where("lang <> 'py' OR lang IS NULL"))
    # the deletion is ordinary feed traffic: DELETE rows with pre-images
    feed = table.read_changes(seq0, seq0 + 1, include_pre=True)
    assert feed.where(F.col("op") != OP_DELETE).count() == 0
    assert feed.count() == n_victims
    assert feed.where(F.col("pre_lang") == "py").count() == n_victims
    before.unpersist()


def test_delete_where_no_match_no_commit(table):
    seq0 = table.commit_seq()
    assert table.delete_where("lang = 'no-such-lang'") == 0
    assert table.commit_seq() == seq0


def test_update_where_converges_and_feeds(spark, table):
    before = table.read().persist()
    n_match = before.where("lang = 'go'").count()
    assert n_match > 0
    seq0 = table.commit_seq()

    n = table.update_where(
        F.col("lang") == "go",
        {"content": F.concat(F.col("content"), F.lit("+go"))},
    )
    assert n == n_match
    expected = before.select(
        "repo",
        "path",
        "commit",
        "lang",
        F.when(
            F.col("lang") == "go", F.concat(F.col("content"), F.lit("+go"))
        ).otherwise(F.col("content")).alias("content"),
    )
    assert datasets_equal(table.read(), expected)
    feed = table.read_changes(seq0, seq0 + 1)
    assert feed.where(F.col("op") != OP_UPDATE).count() == 0
    assert feed.count() == n_match
    before.unpersist()


def test_update_where_sql_string_forms(spark, table):
    """Predicate and assignments as SQL strings (the ergonomic form)."""
    want = table.read().where("lang = 'rs'").count()
    n = table.update_where("lang = 'rs'", {"content": "upper(content)"})
    assert n == want
    assert (
        table.read().where("lang = 'rs' AND content <> upper(content)").count()
        == 0
    )


def test_update_where_noop_assignment_no_commit(table):
    seq0 = table.commit_seq()
    # identity assignment: zero effectively-changed rows ⇒ zero commits
    assert table.update_where("lang = 'go'", {"content": F.col("content")}) == 0
    assert table.commit_seq() == seq0
    # null-safe: assigning NULL where already NULL is also a no-op
    assert (
        table.update_where(
            "content IS NULL", {"content": F.lit(None).cast("string")}
        )
        == 0
    )
    assert table.commit_seq() == seq0


def test_update_where_validation(table):
    with pytest.raises(ValueError, match="key columns"):
        table.update_where("lang = 'go'", {"repo": F.lit("x")})
    with pytest.raises(ValueError, match="not in table schema"):
        table.update_where("lang = 'go'", {"nope": F.lit("x")})


def test_dml_drives_downstream_consumers(spark, table, tmp_path):
    """An update that moves alt-key values and a predicate delete are
    observed by a feed consumer (secondary index) with no special cases."""
    from bcdc2bcdc_spark.sources.index import SecondaryIndex

    idx = SecondaryIndex(
        table, str(tmp_path / "idx"), index_cols=("lang",), n_buckets=4
    )
    idx.build()
    table.update_where("lang = 'go'", {"lang": F.lit("golang")})
    table.delete_where("lang = 'py'")
    idx.refresh()
    assert datasets_equal(
        idx.entries(),
        table.read().where(F.col("lang").isNotNull()).select("lang", "repo", "path"),
        key_cols=("lang", "repo", "path"),
        compare_cols=(),
    )
    assert idx.lookup(
        spark.createDataFrame([("py",)], "lang string")
    ).count() == 0
    got = idx.lookup(spark.createDataFrame([("golang",)], "lang string"))
    assert datasets_equal(got, table.read().where("lang = 'golang'"))
