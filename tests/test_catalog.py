"""LakeCatalog: consistent cross-table snapshots (a version's reads form
one join surface), latest-default reads, coordinated multi-table
rollback, and the registration/partial-failure contracts."""

import pytest
from pyspark.sql import functions as F

from bcdc2bcdc_spark.functions.canonicalize import canonicalize_snapshot
from bcdc2bcdc_spark.generator import gen_repos
from bcdc2bcdc_spark.operators.diff import datasets_equal
from bcdc2bcdc_spark.schema import OP_ADD, OP_UPDATE
from bcdc2bcdc_spark.sources.catalog import LakeCatalog
from bcdc2bcdc_spark.sources.lake import HashBucketParquetTable


def _lchanges(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string, op string"
    )


def _rchanges(spark, rows):
    return spark.createDataFrame(rows, "lang string, family string, op string")


@pytest.fixture
def cat(spark, tmp_path):
    facts = HashBucketParquetTable(
        spark, str(tmp_path / "facts"), n_buckets=4, retain_generations=16
    )
    facts.init(canonicalize_snapshot(gen_repos(spark, n_keys=80)))
    dim = HashBucketParquetTable(
        spark,
        str(tmp_path / "dim"),
        key_cols=("lang",),
        compare_cols=("family",),
        n_buckets=2,
        retain_generations=16,
    )
    dim.init(
        facts.read()
        .select("lang")
        .distinct()
        .withColumn("family", F.concat(F.lit("fam-"), F.col("lang")))
    )
    c = LakeCatalog(str(tmp_path / "cat"))
    c.register("facts", facts).register("dim", dim)
    return c, facts, dim


def test_snapshot_pins_a_consistent_join_surface(spark, cat):
    c, facts, dim = cat
    v1 = c.snapshot()
    j1 = c.read("facts", v1).join(c.read("dim", v1), ["lang"], "inner").collect()

    # advance BOTH tables past the snapshot
    row = facts.read().orderBy("repo", "path").limit(1).collect()[0]
    facts.upsert(
        _lchanges(spark, [(row["repo"], row["path"], "c", row["lang"], "v2", OP_UPDATE)])
    )
    dim.upsert(_rchanges(spark, [(row["lang"], "fam-MOVED", OP_UPDATE)]))

    # the pinned surface is frozen: same join, same rows, no fam-MOVED
    j1_again = c.read("facts", v1).join(c.read("dim", v1), ["lang"], "inner")
    assert {tuple(r) for r in j1_again.collect()} == {tuple(r) for r in j1}
    assert j1_again.where(F.col("family") == "fam-MOVED").count() == 0

    # a new snapshot sees the new state; default read = latest
    v2 = c.snapshot()
    assert v2 == v1 + 1
    assert c.read("dim").where(F.col("family") == "fam-MOVED").count() == 1
    assert sorted(c.versions()) == [v1, v2]


def test_coordinated_restore(spark, cat):
    c, facts, dim = cat
    v1 = c.snapshot()
    good_facts = facts.read().collect()
    good_dim = dim.read().collect()

    facts.upsert(_lchanges(spark, [("zz", "bad.py", "c", "go", "oops", OP_ADD)]))
    dim.upsert(_rchanges(spark, [("go", "fam-BAD", OP_UPDATE)]))

    v_restored = c.restore(v1)
    assert v_restored > v1
    assert datasets_equal(
        facts.read(), spark.createDataFrame(good_facts, facts.read().schema)
    )
    assert datasets_equal(
        dim.read(),
        spark.createDataFrame(good_dim, dim.read().schema),
        key_cols=("lang",),
        compare_cols=("family",),
    )
    # rollback published as a catalog version: latest reads see it
    assert c.read("facts").where("path = 'bad.py'").count() == 0
    # table histories were NOT rewritten
    assert facts.commit_seq() > 2


def test_restore_requires_registration(spark, cat, tmp_path):
    c, facts, dim = cat
    v1 = c.snapshot()
    c2 = LakeCatalog(str(tmp_path / "cat"))  # same state file, no tables
    c2.register("facts", facts)
    with pytest.raises(ValueError, match="unregistered tables"):
        c2.restore(v1)


def test_read_contracts(cat):
    c, facts, dim = cat
    with pytest.raises(ValueError, match="no catalog snapshot yet"):
        c.read("facts")
    v1 = c.snapshot()
    with pytest.raises(ValueError, match="not registered"):
        c.read("nope", v1)
    with pytest.raises(ValueError, match="no catalog version"):
        c.read("facts", 99)


def test_transaction_commit_is_catalog_visible_atomically(spark, cat):
    c, facts, dim = cat
    v0 = c.snapshot()
    fs0, ds0 = facts.commit_seq(), dim.commit_seq()

    tx = c.transaction()
    tx.stage("facts", _lchanges(spark, [("zz", "tx.py", "c", "zig", "x", OP_ADD)]))
    tx.stage("dim", _rchanges(spark, [("zig", "fam-zig", OP_ADD)]))
    # cross-table audit on the WOULD-BE states: the new fact's FK resolves
    # against the staged dim — before anything is committed
    dangling = tx.read("facts").join(
        tx.read("dim"), ["lang"], "left_anti"
    )
    assert dangling.count() == 0
    assert facts.commit_seq() == fs0 and dim.commit_seq() == ds0  # nothing moved
    v1 = tx.commit()
    assert v1 == v0 + 1
    assert facts.commit_seq() == fs0 + 1 and dim.commit_seq() == ds0 + 1
    assert c.read("facts", v1).where("path = 'tx.py'").count() == 1
    assert c.read("dim", v1).where("lang = 'zig'").count() == 1
    # catalog surface of v0 still consistent (no zig anywhere)
    assert c.read("facts", v0).where("lang = 'zig'").count() == 0
    assert c.read("dim", v0).where("lang = 'zig'").count() == 0


def test_transaction_abort_leaves_no_trace(spark, cat):
    c, facts, dim = cat
    fs0, ds0 = facts.commit_seq(), dim.commit_seq()
    before = facts.read().collect()
    tx = c.transaction()
    tx.stage("facts", _lchanges(spark, [("zz", "bad.py", "c", "go", "POISON", OP_ADD)]))
    tx.stage("dim", _rchanges(spark, [("go", "fam-POISON", OP_UPDATE)]))
    assert tx.read("facts").where("content = 'POISON'").count() == 1
    tx.abort()
    assert facts.commit_seq() == fs0 and dim.commit_seq() == ds0
    assert datasets_equal(
        facts.read(), spark.createDataFrame(before, facts.read().schema)
    )
    with pytest.raises(RuntimeError, match="already aborted"):
        tx.commit()


def test_transaction_conflict_aborts_remaining(spark, cat):
    c, facts, dim = cat
    tx = c.transaction()
    tx.stage("dim", _rchanges(spark, [("go", "fam-TX", OP_UPDATE)]))
    tx.stage("facts", _lchanges(spark, [("zz", "tx2.py", "c", "go", "x", OP_ADD)]))
    # an external writer lands on dim between staging and publish
    dim.upsert(_rchanges(spark, [("md", "fam-EXT", OP_UPDATE)]))
    from bcdc2bcdc_spark.sources.lake import ConcurrentWriteError

    with pytest.raises(ConcurrentWriteError):
        tx.commit()
    assert tx.done == "aborted"
    # dim kept only the external commit; facts staging was abandoned
    assert dim.read().where("family = 'fam-TX'").count() == 0
    assert facts.read().where("path = 'tx2.py'").count() == 0


def test_transaction_lifecycle_guards(spark, cat):
    c, facts, dim = cat
    tx = c.transaction()
    tx.stage("facts", _lchanges(spark, [("zz", "a.py", "c", "go", "x", OP_ADD)]))
    with pytest.raises(ValueError, match="already staged"):
        tx.stage("facts", _lchanges(spark, [("zz", "b.py", "c", "go", "x", OP_ADD)]))
    tx.commit()
    with pytest.raises(RuntimeError, match="already committed"):
        tx.stage("dim", _rchanges(spark, [("go", "f", OP_UPDATE)]))
    with pytest.raises(RuntimeError, match="already committed"):
        tx.abort()
