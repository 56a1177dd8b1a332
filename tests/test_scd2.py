"""SCD2 history tests: convergence of the open set with the base table,
as_of reconstruction vs time travel, interval bookkeeping across multiple
advances (update chains, delete→re-add), crash-replay idempotence, and
key-chain bucket co-location."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from bcdc2bcdc_spark.functions.canonicalize import canonicalize_snapshot
from bcdc2bcdc_spark.generator import gen_repos
from bcdc2bcdc_spark.operators.diff import datasets_equal
from bcdc2bcdc_spark.operators.scd2 import SCD2History, VALID_FROM, VALID_TO
from bcdc2bcdc_spark.schema import OP_ADD, OP_DELETE, OP_UPDATE
from bcdc2bcdc_spark.sources.lake import HashBucketParquetTable


@pytest.fixture
def base(spark, tmp_path):
    t = HashBucketParquetTable(
        spark, str(tmp_path / "base"), n_buckets=8, retain_generations=16
    )
    t.init(canonicalize_snapshot(gen_repos(spark, n_keys=200)))
    return t


def _hist(base, tmp_path):
    return SCD2History(base, str(tmp_path / "hist"), n_buckets=4)


def _changes(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, content string, op string",
    )


def _mutate(spark, base, tag):
    """One committed interval: update 2 keys, delete 1, add 1."""
    rows = base.read().orderBy("repo", "path").limit(3).collect()
    u1, u2, d = rows
    base.upsert(
        _changes(
            spark,
            [
                (u1["repo"], u1["path"], f"c-{tag}", u1["lang"], f"v-{tag}-1", OP_UPDATE),
                (u2["repo"], u2["path"], f"c-{tag}", u2["lang"], f"v-{tag}-2", OP_UPDATE),
                (d["repo"], d["path"], None, None, None, OP_DELETE),
                (f"zz-{tag}", "new.py", f"c-{tag}", "zig", f"fresh-{tag}", OP_ADD),
            ],
        )
    )
    return rows


def test_build_then_advance_converges(spark, base, tmp_path):
    h = _hist(base, tmp_path)
    built = h.build()
    assert built == base.commit_seq() == h.tracked_seq()
    assert datasets_equal(h.current(), base.read())
    _mutate(spark, base, "a")
    stats = h.advance()
    assert stats["to_seq"] == base.commit_seq() == h.tracked_seq()
    assert stats["closed"] == 3 and stats["opened"] == 3  # 2 upd + 1 del / 2 upd + 1 add
    assert datasets_equal(h.current(), base.read())


def test_as_of_matches_time_travel(spark, base, tmp_path):
    h = _hist(base, tmp_path)
    h.build()
    v1 = base.commit_seq()
    _mutate(spark, base, "a")
    h.advance()
    v2 = base.commit_seq()
    _mutate(spark, base, "b")
    h.advance()
    v3 = base.commit_seq()
    for v in (v1, v2, v3):
        assert datasets_equal(h.as_of(v), base.read_version(v)), f"as_of({v})"
    with pytest.raises(ValueError, match="never tracked"):
        h.as_of(v1 - 1)


def test_version_chains_and_delete_readd(spark, base, tmp_path):
    h = _hist(base, tmp_path)
    h.build()
    v1 = base.commit_seq()
    rows = _mutate(spark, base, "a")
    h.advance()
    v2 = base.commit_seq()
    u1 = rows[0]
    # update the SAME key again, and re-add the deleted key
    d = rows[2]
    base.upsert(
        _changes(
            spark,
            [
                (u1["repo"], u1["path"], "c-b", u1["lang"], "v-b", OP_UPDATE),
                (d["repo"], d["path"], "c-b", d["lang"], "reborn", OP_ADD),
            ],
        )
    )
    h.advance()
    v3 = base.commit_seq()
    chain = (
        h.history()
        .where((F.col("repo") == u1["repo"]) & (F.col("path") == u1["path"]))
        .orderBy(VALID_FROM)
        .select(VALID_FROM, VALID_TO, "content")
        .collect()
    )
    assert [(r[VALID_FROM], r[VALID_TO]) for r in chain] == [
        (v1, v2),
        (v2, v3),
        (v3, None),
    ]
    assert chain[-1]["content"] == "v-b"
    dchain = (
        h.history()
        .where((F.col("repo") == d["repo"]) & (F.col("path") == d["path"]))
        .orderBy(VALID_FROM)
        .select(VALID_FROM, VALID_TO, "content")
        .collect()
    )
    # closed at v2 by the delete, reborn open at v3 — a gap, not a merge
    assert [(r[VALID_FROM], r[VALID_TO]) for r in dchain] == [(v1, v2), (v3, None)]
    assert dchain[-1]["content"] == "reborn"
    assert datasets_equal(h.current(), base.read())


def test_advance_noop_and_crash_replay(spark, base, tmp_path):
    h = _hist(base, tmp_path)
    h.build()
    assert h.advance()["closed"] == 0
    _mutate(spark, base, "a")
    first = h.advance()
    snap = h.history().collect()
    # crash between the history commit and the state write: roll the state
    # back and replay the same interval — the history must not change
    h._write_state(first["from_seq"])
    again = h.advance()
    assert again["to_seq"] == first["to_seq"]
    # history rows are keyed by (base key, valid_from) — compare on the
    # full history identity, not the base key (chains repeat base keys)
    assert datasets_equal(
        h.history(),
        spark.createDataFrame(snap, h.history().schema),
        key_cols=("repo", "path", VALID_FROM),
        compare_cols=("commit", "lang", "content", VALID_TO),
    )
    assert datasets_equal(h.current(), base.read())


def test_key_chain_colocates_in_one_bucket(spark, base, tmp_path):
    """All versions of a key share a bucket (bucket_cols = base key) —
    the physical invariant that keeps close-the-current-version reads
    pruned."""
    h = _hist(base, tmp_path)
    h.build()
    _mutate(spark, base, "a")
    h.advance()
    _mutate(spark, base, "b")
    h.advance()
    t = h._table()
    seen = {}
    for dirname in glob.glob(os.path.join(t.data_path, "gen-*", "_bucket=*")):
        b = int(dirname.rsplit("=", 1)[1])
        for r in spark.read.parquet(dirname).select("repo", "path").distinct().collect():
            k = (r["repo"], r["path"])
            assert seen.setdefault(k, b) == b, f"key {k} split across buckets"
    multi = (
        h.history().groupBy("repo", "path").count().where(F.col("count") > 1).count()
    )
    assert multi > 0  # the invariant was actually exercised by real chains


def test_crash_replay_with_further_commits_converges(spark, base, tmp_path):
    """Crash between the history commit and the state write, then MORE
    base commits (including a delete of the key the crashed interval
    added): the intent replay closes what the wider net feed would have
    silently skipped."""
    hist = _hist(base, tmp_path)
    hist.build()
    s0 = base.commit_seq()
    base.upsert(
        _changes(spark, [("zz", "crash.py", "c1", "go", "v1", OP_ADD)])
    )
    hist.advance()  # opens (zz, crash.py) at s0+1
    # simulate the crash: state rolled back WITH the intent recorded
    hist._write_state(s0, inflight_to=base.commit_seq())
    # the key is deleted BEFORE the replay runs — the net feed over
    # [s0, head] would contain no trace of it
    base.upsert(
        _changes(spark, [("zz", "crash.py", None, None, None, OP_DELETE)])
    )
    hist.advance()
    # the open version must be CLOSED, and current history == base state
    open_rows = hist.history().where(
        (F.col("path") == "crash.py") & (F.col("valid_to_seq").isNull())
    )
    assert open_rows.count() == 0
    cur = hist.history().where(F.col("valid_to_seq").isNull()).drop(
        "valid_from_seq", "valid_to_seq"
    )
    assert datasets_equal(cur, base.read())
    # and as_of beyond the tracked head refuses rather than serving stale
    with pytest.raises(ValueError, match="advance"):
        hist.as_of(base.commit_seq() + 1)
