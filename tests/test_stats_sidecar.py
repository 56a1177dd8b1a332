"""``stats_storage="sidecar"``: per-generation column bounds in immutable
``_stats/<gen>.json`` files (the Iceberg manifest-file analog, PLANS.md
"manifest scaling curve") — the hot-path manifest stays
O(buckets × MOR depth) regardless of stats columns, while every pruning
path (prune_buckets / read_where / cdclake pushFilters) prunes exactly as
an inline twin does and pruning remains never-load-bearing.

The reference has no scan pruning at all (it filters complete in-memory
dumps, /root/reference/bcdc2bcdc/CKANData.py:1010-1050); the design under
test here is the Iceberg idea — shard file-level stats out of the root
metadata so commit cost stops scaling with stats width.
"""

import os

import pytest
from pyspark.sql import functions as F

from bcdc2bcdc_spark.operators.diff import datasets_equal
from bcdc2bcdc_spark.schema import OP_DELETE, OP_UPDATE
from bcdc2bcdc_spark.sources.lake import (
    HashBucketParquetTable,
    compile_predicates,
)

N_BUCKETS = 8

PREDS = (
    [("lang", "=", "lang3")],
    [("lang", ">=", "lang7")],
    [("lang", "=", "zzz")],
    [("repo", "=", "r3"), ("lang", "=", "lang3")],
)


def _clustered_df(spark, n_repos=8, paths_per_repo=40):
    """lang is a function of repo (same honest shape as test_pruned_scan:
    bounds earn their keep on columns clustered with the bucket cols)."""
    return spark.range(n_repos * paths_per_repo).select(
        F.concat(F.lit("r"), (F.col("id") % n_repos)).alias("repo"),
        F.concat(F.lit("p"), (F.col("id") / n_repos).cast("int")).alias("path"),
        F.concat(F.lit("c"), F.col("id")).alias("commit"),
        F.concat(F.lit("lang"), (F.col("id") % n_repos)).alias("lang"),
        F.concat(F.lit("body-"), F.col("id")).alias("content"),
    )


def _mk(spark, path, storage, write_mode="cow", **kw):
    t = HashBucketParquetTable(
        spark,
        str(path),
        n_buckets=N_BUCKETS,
        bucket_cols=("repo",),
        write_mode=write_mode,
        stats_cols=("lang",),
        stats_storage=storage,
        retain_generations=kw.pop("retain_generations", 8),
        **kw,
    )
    t.init(_clustered_df(spark))
    return t


def _update_frame(spark, repo, path, lang, body="up-body"):
    return spark.createDataFrame(
        [(repo, path, "c-up", lang, body)],
        "repo string, path string, commit string, lang string, content string",
    ).withColumn("op", F.lit(OP_UPDATE))


def _sidecars(t):
    d = os.path.join(t.path, "_stats")
    if not os.path.isdir(d):
        return set()
    return {f[: -len(".json")] for f in os.listdir(d) if f.endswith(".json")}


def _assert_pruned_equals_full(table, preds):
    full = table.read().filter(compile_predicates(preds))
    assert datasets_equal(table.read_where(preds), full)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_sidecar_prunes_like_inline_twin(spark, tmp_path, mode):
    """Twin tables, same data and commits: the sidecar table's manifest
    carries NO stats dict, one sidecar exists per referenced generation,
    and prune_buckets agrees with the inline twin on every predicate."""
    ti = _mk(spark, tmp_path / "inline", "inline", write_mode=mode)
    ts = _mk(spark, tmp_path / "side", "sidecar", write_mode=mode)
    up = _update_frame(spark, "r2", "p1", "migrated")
    ti.upsert(up)
    ts.upsert(up)

    meta = ts._meta()
    assert meta["stats_storage"] == "sidecar"
    assert "stats" not in meta  # the whole point: manifest stays small
    assert _sidecars(ts) >= ts._referenced_gens(meta)
    for p in PREDS:
        assert ts.prune_buckets(p) == ti.prune_buckets(p)
        _assert_pruned_equals_full(ts, p)
    # the moved row is found through sidecar bounds alone
    res = ts.read_where([("lang", "=", "migrated")]).collect()
    assert len(res) == 1 and res[0]["path"] == "p1"


def test_sidecar_delete_tombstones_prune(spark, tmp_path):
    """MOR tombstone generation: all-NULL lang sidecar entry (nonnull=0)
    still excludes, results exact for surviving and deleted values."""
    t = _mk(spark, tmp_path / "t", "sidecar", write_mode="mor")
    victims = t.read().filter("repo = 'r4'").select("repo", "path")
    n = victims.count()
    dels = victims.select(
        "repo",
        "path",
        F.lit(None).cast("string").alias("commit"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("content"),
    ).withColumn("op", F.lit(OP_DELETE))
    t.upsert(dels)
    _assert_pruned_equals_full(t, [("lang", "=", "lang4")])
    assert n > 0 and t.read_where([("lang", "=", "lang4")]).count() == 0


def test_sidecar_wap_abandon_leaves_no_trace(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", "sidecar")
    staged = t.stage_upsert(_update_frame(spark, "r0", "p0", "wap-lang"))
    # sidecar written with the staging's data job, manifest untouched,
    # nothing pending driver-side (the file IS the parking spot)
    assert staged.gen in _sidecars(t)
    assert staged.gen not in t._pending_gen_stats
    assert "stats" not in t._meta()
    staged.abandon()
    assert staged.gen not in _sidecars(t)
    # a published staging prunes from its sidecar
    staged2 = t.stage_upsert(_update_frame(spark, "r0", "p0", "wap-lang"))
    staged2.publish()
    assert "stats" not in t._meta()
    res = t.read_where([("lang", "=", "wap-lang")]).collect()
    assert len(res) == 1 and res[0]["path"] == "p0"


def test_sidecar_gc_sweeps_with_generations(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", "sidecar", retain_generations=1)
    init_gens = set(_sidecars(t))
    t.upsert(_update_frame(spark, "r1", "p0", "moved-0"))
    gen0 = _sidecars(t) - init_gens  # the first upsert's generation
    assert gen0
    for i in range(1, 4):
        t.upsert(_update_frame(spark, "r1", "p0", f"moved-{i}"))
    # gen0 lost its bucket at upsert 1, retired, expired past retention —
    # its sidecar left with the generation dir, and no sidecar ever
    # outlives its generation
    live_dirs = t.fs.list_subdirs(t.data_path)
    assert _sidecars(t) <= live_dirs
    assert not (gen0 & _sidecars(t)) and not (gen0 & live_dirs)
    # orphan sidecar (dir already gone) is swept by the next commit's GC
    orphan = os.path.join(t.path, "_stats", "gen-deadbeef0000.json")
    t.fs.write_json_atomic(orphan, {"0": {"lang": {"min": "a", "max": "b", "nonnull": 1}}})
    t.upsert(_update_frame(spark, "r1", "p0", "moved-final"))
    assert not os.path.exists(orphan)
    _assert_pruned_equals_full(t, [("lang", "=", "moved-final")])


def test_sidecar_missing_file_is_conservative(spark, tmp_path):
    """Deleting a sidecar by hand must never break a read — the
    generation just stops pruning (same contract as a missing inline
    entry after schema evolution)."""
    ti = _mk(spark, tmp_path / "inline", "inline")
    ts = _mk(spark, tmp_path / "side", "sidecar")
    for g in _sidecars(ts):
        ts.fs.remove_file(ts._sidecar_path(g))
    for p in PREDS:
        pruned = ts.prune_buckets(p)
        baseline = ti.prune_buckets(p)
        # still a list (hash pruning on repo may act); never drops a
        # bucket the inline twin keeps
        if pruned is not None and baseline is not None:
            assert set(baseline) <= set(pruned)
        _assert_pruned_equals_full(ts, p)


def test_flip_inline_to_sidecar_and_back(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", "inline")
    assert t._meta().get("stats")  # inline bounds present
    t.set_stats_storage("sidecar")
    t.upsert(_update_frame(spark, "r5", "p2", "post-flip"))
    meta = t._meta()
    # new generation's bounds went to a sidecar; pre-flip inline entries
    # stay in the manifest and both prune together
    new_gens = t._referenced_gens(meta) - set(meta.get("stats", {}))
    assert new_gens and new_gens <= _sidecars(t)
    _assert_pruned_equals_full(t, [("lang", "=", "post-flip")])
    _assert_pruned_equals_full(t, [("lang", "=", "lang3")])
    # flip back: sidecar generations stop pruning (conservative), reads exact
    t.set_stats_storage("inline")
    t.upsert(_update_frame(spark, "r5", "p2", "post-unflip"))
    _assert_pruned_equals_full(t, [("lang", "=", "post-unflip")])
    _assert_pruned_equals_full(t, [("lang", "=", "lang3")])


def test_sidecar_restore_keeps_pruning(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", "sidecar")
    seq0 = t.commit_seq()
    t.delete_where([("repo", "=", "r1")])
    t.restore(seq0)
    _assert_pruned_equals_full(t, [("lang", "=", "lang1")])
    assert t.read().filter("repo = 'r1'").count() > 0
    assert "stats" not in t._meta()


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_sidecar_push_filters(spark, tmp_path, mode):
    """cdclake pushFilters loads sidecars from the planning worker: the
    plan drops provably-empty buckets, conservatively, with e2e parity."""
    from pyspark.sql.datasource import EqualTo

    from bcdc2bcdc_spark.sources.datasource import LakeSnapshotReader, read_snapshot

    t = _mk(spark, tmp_path / "t", "sidecar", write_mode=mode)
    r = LakeSnapshotReader(t.path, None)
    n_all = len(r.partitions())
    r.pushFilters([EqualTo(("lang",), "lang5")])
    n_pruned = len(r.partitions())
    assert n_pruned < n_all
    want = {
        int(row["_b"])
        for row in t.read()
        .filter("lang = 'lang5'")
        .selectExpr(f"pmod(xxhash64(repo), {t.n_buckets}) AS _b")
        .distinct()
        .collect()
    }
    assert {int(b) for b in r._buckets} >= want
    got = (
        read_snapshot(spark, t.path)
        .filter("lang = 'lang5'")
        .select("repo", "path", "lang", "content")
    )
    exp = t.read().filter("lang = 'lang5'").select("repo", "path", "lang", "content")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_stats_storage_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="stats_storage"):
        _mk(spark, tmp_path / "bad", "parquet")
    t = _mk(spark, tmp_path / "t", "inline")
    with pytest.raises(ValueError, match="stats_storage"):
        t.set_stats_storage("nope")
