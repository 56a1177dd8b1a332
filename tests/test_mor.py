"""Merge-on-read lake mode: read-time merge parity with copy-on-write,
tombstone semantics, delta compaction, time travel over deltas, mode
switching, schema evolution through the delta path, and the full pipeline
convergence contract on a MOR table."""

import pytest
from pyspark.sql import functions as F

from bcdc2bcdc_spark.functions.canonicalize import canonicalize_events, canonicalize_snapshot
from bcdc2bcdc_spark.generator import gen_events, gen_repos
from bcdc2bcdc_spark.operators.diff import datasets_equal
from bcdc2bcdc_spark.operators.lww import lww_dedup
from bcdc2bcdc_spark.plans.checkpoint import CheckpointStore
from bcdc2bcdc_spark.plans.pipeline import CDCPipeline
from bcdc2bcdc_spark.sources.lake import HashBucketParquetTable


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _epoch_winners(spark, n_epochs=3, seed=7, n_events=3000, n_keys=400):
    """Key-unique per-epoch change sets (the upsert precondition)."""
    ev = canonicalize_events(
        gen_events(spark, n_events=n_events, n_keys=n_keys, n_epochs=n_epochs, seed=seed)
    )
    return [
        lww_dedup(ev.filter(F.col("epoch") == e).drop("epoch"))
        for e in range(n_epochs)
    ]


@pytest.fixture
def twin_tables(spark, tmp_path):
    """Identically initialized cow + mor tables."""
    base = canonicalize_snapshot(gen_repos(spark, n_keys=400, seed=7))
    cow = HashBucketParquetTable(spark, str(tmp_path / "cow"), n_buckets=8)
    mor = HashBucketParquetTable(
        spark, str(tmp_path / "mor"), n_buckets=8, write_mode="mor"
    )
    cow.init(base)
    mor.init(base)
    return cow, mor


def test_mor_read_equals_cow_including_commit(spark, twin_tables):
    """The read-time fold reproduces apply_changes EXACTLY — including
    no-op suppression (a digest-equal upsert keeps the base row's commit),
    DELETE tombstones, and delete-on-missing no-ops."""
    cow, mor = twin_tables
    for winners in _epoch_winners(spark):
        cow.upsert(winners)
        mor.upsert(winners)
    # full-row equality (commit included) — stricter than datasets_equal
    assert _rows(cow.read()) == _rows(mor.read())
    # and the mor table really did take the delta path: no base rewrites
    assert mor._meta()["deltas"]


def test_mor_write_amplification_is_o_changes(spark, twin_tables):
    """Scale property: a MOR upsert must not rewrite base buckets — every
    base generation file survives untouched."""
    import glob
    import os

    _, mor = twin_tables
    before = set(glob.glob(os.path.join(mor.data_path, "*", "_bucket=*", "*.parquet")))
    one = mor.read().limit(1).withColumn("op", F.lit("UPDATE")).withColumn(
        "content", F.lit("hot-bucket-update")
    )
    mor.upsert(one)
    assert before <= set(
        glob.glob(os.path.join(mor.data_path, "*", "_bucket=*", "*.parquet"))
    )
    assert mor.read().filter(F.col("content") == "hot-bucket-update").count() == 1


def test_mor_compact_deltas_is_content_preserving(spark, twin_tables):
    cow, mor = twin_tables
    for winners in _epoch_winners(spark):
        mor.upsert(winners)
        cow.upsert(winners)
    before = _rows(mor.read())
    folded = mor.compact_deltas()
    assert folded  # something was outstanding
    assert mor._meta()["deltas"] == {}
    assert _rows(mor.read()) == before == _rows(cow.read())
    # compaction is idempotent / no-op when nothing is outstanding
    assert mor.compact_deltas() == []


def test_mor_compact_threshold(spark, twin_tables):
    """max_deltas folds only buckets deeper than the threshold."""
    _, mor = twin_tables
    winners = _epoch_winners(spark, n_epochs=2)
    mor.upsert(winners[0])
    mor.upsert(winners[1])
    depths = {b: len(v) for b, v in mor._meta()["deltas"].items()}
    deep = sorted(int(b) for b, d in depths.items() if d > 1)
    folded = mor.compact_deltas(max_deltas=1)
    assert sorted(folded) == deep
    left = mor._meta()["deltas"]
    assert all(len(v) <= 1 for v in left.values())


def test_mor_time_travel_folds_historical_deltas(spark, tmp_path):
    """read_version(v) on a MOR table equals the prefix replay at v —
    the frozen manifest's delta lists merge exactly like the live read."""
    base = canonicalize_snapshot(gen_repos(spark, n_keys=300, seed=11))
    mor = HashBucketParquetTable(
        spark, str(tmp_path / "tt"), n_buckets=8, write_mode="mor",
        retain_generations=10,
    )
    mor.init(base)
    winners = _epoch_winners(spark, n_epochs=3, seed=11, n_keys=300)
    snaps = {1: _rows(mor.read())}
    for i, w in enumerate(winners):
        mor.upsert(w)
        snaps[i + 2] = _rows(mor.read())
    for seq, expect in snaps.items():
        assert _rows(mor.read_version(seq)) == expect


def test_mor_cow_mode_switch_folds_touched_deltas(spark, twin_tables):
    """Flipping a delta-bearing table to cow: the next upsert reads the
    MERGED base and its commit clears the touched buckets' delta lists."""
    cow, mor = twin_tables
    winners = _epoch_winners(spark, n_epochs=2)
    mor.upsert(winners[0])
    cow.upsert(winners[0])
    mor.set_write_mode("cow")
    mor.upsert(winners[1])
    cow.upsert(winners[1])
    assert _rows(mor.read()) == _rows(cow.read())
    # buckets rewritten by the cow upsert no longer carry deltas
    touched = {
        str(r["_b"])
        for r in winners[1].select(mor.bucket_expr().alias("_b")).distinct().collect()
    }
    assert touched.isdisjoint(mor._meta()["deltas"].keys())


def test_mor_schema_evolution_through_delta_path(spark, tmp_path):
    """An upsert carrying a NEW payload column on a MOR table widens the
    schema; merged reads NULL-backfill old base rows and old delta files."""
    base = canonicalize_snapshot(gen_repos(spark, n_keys=50, seed=5))
    mor = HashBucketParquetTable(
        spark, str(tmp_path / "ev"), n_buckets=4, write_mode="mor"
    )
    mor.init(base)
    wide = (
        mor.read()
        .limit(3)
        .withColumn("op", F.lit("UPDATE"))
        .withColumn("content", F.lit("widened"))
        .withColumn("stars", F.lit(5).cast("int"))
    )
    mor.upsert(wide)
    out = mor.read()
    assert "stars" in out.columns
    assert out.filter(F.col("stars") == 5).count() == 3
    assert out.filter(F.col("stars").isNull()).count() == out.count() - 3
    # compaction folds the evolved rows losslessly
    before = _rows(out)
    mor.compact_deltas()
    assert _rows(mor.read()) == before


def test_mor_pipeline_convergence(spark, tmp_path):
    """CDCPipeline over a MOR table: same epochs, same final state as the
    CoW pipeline — the engine contract is mode-independent."""
    base = canonicalize_snapshot(gen_repos(spark, n_keys=300, seed=13))
    ev = gen_events(spark, n_events=4000, n_keys=300, n_epochs=3, seed=13)

    def run(mode, name):
        t = HashBucketParquetTable(
            spark, str(tmp_path / name), n_buckets=8, write_mode=mode
        )
        t.init(base)
        CDCPipeline(
            table=t, checkpoints=CheckpointStore(str(tmp_path / f"{name}_ckpt"))
        ).run(ev)
        return t

    t_cow = run("cow", "cow")
    t_mor = run("mor", "mor")
    assert _rows(t_mor.read()) == _rows(t_cow.read())
    assert datasets_equal(t_mor.read(), t_cow.read())


def test_mor_crash_before_commit_leaves_state_intact(spark, twin_tables):
    """A MOR staging that never commits (crash between write and manifest
    swap) is invisible: reads see the pre-upsert state."""
    _, mor = twin_tables
    before = _rows(mor.read())
    winners = _epoch_winners(spark, n_epochs=1)[0]

    orig = mor._finalize_commit
    mor._finalize_commit = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash"))
    try:
        with pytest.raises(RuntimeError):
            mor.upsert(winners)
    finally:
        mor._finalize_commit = orig
    assert _rows(mor.read()) == before
    # retry after the "crash" succeeds and applies exactly once
    mor.upsert(winners)
    assert mor._meta()["deltas"]
