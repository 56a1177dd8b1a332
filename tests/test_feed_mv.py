"""Change data feed (read_changes) + incremental aggregate maintenance:
feed ≡ snapshot_diff of the two versions, manifest-diff bucket pruning,
compaction produces an EMPTY feed (rewrite ≠ change), pre/post images,
and the MV invariant apply_delta(full(v_a), delta(feed)) == full(v_b)
through group birth and death."""

import pytest
from pyspark.sql import functions as F

from bcdc2bcdc_spark.functions.canonicalize import canonicalize_events, canonicalize_snapshot
from bcdc2bcdc_spark.generator import gen_events, gen_repos
from bcdc2bcdc_spark.operators.diff import snapshot_diff
from bcdc2bcdc_spark.operators.lww import lww_dedup
from bcdc2bcdc_spark.operators.mv import IncrementalAggregate
from bcdc2bcdc_spark.sources.lake import HashBucketParquetTable


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(params=["cow", "mor"])
def versioned_table(request, spark, tmp_path):
    """A table with three committed versions (init + two epochs), in both
    write modes — the feed must be mode-independent."""
    base = canonicalize_snapshot(gen_repos(spark, n_keys=400, seed=7))
    t = HashBucketParquetTable(
        spark,
        str(tmp_path / request.param),
        n_buckets=8,
        write_mode=request.param,
        retain_generations=10,
    )
    t.init(base)
    ev = canonicalize_events(
        gen_events(spark, n_events=3000, n_keys=400, n_epochs=2, seed=7)
    )
    for e in range(2):
        t.upsert(lww_dedup(ev.filter(F.col("epoch") == e).drop("epoch")))
    return t


def test_feed_equals_snapshot_diff(spark, versioned_table):
    t = versioned_table
    for a, b in [(1, 2), (2, 3), (1, 3)]:
        feed = t.read_changes(a, b)
        sd = snapshot_diff(t.read_version(b), t.read_version(a), canonicalize=False)
        cols = ["repo", "path", "lang", "content", "op"]
        assert _rows(feed.select(*cols)) == _rows(sd.select(*cols)), (a, b)


def test_feed_pre_post_images(spark, versioned_table):
    t = versioned_table
    feed = t.read_changes(2, 3, include_pre=True).cache()
    # ADD: no pre-image; DELETE: no post-image; UPDATE: both
    assert feed.filter((F.col("op") == "ADD") & F.col("pre_content").isNotNull()).count() == 0
    assert feed.filter((F.col("op") == "DELETE") & F.col("content").isNotNull()).count() == 0
    upd = feed.filter(F.col("op") == "UPDATE")
    assert upd.count() > 0
    # an UPDATE's pre-image is version a's row, post-image version b's
    va = t.read_version(2).select("repo", "path", F.col("content").alias("pre_content"))
    mismatch = upd.select("repo", "path", "pre_content").exceptAll(
        va.join(upd.select("repo", "path"), ["repo", "path"]).select(
            "repo", "path", "pre_content"
        )
    )
    assert mismatch.count() == 0
    feed.unpersist()


def test_feed_bucket_pruning_single_key(spark, versioned_table):
    """A one-key change yields exactly one changed bucket — the feed's
    read cost is O(changed buckets), proven by the manifest diff."""
    t = versioned_table
    one = (
        t.read()
        .limit(1)
        .withColumn("op", F.lit("UPDATE"))
        .withColumn("content", F.lit("pruned-update"))
    )
    t.upsert(one)
    v = t.commit_seq()
    changed = t.changed_buckets(v - 1, v)
    assert len(changed) == 1
    feed = t.read_changes(v - 1, v)
    assert _rows(feed.select("content", "op")) == [("pruned-update", "UPDATE")]


def test_compaction_is_not_a_change(spark, versioned_table):
    """Maintenance rewrites (compact/compact_deltas) advance the version
    but the feed across them is EMPTY — rewritten bytes, identical state."""
    t = versioned_table
    before = t.commit_seq()
    folded = t.compact_deltas()
    compacted = t.compact(max_files_per_bucket=0)
    if not folded and not compacted:
        pytest.skip("nothing to rewrite at this scale")
    after = t.commit_seq()
    assert after > before
    assert t.read_changes(before, after).count() == 0
    # ...even though buckets DID change at the manifest level
    assert t.changed_buckets(before, after)


def test_feed_validation_errors(spark, versioned_table):
    t = versioned_table
    with pytest.raises(ValueError, match="from_seq < to_seq"):
        t.read_changes(3, 3)
    with pytest.raises(ValueError, match="no manifest"):
        t.read_changes(2, 99)


def test_feed_across_schema_evolution(spark, tmp_path):
    """Feed spanning an evolve(): digests are recomputed over the newer
    compare set; the old side NULL-backfills, and only truly-changed rows
    surface."""
    base = canonicalize_snapshot(gen_repos(spark, n_keys=60, seed=5))
    t = HashBucketParquetTable(
        spark, str(tmp_path / "ev"), n_buckets=4, retain_generations=10
    )
    t.init(base)  # v1
    wide = (
        t.read()
        .limit(3)
        .withColumn("op", F.lit("UPDATE"))
        .withColumn("stars", F.lit(7).cast("int"))
    )
    t.upsert(wide)  # v2 — adds the stars column, 3 rows change
    feed = t.read_changes(1, 2, include_pre=True).cache()
    assert feed.count() == 3
    assert _rows(feed.select("op").distinct()) == [("UPDATE",)]
    assert feed.filter(F.col("stars") == 7).count() == 3
    assert feed.filter(F.col("pre_stars").isNull()).count() == 3
    feed.unpersist()


def test_incremental_mv_invariant(spark, versioned_table):
    """apply_delta(full(v_a), delta(feed(a→b))) == full(v_b) — for every
    version interval, bit-exact."""
    t = versioned_table
    agg = IncrementalAggregate(
        group_cols=("repo",), measures={"total_bytes": "length(content)"}
    )
    for a, b in [(1, 2), (2, 3), (1, 3)]:
        mv = agg.apply_delta(
            agg.full_state(t.read_version(a)),
            agg.delta(t.read_changes(a, b, include_pre=True)),
        )
        assert _rows(mv) == _rows(agg.full_state(t.read_version(b))), (a, b)


def test_incremental_mv_group_death_and_birth(spark, tmp_path):
    """Deleting every row of a group removes it from the maintained view
    (exactly like a recompute); a new group appears with its first row."""
    base = canonicalize_snapshot(gen_repos(spark, n_keys=100, n_repos=5, seed=3))
    t = HashBucketParquetTable(
        spark, str(tmp_path / "gd"), n_buckets=4, retain_generations=10
    )
    t.init(base)
    victim = t.read().select("repo").first()["repo"]
    kill = (
        t.read()
        .filter(F.col("repo") == victim)
        .withColumn("op", F.lit("DELETE"))
        .select("repo", "path", "commit", "lang", "content", "op")
    )
    newborn = spark.createDataFrame(
        [("brand-new-repo", "a.py", "c1", "py", "hello")],
        "repo string, path string, commit string, lang string, content string",
    ).withColumn("op", F.lit("ADD"))
    t.upsert(kill.unionByName(newborn))
    agg = IncrementalAggregate(group_cols=("repo",))
    mv = agg.apply_delta(
        agg.full_state(t.read_version(1)),
        agg.delta(t.read_changes(1, 2, include_pre=True)),
    )
    repos = {r["repo"] for r in mv.select("repo").collect()}
    assert victim not in repos
    assert "brand-new-repo" in repos
    assert _rows(mv) == _rows(agg.full_state(t.read_version(2)))


def test_feed_coherent_when_digest_cols_lag(spark, tmp_path):
    """After evolve() (digest_cols lags compare_cols until redigest),
    upserts re-digest only their touched buckets — one version holds
    digests over two column sets. The feed must detect that incoherence
    and recompute, reporting ONLY truly-changed rows."""
    base = canonicalize_snapshot(gen_repos(spark, n_keys=120, seed=9))
    t = HashBucketParquetTable(
        spark, str(tmp_path / "lag"), n_buckets=4, retain_generations=16
    )
    t.init(base)  # v1
    # evolve: adds 'stars' to compare_cols; digest_cols stays (lang, content)
    wide = (
        t.read()
        .limit(2)
        .withColumn("op", F.lit("UPDATE"))
        .withColumn("stars", F.lit(1).cast("int"))
    )
    t.upsert(wide)  # v2 — touched buckets now digested over the NEW set
    one = (
        t.read()
        .filter(F.col("stars").isNull())
        .limit(1)
        .withColumn("op", F.lit("UPDATE"))
        .withColumn("content", F.lit("really-changed"))
    )
    t.upsert(one)  # v3 — another bucket re-digested over the NEW set
    assert t._meta()["digest_cols"] != t._meta()["compare_cols"]  # still lagging
    feed = t.read_changes(2, 3)
    # exactly ONE change happened between v2 and v3 — any extra rows are
    # spurious UPDATEs from comparing digests across column sets
    rows = feed.collect()
    assert len(rows) == 1, rows
    assert rows[0]["content"] == "really-changed"
    # the MV invariant must survive the lag window too
    agg = IncrementalAggregate(group_cols=("repo",))
    mv = agg.apply_delta(
        agg.full_state(t.read_version(2)),
        agg.delta(t.read_changes(2, 3, include_pre=True)),
    )
    assert _rows(mv) == _rows(agg.full_state(t.read_version(3)))


def test_non_abelian_measures_rejected():
    """MIN/MAX (and first/last) measures are a design boundary, not a
    silent wrong answer: a deleted extremum cannot be reversed by
    subtraction (operators/mv.py module docstring), so construction must
    fail loudly."""
    import pytest

    for expr in ("max(stars)", "MIN(length(content))", "1 + last(stars)"):
        with pytest.raises(ValueError, match="abelian"):
            IncrementalAggregate(group_cols=("repo",), measures={"m": expr})
    # plain SUM/COUNT-shaped expressions still construct fine
    IncrementalAggregate(
        group_cols=("repo",), measures={"m": "length(content) * 2"}
    )
