"""Multi-entity dependency-ordered pipeline + runtime-ignore wiring.

Reference semantics under test: users → groups → orgs → packages apply
order so FK parents exist before children reference them
(/root/reference/bin/runBCDC2BCDC.py:286-289), child FK rewrite through
the parent lookup (DataCache.py:384-437), and runtime-discovered ignores
excluded from the same run's apply (DataCache.py:559-586,
CKANData.py:1582-1637)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bcdc2bcdc_spark.plans.checkpoint import CheckpointStore
from bcdc2bcdc_spark.plans.multi import (
    DependencyCycleError,
    Entity,
    FKRemap,
    MultiTablePipeline,
)
from bcdc2bcdc_spark.plans.pipeline import CDCPipeline, duplicate_altkey_detector
from bcdc2bcdc_spark.sources.lake import HashBucketParquetTable

EV_SCHEMA = (
    "repo string, path string, commit string, lang string, content string, "
    "op string, event_seq long, epoch long"
)


def _table(spark, tmp_path, name):
    t = HashBucketParquetTable(spark, str(tmp_path / name), n_buckets=4)
    t.init(spark.createDataFrame([], "repo string, path string, commit string, lang string, content string"))
    return t


def _entity(spark, tmp_path, name, fk_remaps=()):
    return Entity(
        name=name,
        pipeline=CDCPipeline(
            table=_table(spark, tmp_path, name),
            checkpoints=CheckpointStore(str(tmp_path / f"ckpt_{name}")),
            digest_impl="jvm",
        ),
        fk_remaps=tuple(fk_remaps),
    )


def test_multi_table_fk_remap_and_order(spark, tmp_path):
    # child declared FIRST — apply order must still put the parent before it
    child = _entity(
        spark, tmp_path, "pkgs",
        # child's `content` holds the parent's path; rewrite to parent's
        # content (its business "name") — the id→name remap.
        [FKRemap(column="content", parent="orgs", map_from="path", map_to="content")],
    )
    parent = _entity(spark, tmp_path, "orgs")
    multi = MultiTablePipeline([child, parent])
    assert multi.apply_order == ["orgs", "pkgs"]

    org_events = spark.createDataFrame(
        [
            ("org-repo", "org1", "c1", "org", "NAME_ONE", "ADD", 1, 0),
            ("org-repo", "org2", "c1", "org", "NAME_TWO", "ADD", 2, 0),
            # epoch 1: a NEW parent arrives...
            ("org-repo", "org3", "c2", "org", "NAME_THREE", "ADD", 3, 1),
        ],
        EV_SCHEMA,
    )
    pkg_events = spark.createDataFrame(
        [
            ("pkg-repo", "pkgA", "c1", "py", "org1", "ADD", 10, 0),
            ("pkg-repo", "pkgB", "c1", "py", "org2", "ADD", 11, 0),
            # ...and a child referencing it IN THE SAME epoch: resolvable
            # only because parents apply first within the epoch.
            ("pkg-repo", "pkgC", "c2", "py", "org3", "ADD", 12, 1),
            # dangling reference passes through untranslated
            ("pkg-repo", "pkgD", "c2", "py", "org99", "ADD", 13, 1),
        ],
        EV_SCHEMA,
    )
    res = multi.run({"orgs": org_events, "pkgs": pkg_events})
    assert res["orgs"] == {0: True, 1: True} and res["pkgs"] == {0: True, 1: True}

    got = {
        r["path"]: r["content"]
        for r in child.pipeline.table.read().collect()
    }
    assert got == {
        "pkgA": "NAME_ONE",
        "pkgB": "NAME_TWO",
        "pkgC": "NAME_THREE",  # same-epoch parent resolved
        "pkgD": "org99",       # unresolvable → untouched, visible downstream
    }


def test_multi_table_cycle_rejected(spark, tmp_path):
    a = _entity(spark, tmp_path, "a", [FKRemap("content", "b", "path", "content")])
    b = _entity(spark, tmp_path, "b", [FKRemap("content", "a", "path", "content")])
    with pytest.raises(DependencyCycleError):
        MultiTablePipeline([a, b])


def test_runtime_ignores_excluded_but_counted(spark, tmp_path):
    """A key flagged in epoch N (duplicate alternate key) is excluded from
    epoch N's apply; lineage still counts its events as seen."""
    table = _table(spark, tmp_path, "lake")
    ckpt = CheckpointStore(str(tmp_path / "ckpt"))
    pipe = CDCPipeline(
        table=table,
        checkpoints=ckpt,
        digest_impl="jvm",
        runtime_ignore_detector=duplicate_altkey_detector(["content"]),
    )
    events = spark.createDataFrame(
        [
            # two DISTINCT keys share content "dup@x" → both flagged
            ("r1", "p1", "c1", "py", "dup@x", "ADD", 1, 0),
            ("r1", "p2", "c1", "py", "dup@x", "ADD", 2, 0),
            ("r1", "p3", "c1", "py", "unique1", "ADD", 3, 0),
            ("r2", "p4", "c1", "py", "unique2", "ADD", 4, 0),
        ],
        EV_SCHEMA,
    )
    flagged = pipe.runtime_ignores_for(events.drop("epoch"))
    assert sorted((r["repo"], r["path"]) for r in flagged.collect()) == [
        ("r1", "p1"),
        ("r1", "p2"),
    ]
    res = pipe.run(events)
    assert res == {0: True}
    keys = sorted((r["repo"], r["path"]) for r in table.read().collect())
    assert keys == [("r1", "p3"), ("r2", "p4")]  # flagged keys never applied
    lineage = ckpt.read_lineage(spark)
    total = lineage.agg(F.sum("events_applied").alias("s")).first()["s"]
    assert total == 4  # all events counted as seen, including flagged ones
