"""Deterministic sampling: reproducibility, partitioning invariance,
stratified fractions, and split disjointness/exhaustiveness — the
properties df.sample() does NOT have and corpus assembly needs."""

import pytest
from pyspark.sql import functions as F

from bcdc2bcdc_spark.functions.sampling import (
    deterministic_sample,
    hash_uniform,
    split_column,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("src"),
    )


def test_sample_is_deterministic_and_partitioning_invariant(spark, docs):
    a = {r["doc_id"] for r in deterministic_sample(docs, 0.3, "doc_id").collect()}
    b = {
        r["doc_id"]
        for r in deterministic_sample(docs.repartition(13), 0.3, "doc_id").collect()
    }
    assert a == b  # df.sample() fails exactly this
    # approximate fraction (md5 is uniform: 2000 draws, ±5 pp is generous)
    assert 0.25 < len(a) / 2000 < 0.35
    # a different salt draws an independent sample, same salt re-draws a
    c = {r["doc_id"] for r in deterministic_sample(docs, 0.3, "doc_id", salt="v2").collect()}
    assert c != a
    assert {r["doc_id"] for r in deterministic_sample(docs, 0.3, "doc_id").collect()} == a


def test_sample_nesting_property(spark, docs):
    # keep-fraction monotonicity: the 10% sample is a SUBSET of the 30%
    # sample (same salt) — the property that lets you grow a corpus
    # without resampling everything
    small = {r["doc_id"] for r in deterministic_sample(docs, 0.1, "doc_id").collect()}
    big = {r["doc_id"] for r in deterministic_sample(docs, 0.3, "doc_id").collect()}
    assert small <= big


def test_stratified_fractions_and_default(spark, docs):
    out = stratified_sample(
        docs, "src", {"s0": 1.0, "s1": 0.4}, key_col="doc_id", default_fraction=0.0
    )
    got = {s: n for s, n in out.groupBy("src").count().collect()}
    assert got.get("s0") == docs.filter("src = 's0'").count()  # keep all
    assert "s2" not in got  # default 0 drops the stratum
    frac1 = got.get("s1", 0) / docs.filter("src = 's1'").count()
    assert 0.3 < frac1 < 0.5


def test_split_disjoint_exhaustive_and_stable(spark, docs):
    lab = docs.select(
        "doc_id",
        split_column("doc_id", {"train": 0.9, "eval": 0.05, "test": 0.05}).alias("split"),
    )
    counts = {r["split"]: r["count"] for r in lab.groupBy("split").count().collect()}
    assert sum(counts.values()) == 2000  # exhaustive, one label per row
    assert set(counts) == {"train", "eval", "test"}
    assert counts["train"] > 1650
    # stability: recomputation and repartitioning do not move documents
    lab2 = docs.repartition(7).select(
        "doc_id",
        split_column("doc_id", {"train": 0.9, "eval": 0.05, "test": 0.05}).alias("split"),
    )
    assert lab.exceptAll(lab2).count() == 0


def test_validation_errors(spark, docs):
    with pytest.raises(ValueError, match=r"\[0,1\]"):
        deterministic_sample(docs, 1.5, "doc_id")
    with pytest.raises(ValueError, match="sum to 1"):
        docs.select(split_column("doc_id", {"a": 0.5, "b": 0.4}))
    with pytest.raises(ValueError, match="stratum"):
        stratified_sample(docs, "src", {"s0": -0.1}, key_col="doc_id")


def test_hash_uniform_range_and_mean(spark, docs):
    stats = docs.select(hash_uniform("doc_id").alias("u")).agg(
        F.min("u"), F.max("u"), F.avg("u")
    ).first()
    assert 0.0 <= stats[0] and stats[1] < 1.0
    assert 0.45 < stats[2] < 0.55
