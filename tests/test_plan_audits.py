"""Physical-plan regression guards: the scale properties PLANS.md
documents are asserted here so they cannot silently regress — every hot
operator must stay free of single-partition exchanges, broadcast where
the design says broadcast, and shuffle-free where it claims zero
shuffles."""

import pytest
from pyspark.sql import functions as F

from bcdc2bcdc_spark.functions.sampling import split_column, stratified_sample
from bcdc2bcdc_spark.operators.decontam import contamination_hits
from bcdc2bcdc_spark.operators.diff import snapshot_diff
from bcdc2bcdc_spark.operators.dedupe import minhash_lsh_pairs
from bcdc2bcdc_spark.operators.lww import lww_dedup
from bcdc2bcdc_spark.operators.packing import pack_sequences


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i} epsilon zeta") for i in range(300)],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def events(spark):
    from bcdc2bcdc_spark.generator import gen_events

    return gen_events(spark, n_events=500, n_keys=100, seed=9).drop("epoch")


def test_lww_dedup_no_single_partition(events):
    plan = _plan(lww_dedup(events))
    assert "SinglePartition" not in plan


def test_snapshot_diff_one_join_no_single_partition(spark):
    from bcdc2bcdc_spark.functions.canonicalize import canonicalize_snapshot
    from bcdc2bcdc_spark.generator import gen_repos

    a = canonicalize_snapshot(gen_repos(spark, n_keys=100, seed=3))
    plan = _plan(snapshot_diff(a, a))
    assert "SinglePartition" not in plan
    # the design is ONE full-outer join — no join proliferation
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_minhash_pairs_no_single_partition(docs):
    plan = _plan(minhash_lsh_pairs(docs, shingle_n=3))
    assert "SinglePartition" not in plan


def test_sampling_zero_exchanges(docs):
    plan = _plan(
        stratified_sample(docs.withColumn("lang", F.lit("en")), "lang",
                          {"en": 0.5}, key_col="doc_id")
    )
    assert "Exchange" not in plan  # pure codegen'd filter
    plan2 = _plan(docs.select(split_column("doc_id", {"a": 0.9, "b": 0.1})))
    assert "Exchange" not in plan2


def test_decontam_broadcasts_eval_side(docs):
    train = docs.filter("doc_id % 7 <> 0")
    ev = docs.filter("doc_id % 7 = 0")
    plan = _plan(contamination_hits(train, ev))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "SinglePartition" not in plan


def test_packing_single_hash_exchange(spark):
    d = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37 + 1).alias("n_tokens")
    )
    plan = _plan(pack_sequences(d, seq_len=64))
    assert "SinglePartition" not in plan  # per-shard window, never global
    assert plan.count("Exchange") == 1


def test_cc_round_no_single_partition(spark):
    # one propagation+compression round's exact operator shapes
    pairs = spark.createDataFrame([(i, i + 1) for i in range(100)], "a long, b long")
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    labels = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    )
    nbr = (
        edges.join(
            labels.select(F.col("id").alias("dst"), F.col("label").alias("nl")), "dst"
        )
        .groupBy("src")
        .agg(F.min("nl").alias("nbr_min"))
        .withColumnRenamed("src", "id")
    )
    prop = labels.join(nbr, "id", "left").select(
        "id", F.least("label", F.coalesce("nbr_min", "label")).alias("label")
    )
    comp = (
        prop.alias("x")
        .join(
            prop.select(F.col("id").alias("label"), F.col("label").alias("label2")).alias("y"),
            "label",
        )
        .select("id", F.col("label2").alias("label"))
    )
    assert "SinglePartition" not in _plan(comp)
