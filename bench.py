"""Benchmark harness — prints ONE JSON line with headline timings.

Headline metric: the CDC pipeline end-to-end (tail → canonicalize → LWW
dedup → merge into the bucketed lake, with checkpoints + lineage) over the
change-event view derived from the sf lineitem table, reported as wall
seconds and events/sec. Individual operator queries from the driver
contract are timed alongside.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32),
     BENCH_DIGEST_IMPL  (arrow|jvm, default arrow — the north-rule path).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bcdc2bcdc_spark.driver_queries import QUERIES, cdc_events
from bcdc2bcdc_spark.plans.checkpoint import CheckpointStore
from bcdc2bcdc_spark.plans.pipeline import CDCPipeline
from bcdc2bcdc_spark.schema import REPOS_SCHEMA
from bcdc2bcdc_spark.session import get_spark
from bcdc2bcdc_spark.sources.lake import HashBucketParquetTable

BENCH_QUERIES = [
    "cdc_lww_dedup",
    "cdc_state",
    "cdc_delta",
    "cdc_update_digest",
    "fk_remap",
    "agg_pricing",
    "topk_customers",
    # training-data operators (documents/embeddings are small at every sf —
    # these time the operator constant factors, not data volume)
    "dedup_minhash",
    "ann_ivf",
    "text_stats",
    "dedup_clusters",
    "decontaminate_keep",
    "sample_mixture",
    # feed/MV share a memoized contract lake: best-of-2 makes the second
    # run measure the operator, not the lake build
    "change_feed",
    "incremental_mv",
    # round-4 platform rows (each builds its own small lake; best-of-2
    # again makes run 2 the operator-cost measurement)
    "dml_delete_update",
    "restore_rollback",
    "join_view_incremental",
    "lake_pruned_scan",
]


def time_query(fn, spark, sf_dir: str, repeats: int = 2) -> float:
    """Best-of-N: this sandbox has minute-scale ±30% load swings
    (BENCH/BASELINE.md); the min is the least-contended measurement of a
    deterministic computation."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_pipeline(spark, sf_dir: str, workdir: str, n_epochs: int = 2,
                   digest_impl: str = "arrow", write_mode: str = "cow") -> dict:
    """Full engine run: empty lake + every derived event applied in epochs."""
    ev = cdc_events(spark, sf_dir)
    # unique event ids for this run (derived seq has duplicates, see
    # driver_queries.LWW_ORDER) — monotonically increasing + repartition-safe
    ev = ev.withColumn("event_seq", F.monotonically_increasing_id()).withColumn(
        "commit_id", F.lpad(F.col("event_seq").cast("string"), 14, "0")
    )
    ev = ev.withColumnRenamed("commit_id", "commit")
    n_events = ev.count()
    bounds = ev.agg(F.max("event_seq").alias("m")).first()["m"]
    ev = ev.withColumn(
        "epoch", F.least(F.lit(n_epochs - 1), (F.col("event_seq") * n_epochs / (bounds + 1)).cast("long"))
    ).cache()
    ev.count()  # materialize input so the pipeline timing excludes derivation

    table = HashBucketParquetTable(
        spark, os.path.join(workdir, "lake"), n_buckets=64, write_mode=write_mode
    )
    empty = spark.createDataFrame([], REPOS_SCHEMA)
    table.init(empty)
    cp = CheckpointStore(os.path.join(workdir, "ckpt"))
    pipe = CDCPipeline(
        table=table, checkpoints=cp, ignore_repos=(), digest_impl=digest_impl,
        order_cols=("commit", "event_seq"),
    )
    t0 = time.perf_counter()
    pipe.run(ev)
    wall = time.perf_counter() - t0
    compact_sec = None
    if write_mode == "mor":
        t1 = time.perf_counter()
        table.compact_deltas()
        compact_sec = time.perf_counter() - t1
    final_rows = table.read().count()
    ev.unpersist()
    out = {
        "events": n_events,
        "wall_sec": wall,
        "events_per_sec": n_events / wall,
        "final_rows": final_rows,
        "epochs": n_epochs,
        "digest_impl": digest_impl,
    }
    if compact_sec is not None:
        out["compact_sec"] = compact_sec
    return out


#: the queries re-timed at the synthetic sf1 leg (the 5 most expensive
#: shapes + the pipeline) — one order of magnitude above sf0.1, to show
#: the plan shapes hold off the small-data floor
SF1_QUERIES = ["cdc_delta", "dedup_minhash", "dedup_clusters", "lake_pruned_scan"]


def ensure_sf1_dir(spark, sf_dir: str, factor: int = 10) -> str:
    """Deterministically synthesize an sf1-scale input directory from the
    sf0.1 testdata (no external data; cached across runs):

    * ``lineitem`` — ``factor`` key-shifted copies (``l_orderkey`` offset
      per copy so every derived ``event_seq``/``commit_id`` is distinct):
      10x the CDC events over the SAME repo/path key universe, which is
      the north-rule shape (10^10 events over a bounded repo space means
      deeper per-key histories, not more keys).
    * ``documents`` — ``factor`` copies with doc_ids shifted and, for
      copies >0, tokens DETERMINISTICALLY permuted (sorted by
      xxhash64(token, copy)): a permutation preserves each copy's
      internal near-duplicate structure (similar token sets sort
      similarly) while destroying cross-copy shingle overlap, so the
      corpus scales 10x with 10x the true clusters instead of one giant
      everything-matches cluster.
    """
    tag = os.path.basename(sf_dir.rstrip("/"))
    out = os.path.join(tempfile.gettempdir(), f"cdc_sf1_{factor}x_{tag}")
    marker = os.path.join(out, "_READY")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    shift = int(li.agg(F.max("l_orderkey")).first()[0]) + 1
    copies = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * shift))
        for i in range(factor)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dshift = int(d.agg(F.max("doc_id")).first()[0]) + 1
    parts = [d]
    for i in range(1, factor):
        toks = F.split(F.col("text"), r"\s+")
        perm = F.array_sort(
            F.transform(
                toks,
                lambda t: F.struct(
                    F.xxhash64(t, F.lit(i)).alias("h"), t.alias("t")
                ),
            )
        )
        parts.append(
            d.withColumn("doc_id", F.col("doc_id") + F.lit(i * dshift))
            .withColumn(
                "text", F.array_join(F.transform(perm, lambda s: s["t"]), " ")
            )
        )
    bigd = parts[0]
    for p in parts[1:]:
        bigd = bigd.unionByName(p)
    bigd.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    open(marker, "w").close()
    return out


def bench_sf1(spark, sf_dir: str) -> dict:
    """The sf1 leg: single-shot per query (a shape check one order of
    magnitude up, not the best-of-N headline), plus one CoW pipeline run."""
    sf1 = ensure_sf1_dir(spark, sf_dir)
    out: dict = {}
    for name in SF1_QUERIES:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf1).count()
        out[name] = round(time.perf_counter() - t0, 3)
    workdir = tempfile.mkdtemp(prefix="cdc_sf1_pipe_")
    try:
        stats = bench_pipeline(spark, sf1, workdir, digest_impl="arrow")
        out["pipeline_wall_sec"] = round(stats["wall_sec"], 3)
        out["pipeline_events"] = stats["events"]
        out["pipeline_events_per_sec"] = round(stats["events_per_sec"], 1)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return out


def bench_lifecycle_ops(spark, sf_dir: str, repeats: int = 2) -> dict:
    """Op-level timings for the multi-commit lifecycle rows. Their
    CORRECTNESS queries deliberately embed audits (inverse-feed checks,
    extra snapshot_diffs) plus several lake commits in one timed row, so
    the per-query numbers above measure the sandbox's serial commit floor,
    not the operator. Here the lake builds and commits are UNTIMED setup;
    each timed section is exactly one operation — plus the commit floor
    itself, reported separately so the split is explicit:

    * restore_op_sec          — one ``restore()`` (metadata-only re-point)
    * joinview_refresh_op_sec — one ``refresh()`` after both feeds moved
    * commit_floor_meta_sec   — one data-empty metadata-flip commit
    * commit_floor_upsert_sec — one 1-row upsert commit (full write path)
    """
    from bcdc2bcdc_spark.driver_queries import _half_seq_dir, cdc_state
    from bcdc2bcdc_spark.operators.diff import snapshot_diff
    from bcdc2bcdc_spark.operators.joinview import IncrementalJoinView

    ev = cdc_events(spark, sf_dir)
    half = _half_seq_dir(spark, sf_dir)
    src = cdc_state(ev, None).withColumnRenamed("commit_id", "commit").cache()
    dest = cdc_state(ev, half).withColumnRenamed("commit_id", "commit").cache()
    src.count(), dest.count()
    out: dict[str, float] = {}

    def best(key: str, setup, op) -> None:
        b = float("inf")
        for _ in range(repeats):
            workdir = tempfile.mkdtemp(prefix="cdc_ops_")
            try:
                state = setup(workdir)
                t0 = time.perf_counter()
                op(state)
                b = min(b, time.perf_counter() - t0)
            finally:
                shutil.rmtree(workdir, ignore_errors=True)
        out[key] = round(b, 3)

    def restore_setup(workdir):
        t = HashBucketParquetTable(
            spark, os.path.join(workdir, "lake"), n_buckets=16, retain_generations=4
        )
        t.init(dest)
        t.upsert(snapshot_diff(src, dest, canonicalize=False, digest_impl="jvm"))
        return t

    best("restore_op_sec", restore_setup, lambda t: t.restore(1))

    def joinview_setup(workdir):
        left = HashBucketParquetTable(spark, os.path.join(workdir, "facts"), n_buckets=16)
        left.init(dest)
        right = HashBucketParquetTable(
            spark, os.path.join(workdir, "dim"),
            key_cols=("lang",), compare_cols=("family",), n_buckets=4,
        )
        right.init(
            dest.select("lang").where(F.col("lang").isNotNull()).distinct()
            .withColumn("family", F.concat(F.lit("fam-"), F.col("lang")))
        )
        view = IncrementalJoinView(
            left, right, os.path.join(workdir, "view"),
            on=("lang",), how="inner", n_buckets=16,
        )
        view.build()
        left.upsert(snapshot_diff(src, dest, canonicalize=False, digest_impl="jvm"))
        right.upsert(
            spark.createDataFrame(
                [("F", "fam-F2", "UPDATE")], "lang string, family string, op string"
            )
        )
        return view

    best("joinview_refresh_op_sec", joinview_setup, lambda v: v.refresh())

    best(
        "commit_floor_meta_sec",
        restore_setup,
        lambda t: t.set_stats_cols(["lang"]),
    )
    one_row = dest.limit(1).withColumn("op", F.lit("UPDATE")).withColumn(
        "content", F.lit("bench-floor")
    )
    best("commit_floor_upsert_sec", restore_setup, lambda t: t.upsert(one_row))

    src.unpersist(), dest.unpersist()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    digest_impl = os.environ.get("BENCH_DIGEST_IMPL", "arrow")
    spark = get_spark(
        "bcdc2bcdc-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM JIT + codegen + parquet footer cache, so per-query numbers
    # measure the operator, not session startup
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    queries: dict[str, float] = {}
    for name in BENCH_QUERIES:
        queries[name] = round(time_query(QUERIES[name], spark, sf_dir), 3)

    # op-vs-commit-floor split for the lifecycle rows (restore_rollback /
    # join_view_incremental keep their full-row timings above for
    # round-over-round continuity; these isolate the operator cost)
    lifecycle_ops = bench_lifecycle_ops(spark, sf_dir)

    # synthetic sf1 leg (10x sf0.1, deterministic) — BENCH_SF1=0 to skip
    sf1_stats = None
    if os.environ.get("BENCH_SF1", "1") == "1" and os.path.isdir(sf_dir):
        sf1_stats = bench_sf1(spark, sf_dir)

    # best-of-2 full-pipeline runs (fresh lake each) — same noise rationale
    pipe_stats = None
    mor_stats = None
    for _ in range(2):
        for mode in ("cow", "mor"):
            workdir = tempfile.mkdtemp(prefix="cdc_bench_")
            try:
                stats = bench_pipeline(
                    spark, sf_dir, workdir, digest_impl=digest_impl, write_mode=mode
                )
            finally:
                shutil.rmtree(workdir, ignore_errors=True)
            best = pipe_stats if mode == "cow" else mor_stats
            if best is None or stats["events_per_sec"] > best["events_per_sec"]:
                if mode == "cow":
                    pipe_stats = stats
                else:
                    mor_stats = stats
    pipe_stats["repeats"] = 2
    mor_stats["repeats"] = 2

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "cdc pipeline end-to-end wall sec (tail->dedup->merge), sf lineitem-derived events",
        "value": round(pipe_stats["wall_sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "pipeline": {k: (round(v, 2) if isinstance(v, float) else v) for k, v in pipe_stats.items()},
        # same epochs applied in merge-on-read mode: upserts append
        # O(changes) deltas (no base rewrite), then one compact_deltas
        "pipeline_mor": {k: (round(v, 2) if isinstance(v, float) else v) for k, v in mor_stats.items()},
        "lifecycle_ops": lifecycle_ops,
        "cpus": cpus,
    }
    if sf1_stats is not None:
        out["sf1"] = sf1_stats
    print(json.dumps(out))


if __name__ == "__main__":
    main()
