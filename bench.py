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
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
