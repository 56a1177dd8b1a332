"""Streaming tailer tests: availableNow tail == batch pipeline result,
incremental restart picks up only new files, windowed lineage with
watermark."""

import os

from pyspark.sql import functions as F

from bcdc2bcdc_spark.functions.canonicalize import canonicalize_snapshot
from bcdc2bcdc_spark.generator import gen_events, gen_repos
from bcdc2bcdc_spark.operators.diff import datasets_equal
from bcdc2bcdc_spark.plans.checkpoint import CheckpointStore
from bcdc2bcdc_spark.plans.pipeline import CDCPipeline
from bcdc2bcdc_spark.schema import EVENTS_SCHEMA
from bcdc2bcdc_spark.sources.lake import HashBucketParquetTable
from bcdc2bcdc_spark.streaming.stream import StreamingTailer, streaming_lineage


def _events_cols(df):
    return df.select(*[f.name for f in EVENTS_SCHEMA.fields])


def _mk(spark, tmp_path, sub):
    from bcdc2bcdc_spark.generator import IGNORED_REPOS

    table = HashBucketParquetTable(spark, str(tmp_path / sub / "lake"), n_buckets=8)
    cp = CheckpointStore(str(tmp_path / sub / "ckpt"))
    pipe = CDCPipeline(table=table, checkpoints=cp, ignore_repos=IGNORED_REPOS)
    return table, pipe


def test_streaming_tail_matches_batch(spark, tmp_path):
    base = canonicalize_snapshot(gen_repos(spark, n_keys=300, seed=21))
    ev = gen_events(spark, n_events=1200, n_keys=300, n_epochs=2, seed=21)

    # batch reference
    t_batch, pipe_batch = _mk(spark, tmp_path, "batch")
    t_batch.init(base)
    pipe_batch.run(ev)

    # streaming: drop the SAME events into a watched dir as two file groups
    events_dir = str(tmp_path / "stream_in")
    for ep in (0, 1):
        _events_cols(ev.filter(F.col("epoch") == ep)).coalesce(1).write.mode(
            "append"
        ).parquet(events_dir)
    t_stream, pipe_stream = _mk(spark, tmp_path, "stream")
    t_stream.init(base)
    tailer = StreamingTailer(
        spark, pipe_stream, events_dir, str(tmp_path / "stream" / "ss_ckpt"),
        max_files_per_trigger=1,
    )
    tailer.run_available()
    # LWW over epoch-merged batches can differ from per-epoch apply ONLY in
    # suppressed commits, never content — but here file groups == epochs, so
    # the tables must match exactly.
    assert datasets_equal(t_stream.read(), t_batch.read())


def test_streaming_incremental_restart(spark, tmp_path):
    base = canonicalize_snapshot(gen_repos(spark, n_keys=200, seed=33))
    ev = gen_events(spark, n_events=800, n_keys=200, n_epochs=2, seed=33).cache()
    events_dir = str(tmp_path / "inc_in")
    os.makedirs(events_dir, exist_ok=True)

    table, pipe = _mk(spark, tmp_path, "inc")
    table.init(base)
    tailer = StreamingTailer(spark, pipe, events_dir, str(tmp_path / "inc" / "ss_ckpt"))

    _events_cols(ev.filter(F.col("epoch") == 0)).coalesce(1).write.mode("append").parquet(events_dir)
    tailer.run_available()
    snap_after_0 = table.read().cache()

    # restart the tailer with NEW files only; committed offsets are honored
    _events_cols(ev.filter(F.col("epoch") == 1)).coalesce(1).write.mode("append").parquet(events_dir)
    tailer.run_available()

    # the second run applied exactly the delta: same as batch over both epochs
    t_ref, pipe_ref = _mk(spark, tmp_path, "inc_ref")
    t_ref.init(base)
    pipe_ref.run(ev)
    assert datasets_equal(table.read(), t_ref.read())
    # and re-running with nothing new changes nothing
    tailer.run_available()
    assert datasets_equal(table.read(), t_ref.read())
    snap_after_0.unpersist()
    ev.unpersist()


def test_streaming_lineage_window(spark, tmp_path):
    ev = gen_events(spark, n_events=600, n_keys=100, seed=5).withColumn(
        "ts",
        (F.lit(1_700_000_000) + F.col("event_seq") * 10).cast("timestamp"),
    )
    out = streaming_lineage(ev, window="1 minute", watermark="5 minutes")
    rows = out.collect()
    assert sum(r["n"] for r in rows) == 600
    assert all(r["window_end"] > r["window_start"] for r in rows)
    # same query runs as a real stream (plan is streaming-compatible)
    events_dir = str(tmp_path / "lin_in")
    ev.select(*[f.name for f in EVENTS_SCHEMA.fields], "ts").coalesce(1).write.parquet(events_dir)
    schema = spark.read.parquet(events_dir).schema
    sdf = spark.readStream.schema(schema).parquet(events_dir)
    q = (
        streaming_lineage(sdf)
        .writeStream.format("memory")
        .queryName("lineage_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "lin_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # append-mode emits only watermark-closed windows; the plan executing
    # end-to-end as a stream is the contract under test
    assert spark.table("lineage_mem").columns == [
        "window_start", "window_end", "repo", "op", "n"
    ]


def test_lww_state_ttl_evicts_and_rebuilds(spark, tmp_path):
    """ProcessingTimeTimeout eviction: a key idle past ttl_ms is dropped
    from the state store; its next event re-seeds the state — proven by a
    later LOWER-ordered event becoming the emitted winner (with live state
    it would have lost the O(1) compare and the old winner re-emitted)."""
    import time

    from bcdc2bcdc_spark.streaming.stream import lww_state_stream

    events_dir = str(tmp_path / "ttl_in")
    os.makedirs(events_dir, exist_ok=True)

    def _write(rows):
        data = [tuple(r[f.name] for f in EVENTS_SCHEMA.fields) for r in rows]
        spark.createDataFrame(data, EVENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(events_dir)

    def _ev(repo, path, commit, seq, content):
        return {
            "repo": repo, "path": path, "commit": commit, "event_seq": seq,
            "lang": "py", "content": content, "op": "UPDATE",
        }

    emitted = []

    def _collect(bdf, _bid):
        emitted.extend(
            (r["repo"], r["commit"], r["content"]) for r in bdf.collect()
        )

    # ONE continuous query (500 ms triggers): processing-time timeouts fire
    # in the idle batches between file drops, well past the 200 ms TTL.
    _write([_ev("ra", "pa", "c9", 9, "winner"), _ev("rb", "pb", "c1", 1, "b1")])
    sdf = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    q = (
        lww_state_stream(sdf, ttl_ms=200)
        .writeStream.outputMode("update")
        .foreachBatch(_collect)
        .option("checkpointLocation", str(tmp_path / "ttl_ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    def _wait_for(pred, timeout=60):
        """Poll the emission log instead of racing wall-clock sleeps —
        fixed sleeps flake when a loaded box delays a 500 ms trigger."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            if pred():
                return True
            time.sleep(0.25)
        return False

    try:
        assert _wait_for(lambda: ("ra", "c9", "winner") in emitted)
        time.sleep(1.0)  # ra idles ≫ 200 ms TTL before the next batch runs
        _write([_ev("rb", "pb", "c2", 2, "b2")])
        # b2's emission proves a post-TTL batch executed → ra's timeout fired
        assert _wait_for(lambda: ("rb", "c2", "b2") in emitted)
        _write([_ev("ra", "pa", "c3", 3, "stale")])  # STALE: c3 < c9
        assert _wait_for(lambda: ("ra", "c3", "stale") in emitted)
    finally:
        q.stop()

    a_rows = {(c, t) for (repo, c, t) in emitted if repo == "ra"}
    # eviction happened: the stale event re-seeded state and was emitted as
    # winner; live state would have re-emitted ('c9', 'winner') instead
    assert ("c3", "stale") in a_rows
    assert ("c9", "winner") in a_rows  # the original batch-0 emission
    b_rows = [(c, t) for (repo, c, t) in emitted if repo == "rb"]
    assert b_rows[-1] == ("c2", "b2")


def test_lww_state_stream_tie_order_matches_batch(spark, tmp_path):
    """Events TIED on (commit, event_seq) — possible on derived logs —
    must converge to the same winner in the stateful stream as in batch
    lww_dedup with the extended total order, both within one micro-batch
    and across micro-batches (state-compare path)."""
    from bcdc2bcdc_spark.operators.lww import lww_dedup
    from bcdc2bcdc_spark.streaming.stream import LWW_STATE_ORDER, lww_state_stream

    def _ev(repo, path, commit, seq, lang, content, op="UPDATE"):
        return {
            "repo": repo, "path": path, "commit": commit, "event_seq": seq,
            "lang": lang, "content": content, "op": op,
        }

    # batch 0: in-batch tie on (c1, 1); batch 1: cross-batch tie vs state
    batches = [
        [
            _ev("r1", "p1", "c1", 1, "a", "x"),
            _ev("r1", "p1", "c1", 1, "b", "y"),   # wins batch 0 (lang b > a)
            _ev("r2", "p2", "c1", 1, None, "m"),  # NULL lang loses to any
            _ev("r2", "p2", "c1", 1, "a", "n"),
        ],
        [
            _ev("r1", "p1", "c1", 1, "b", "z"),   # ties state on lang too →
                                                  # content z > y wins
            _ev("r2", "p2", "c1", 1, "a", "k"),   # content n > k → state holds
        ],
    ]
    events_dir = str(tmp_path / "tie_in")
    os.makedirs(events_dir, exist_ok=True)
    all_rows = []
    emitted = []

    def _collect(bdf, _bid):
        emitted.extend(tuple(r) for r in bdf.collect())

    for rows in batches:
        all_rows.extend(rows)
        data = [tuple(r[f.name] for f in EVENTS_SCHEMA.fields) for r in rows]
        spark.createDataFrame(data, EVENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(events_dir)
    sdf = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(events_dir)
    q = (
        lww_state_stream(sdf)
        .writeStream.outputMode("update")
        .foreachBatch(_collect)
        .option("checkpointLocation", str(tmp_path / "tie_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # last emission per key = the stream's converged winner
    stream_final = {}
    for r in emitted:
        stream_final[(r[0], r[1])] = r
    data = [tuple(r[f.name] for f in EVENTS_SCHEMA.fields) for r in all_rows]
    batch = lww_dedup(
        spark.createDataFrame(data, EVENTS_SCHEMA), order_cols=LWW_STATE_ORDER
    )
    cols = ["repo", "path", "commit", "event_seq", "lang", "content", "op"]
    batch_final = {(r["repo"], r["path"]): tuple(r[c] for c in cols) for r in batch.collect()}
    assert stream_final == batch_final
    assert stream_final[("r1", "p1")][5] == "z"  # cross-batch content tiebreak
    assert stream_final[("r2", "p2")][5] == "n"  # state holds vs lower content


def test_lww_state_stream_matches_batch_lww(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): streaming per-key
    LWW state across micro-batches converges to the batch lww_dedup winner
    set over the same events."""
    from bcdc2bcdc_spark.operators.lww import lww_dedup
    from bcdc2bcdc_spark.streaming.stream import lww_state_stream

    ev = gen_events(spark, n_events=600, n_keys=150, n_epochs=2, seed=8).cache()
    events_dir = str(tmp_path / "state_in")
    for ep in (0, 1):  # two file groups → two micro-batches (state carries)
        _events_cols(ev.filter(F.col("epoch") == ep)).coalesce(1).write.mode(
            "append"
        ).parquet(events_dir)

    sdf = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(events_dir)
    q = (
        lww_state_stream(sdf)
        .writeStream.format("memory")
        .queryName("lww_state_mem")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "state_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # final state per key = the row with the max (commit, event_seq) among
    # that key's emissions (update mode re-emits on every batch touch)
    from pyspark.sql import Window

    emitted = spark.table("lww_state_mem")
    w = Window.partitionBy("repo", "path").orderBy(
        F.desc("commit"), F.desc("event_seq")
    )
    final = (
        emitted.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    expect = lww_dedup(
        _events_cols(ev).drop("epoch") if "epoch" in _events_cols(ev).columns else _events_cols(ev),
        order_cols=("commit", "event_seq"),
    ).select("repo", "path", "commit", "event_seq", "lang", "content", "op")
    got = sorted(map(tuple, final.select(*expect.columns).collect()))
    want = sorted(map(tuple, expect.collect()))
    assert got == want
    ev.unpersist()


def test_stream_exact_dedup_suppresses_redeliveries(spark, tmp_path):
    """dropDuplicatesWithinWatermark path: the same event identity
    redelivered across micro-batches is emitted ONCE; a genuinely new
    version of the key (different commit/seq) still flows through."""
    from pyspark.sql import types as T

    from bcdc2bcdc_spark.streaming.stream import stream_exact_dedup

    schema = T.StructType(
        list(EVENTS_SCHEMA.fields) + [T.StructField("ts", T.TimestampType())]
    )

    def _ev(commit, seq, content, ts_s):
        import datetime

        return (
            "r1", "p1", commit, "py", content, "UPDATE", seq,
            datetime.datetime(2026, 1, 1, 0, 0, ts_s),
        )

    events_dir = str(tmp_path / "dedup_in")
    os.makedirs(events_dir, exist_ok=True)
    batches = [
        [_ev("c1", 1, "x", 1), _ev("c1", 1, "x", 1)],  # in-batch duplicate
        [_ev("c1", 1, "x", 2)],                         # cross-batch redelivery
        [_ev("c2", 2, "y", 3)],                         # genuinely new event
    ]
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            events_dir
        )
    emitted = []
    sdf = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(
        events_dir
    )
    q = (
        stream_exact_dedup(sdf, watermark="1 hour")
        .writeStream.outputMode("append")
        .foreachBatch(lambda bdf, _b: emitted.extend(
            (r["commit"], r["event_seq"]) for r in bdf.collect()
        ))
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(emitted) == [("c1", 1), ("c2", 2)]
