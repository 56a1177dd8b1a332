"""Continuous derived-artifact maintenance off the change-feed stream.

The reference re-derives everything per run — a cron'd full pass keeps
the destination, its id-lookup dicts and its reports fresh
(``/root/reference/bin/runBCDC2BCDC.py`` is the scheduler's entry). The
lake platform's derived artifacts (secondary indexes, SCD2 histories,
join views, replicas — anything exposing an incremental
refresh()/advance()/sync()) are instead ADVANCED from the
base table's change feed, each O(changes) per interval — so "keep
everything fresh" is just: wake up whenever the base commits, call every
artifact's refresh.

``stream_maintain`` wires that trigger as a Structured Streaming query
over the ``cdclake`` feed source: one micro-batch per commit interval
(the source's rate limit), each driving every registered artifact's
incremental refresh. The artifacts read the feed THEMSELVES (their
crash-safe write-ahead-intent replay path, sources/index.py etc.) — the
stream's rows are only the wake-up signal, so a maintenance crash never
loses data: the next batch (or a manual refresh) resumes from each
artifact's own checkpointed state. At 100 TB this is the control-plane
shape you want — the data-plane work stays inside each artifact's
bucket-pruned incremental plan; the stream adds no second copy of the
feed's bytes (select 1 column, prune the rest).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from bcdc2bcdc_spark.sources.datasource import stream_changes


def _advance(artifact) -> None:
    """Normalize the per-artifact incremental API: SecondaryIndex /
    IncrementalJoinView expose ``refresh()``, SCD2History ``advance()``,
    TableReplicator ``sync()``."""
    for name in ("refresh", "advance", "sync"):
        fn = getattr(artifact, name, None)
        if callable(fn):
            fn()
            return
    raise TypeError(
        f"{type(artifact).__name__} has no refresh()/advance()/sync()"
    )


def stream_maintain(
    spark: SparkSession,
    base_path: str,
    artifacts,
    checkpoint_dir: str | None = None,
):
    """A ``DataStreamWriter`` whose micro-batches keep every artifact in
    ``artifacts`` synced to the base table at ``base_path``. Start it
    with ``.trigger(availableNow=True).start()`` for a drain-and-stop
    pass, or a processing-time trigger for continuous maintenance.

    Artifacts are CAUGHT UP synchronously here (one refresh each) and
    the stream then starts at the base table's CURRENT commit: the
    artifacts track their own applied seqs, so feed rows for history
    they already reflect are pure waste — anchoring a fresh
    (un-checkpointed) query at commit 1 would compute the full
    commit-1→head diff (O(table)) just to produce discarded wake-up
    rows. Batches carrying no rows (stream bookkeeping) are skipped;
    otherwise every artifact advances to the base head it observes —
    artifacts are individually crash-safe and idempotent, so
    at-least-once batch delivery is exactly right."""
    def tick(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        for a in artifacts:
            _advance(a)

    from bcdc2bcdc_spark.sources.lake import HashBucketParquetTable

    head = HashBucketParquetTable(spark, base_path).commit_seq()
    for a in artifacts:  # synchronous catch-up to `head` (or newer)
        _advance(a)
    # the rows are only a wake-up signal: project a single column so the
    # stream never materializes feed payload twice
    w = (
        stream_changes(spark, base_path, start_seq=head)
        .select("op")
        .writeStream.foreachBatch(tick)
    )
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w
