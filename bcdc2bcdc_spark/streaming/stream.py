"""Structured Streaming tailer — the "binlog tail" form of the engine.

The reference is pure batch (one-shot sync); the engine's epoch loop is
already micro-batch shaped, so the streaming form is exactly Structured
Streaming's contract: a file-source (or Kafka, in production) stream of
change events, ``foreachBatch`` applying each micro-batch through the SAME
``CDCPipeline.prepare_batch → lake.upsert`` path, with BOTH exactly-once
layers on:

* Structured Streaming's own checkpoint (offset log + commit log) decides
  which files belong to which micro-batch and never re-reads committed
  ones after restart;
* the engine's idempotent upsert + epoch markers make a replayed batch
  (crash between sink write and commit log) converge to the same table —
  the classic foreachBatch at-least-once → effectively-exactly-once
  pattern.

``streaming_lineage`` shows the watermark/window path for late events:
event-time windowed per-repo counts with a configurable lateness bound.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from bcdc2bcdc_spark.plans.pipeline import CDCPipeline
from bcdc2bcdc_spark.schema import EVENTS_SCHEMA


@dataclass
class StreamingTailer:
    """Tails a directory of event files into the lake table."""

    spark: SparkSession
    pipeline: CDCPipeline
    events_dir: str
    checkpoint_dir: str
    max_files_per_trigger: int | None = None

    def _source(self) -> DataFrame:
        reader = (
            self.spark.readStream.schema(EVENTS_SCHEMA)
            .option("latestFirst", "false")
        )
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", str(self.max_files_per_trigger))
        return reader.parquet(self.events_dir)

    def _handle_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # micro-batch id = epoch id; the engine marker makes replays no-ops
        self.pipeline.apply_epoch(batch_df, int(batch_id))

    def run_available(self) -> None:
        """Process everything currently in the directory, then stop
        (Trigger.AvailableNow) — the batch-tail mode used by tests and by
        scheduled incremental runs."""
        q = (
            self._source()
            .writeStream.foreachBatch(self._handle_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def start_continuous(self, processing_time: str = "10 seconds"):
        """Long-running tail (micro-batch every trigger interval)."""
        return (
            self._source()
            .writeStream.foreachBatch(self._handle_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime=processing_time)
            .start()
        )


def streaming_lineage(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "5 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time windowed per-repo op counts with a late-data watermark —
    the streaming analog of plans/checkpoint.lineage_metrics. Late events
    beyond the watermark are dropped from the window state (and, in the
    engine's epoch model, simply land in a later epoch instead)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), "repo", "op")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "repo",
            "op",
            "n",
        )
    )
