"""bcdc2bcdc_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Generalizes the compare→canonicalize→upsert semantics of bcgov/bcdc2bcdc
(reference at /root/reference, pure-Python per-record batch sync; see
/root/reference/docs/ProcessFlow.md:12-27) into a binlog/WAL-style
change-event tailer over a lake table of source-code repositories
``(repo, path, commit, lang, content)``:

* change events (ADD/UPDATE/DELETE) are deduplicated per business key
  ``(repo, path)`` via last-writer-wins on ``(commit, event_seq)``,
* canonicalized with config-driven column-expression transforms
  (the reference's CustomTransformers registry re-expressed as Catalyst
  expressions — never per-row Python),
* diffed by sha256 content digests computed in vectorized pandas/Arrow UDFs,
* and merged idempotently into a hash-bucketed lake table (Iceberg
  ``MERGE INTO`` when the runtime jar is present; a partition-overwrite
  parquet backend with identical semantics otherwise),
* with checkpointed offsets + per-partition lineage so a killed job
  resumes without duplicates.

Everything is ``pyspark.sql.DataFrame`` + Arrow-vectorized UDFs; no RDDs.
"""

from bcdc2bcdc_spark.schema import (
    REPOS_SCHEMA,
    EVENTS_SCHEMA,
    EVENTS_EVOLVED_SCHEMA,
    OP_ADD,
    OP_UPDATE,
    OP_DELETE,
    KEY_COLS,
    ORDER_COLS,
)
from bcdc2bcdc_spark.session import get_spark

__all__ = [
    "REPOS_SCHEMA",
    "EVENTS_SCHEMA",
    "EVENTS_EVOLVED_SCHEMA",
    "OP_ADD",
    "OP_UPDATE",
    "OP_DELETE",
    "KEY_COLS",
    "ORDER_COLS",
    "get_spark",
]

__version__ = "0.1.0"
