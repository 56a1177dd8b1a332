"""Schemas and key constants for the CDC engine.

The data model transposes the reference's CKAN record model
(/root/reference/bcdc2bcdc/CKANData.py:68-102 — one nested JSON dict per
entity, business key ``unique_id_field`` distinct from surrogate ``id``,
CKANTransform.py:208-230) onto the north-rule input shape: an Iceberg/parquet
lake table of source-code repositories.

* business key  = ``(repo, path)``   (the reference's ``unique_id_field``)
* version key   = ``(commit, event_seq)``  (LWW total order; the reference's
  surrogate ``id`` + the delta ordering the reference never needed because
  its snapshots are unique-keyed)
* change ops    = ``ADD | UPDATE | DELETE`` (CKANDataSetDeltas'
  adds/deletes/updates collections, CKANData.py:877-899)
"""

from __future__ import annotations

from pyspark.sql import types as T

OP_ADD = "ADD"
OP_UPDATE = "UPDATE"
OP_DELETE = "DELETE"
OPS = (OP_ADD, OP_UPDATE, OP_DELETE)

#: business key of the lake table (reference: unique_id_field, always "name")
KEY_COLS = ("repo", "path")
#: last-writer-wins total order, descending = winner
ORDER_COLS = ("commit", "event_seq")
#: payload columns carried by the lake table besides the keys
PAYLOAD_COLS = ("commit", "lang", "content")

# Base lake table — exactly BASELINE.json input_hint:
#   (repo:string, path:string, commit:string, lang:string, content:string)
REPOS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

# Change-event log: lake columns + op + global sequence number.
EVENTS_SCHEMA = T.StructType(
    list(REPOS_SCHEMA.fields)
    + [
        T.StructField("op", T.StringType(), False),
        T.StructField("event_seq", T.LongType(), False),
    ]
)

# Schema-evolution variant: adds `size: long`; in fixtures `event_seq`
# additionally arrives as int32 in the Arrow payload (type widening).
EVENTS_EVOLVED_SCHEMA = T.StructType(
    list(EVENTS_SCHEMA.fields) + [T.StructField("size", T.LongType(), True)]
)

# Engine state tables (FIXTURES.md §4).
CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.LongType(), False),
        T.StructField("offset_start", T.LongType(), False),
        T.StructField("offset_end", T.LongType(), False),
        T.StructField("committed_at_snapshot", T.StringType(), False),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("events_applied", T.LongType(), False),
        T.StructField("upserts", T.LongType(), False),
        T.StructField("deletes", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
    ]
)
