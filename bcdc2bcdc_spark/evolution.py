"""Schema evolution — column add / type widen via Arrow-schema
reconciliation, never per-row Python.

Reference analogs: missing declared fields are materialized as None during
projection (/root/reference/bcdc2bcdc/CKANData.py:255-258), types are
coerced per config with empty-value patching (``enforceTypes``,
CKANData.py:966-1022), and required defaults are injected recursively
(CKANData.py:1127-1159). The engine generalizes: an event batch written
under an OLD schema (missing columns, narrower types) is reconciled to the
CURRENT engine schema

* plan-side (``reconcile_to_schema``): missing column → typed NULL, safe
  upcast via ``cast``, column reorder — pure Column expressions, free; and
* Arrow-side (``reconcile_arrow_batches``): a ``mapInPandas`` stage for
  raw Arrow record batches whose physical types differ (e.g. event_seq
  written as int32) — the pandas/Arrow boundary the north rule mandates.

Widening the TARGET table (new column arrives) maps to Iceberg
``ALTER TABLE ADD COLUMN`` in production; the parquet backend rewrites
metadata only (schema json) and backfills NULL on read.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F, types as T

#: widenings considered safe (narrow → wide), Spark typeName strings
_SAFE_WIDENINGS = {
    ("byte", "short"), ("byte", "integer"), ("byte", "long"),
    ("short", "integer"), ("short", "long"),
    ("integer", "long"),
    ("byte", "double"), ("short", "double"), ("integer", "double"),
    ("long", "double"), ("float", "double"),
    ("integer", "decimal"), ("long", "decimal"),
    ("date", "timestamp"),
}


class SchemaEvolutionError(TypeError):
    """Incompatible evolution (narrowing / type clash)."""


def _is_safe(src: T.DataType, dst: T.DataType) -> bool:
    if src == dst:
        return True
    return (src.typeName(), dst.typeName()) in _SAFE_WIDENINGS


def reconcile_to_schema(df: DataFrame, target: T.StructType, strict: bool = True) -> DataFrame:
    """Project ``df`` onto ``target``: add missing columns as typed NULLs,
    widen compatible types, order columns. Extra columns in ``df`` that the
    target lacks are DROPPED (the caller widens the target first if it
    wants them — see ``unioned_schema``)."""
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for field in target.fields:
        if field.name not in have:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
            continue
        src_type = have[field.name].dataType
        if src_type == field.dataType:
            cols.append(F.col(field.name))
        elif _is_safe(src_type, field.dataType):
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        elif strict:
            raise SchemaEvolutionError(
                f"cannot evolve column {field.name!r}: "
                f"{src_type.simpleString()} → {field.dataType.simpleString()} is not a safe widening"
            )
        else:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def unioned_schema(current: T.StructType, incoming: T.StructType) -> T.StructType:
    """The evolved schema: current columns (widened where the incoming type
    is wider) + brand-new incoming columns appended (nullable)."""
    cur = {f.name: f for f in current.fields}
    out = []
    for f in current.fields:
        inc = next((g for g in incoming.fields if g.name == f.name), None)
        if inc is not None and inc.dataType != f.dataType:
            if _is_safe(f.dataType, inc.dataType):
                out.append(T.StructField(f.name, inc.dataType, True))
                continue
            if not _is_safe(inc.dataType, f.dataType):
                raise SchemaEvolutionError(
                    f"column {f.name!r}: {f.dataType.simpleString()} vs "
                    f"{inc.dataType.simpleString()} — no safe widening either way"
                )
        out.append(f)
    for g in incoming.fields:
        if g.name not in cur:
            out.append(T.StructField(g.name, g.dataType, True))
    return T.StructType(out)


def reconcile_arrow_batches(
    batches: Iterator[pa.RecordBatch], target: pa.Schema
) -> Iterator[pa.RecordBatch]:
    """Arrow-level reconciliation: per record batch, add missing columns as
    typed nulls and safe-cast mismatched physical types. Used where rows
    already cross the Arrow boundary (mapInPandas/mapInArrow stages) —
    e.g. an old producer wrote ``event_seq`` as int32."""
    for batch in batches:
        arrays = []
        for field in target:
            idx = batch.schema.get_field_index(field.name)
            if idx < 0:
                arrays.append(pa.nulls(batch.num_rows, type=field.type))
            else:
                col = batch.column(idx)
                arrays.append(col if col.type == field.type else col.cast(field.type))
        yield pa.RecordBatch.from_arrays(arrays, schema=target)


def evolve_events(df: DataFrame, target: T.StructType) -> DataFrame:
    """mapInArrow pipeline stage applying ``reconcile_arrow_batches`` —
    the vectorized (no per-row Python) physical reconciliation path."""
    target_arrow = T.to_arrow_schema(target) if hasattr(T, "to_arrow_schema") else None
    if target_arrow is None:  # public fallback: derive from an empty frame
        from pyspark.sql.pandas.types import to_arrow_schema

        target_arrow = to_arrow_schema(target)

    def fn(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        yield from reconcile_arrow_batches(it, target_arrow)

    return df.mapInArrow(fn, schema=target)
