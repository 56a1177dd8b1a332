"""Nested-record operators — the reference's recursive dict machinery as
nested Column expressions.

The reference's records are nested JSON (packages → resources[] / tags[]);
its core per-record loops are:

* P1 ``filterNonUserGeneratedFields`` — walk the record against a
  bool-valued schema tree, keep only ``true`` fields, recurse into dicts
  and list-of-dict, materialize missing declared fields as None
  (/root/reference/bcdc2bcdc/CKANData.py:173-263).
* P2 ``removeEmbeddedIgnores`` — drop array elements whose key field is
  ignore-listed (CKANData.py:265-305, 785-838).
* J8 ``addAutoGenFields`` — pull configured fields from the DEST record
  into the SRC-derived payload (CKANData.py:457-479, 1182-1247).
* J9 ``remapUserNames`` — rewrite each embedded member's name across
  instance namespaces via a lookup (CustomTransformers.py:194-282).
* D2 two-level diff — digest nested sections separately, then the rest
  (CKANData.py:599-703).

Here each is a pure DataFrame/Column operator: struct rebuild, higher-order
array functions, broadcast joins — no per-row Python anywhere.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F, types as T

from bcdc2bcdc_spark.functions.digest import row_digest_expr


# ---------------------------------------------------------------------------
# P1 — bool-tree projection
# ---------------------------------------------------------------------------

def _project_value(col: Column, dtype: T.DataType, tree: Mapping) -> Column:
    """Rebuild ``col`` keeping only tree-true fields (recursing into
    structs and arrays-of-struct)."""
    if isinstance(dtype, T.StructType):
        return _project_struct(col, dtype, tree)
    if isinstance(dtype, T.ArrayType) and isinstance(dtype.elementType, T.StructType):
        elem_type = dtype.elementType
        return F.transform(col, lambda e: _project_struct(e, elem_type, tree))
    return col  # scalar with a dict tree is a config error caught upstream


def _project_struct(col: Column, dtype: T.StructType, tree: Mapping) -> Column:
    have = {f.name: f for f in dtype.fields}
    fields = []
    for name, sub in tree.items():
        if sub is False:
            continue
        if name not in have:
            # declared but missing → materialize as NULL
            # (reference CKANData.py:255-258 missing→None)
            fields.append(F.lit(None).cast("string").alias(name))
        elif sub is True:
            fields.append(col.getField(name).alias(name))
        else:  # nested tree
            f = have[name]
            fields.append(
                _project_value(col.getField(name), f.dataType, sub).alias(name)
            )
    return F.struct(*fields)


def project_user_fields(df: DataFrame, tree: Mapping) -> DataFrame:
    """Top-level P1: keep only user-populated (tree-true) columns; recurse
    into struct and array-of-struct columns; declared-but-missing columns
    materialize as NULL strings. The compare-form projection."""
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for name, sub in tree.items():
        if sub is False:
            continue
        if name not in have:
            cols.append(F.lit(None).cast("string").alias(name))
        elif sub is True:
            cols.append(F.col(name))
        else:
            f = have[name]
            cols.append(_project_value(F.col(name), f.dataType, sub).alias(name))
    return df.select(*cols)


# ---------------------------------------------------------------------------
# P2 — embedded-ignore anti-filter (higher-order, no explode)
# ---------------------------------------------------------------------------

def remove_embedded_ignores(
    df: DataFrame, array_col: str, key_field: str, ignores: Sequence[str]
) -> DataFrame:
    """Drop elements of ``array_col`` (array<struct>) whose ``key_field``
    value is ignore-listed. Runs inside codegen via F.filter — the
    reference walks and deletes indexes per record (CKANData.py:785-796)."""
    if not ignores:
        return df
    return df.withColumn(
        array_col,
        F.filter(F.col(array_col), lambda e: ~e.getField(key_field).isin(*ignores)),
    )


# ---------------------------------------------------------------------------
# J8 — dest-field backfill
# ---------------------------------------------------------------------------

def backfill_fields(
    src: DataFrame,
    dest: DataFrame,
    key_cols: Sequence[str],
    fields: Sequence[str],
) -> DataFrame:
    """Pull ``fields`` from the matching DEST record into the SRC payload
    (e.g. dest surrogate id into an update payload). Left join: SRC rows
    with no DEST match keep NULL (they are ADDs)."""
    d = dest.select(*key_cols, *[F.col(f).alias(f"_dest_{f}") for f in fields])
    out = src.join(d, list(key_cols), "left")
    for f in fields:
        out = out.withColumn(f, F.coalesce(F.col(f"_dest_{f}"), F.col(f) if f in src.columns else F.lit(None))).drop(f"_dest_{f}")
    return out


# ---------------------------------------------------------------------------
# J9 — embedded member remap via broadcast lookup
# ---------------------------------------------------------------------------

def remap_embedded_field(
    df: DataFrame,
    array_col: str,
    field: str,
    mapping: DataFrame,
    map_from: str,
    map_to: str,
) -> DataFrame:
    """Rewrite ``field`` of every element of ``array_col`` through a
    mapping table (src-namespace value → dest-namespace value); unmapped
    values pass through.

    Physical shape: explode → ONE broadcast join → re-aggregate with
    ``collect_list`` grouped by a row id (the reference loops per member,
    CustomTransformers.py:194-245). Element order is preserved by sorting
    on the captured element index. Rows whose array is NULL or empty skip
    the explode entirely and pass through unchanged — exploding them would
    regroup into a corrupt one-element [null] array."""
    rid = "_rid"
    pos = "_pos"
    other_cols = [c for c in df.columns if c != array_col]
    with_id = df.withColumn(rid, F.monotonically_increasing_id())
    has_elems = F.col(array_col).isNotNull() & (F.size(array_col) > 0)
    passthrough = with_id.filter(~F.coalesce(has_elems, F.lit(False)))
    exploded = with_id.filter(has_elems).select(
        rid, *other_cols, F.posexplode(array_col).alias(pos, "_elem")
    )
    m = mapping.select(
        F.col(map_from).alias("_from"), F.col(map_to).alias("_to")
    )
    joined = exploded.join(
        F.broadcast(m), exploded["_elem"].getField(field) == F.col("_from"), "left"
    )
    new_elem = F.when(
        F.col("_elem").isNull(), F.col("_elem")
    ).otherwise(
        F.col("_elem").withField(field, F.coalesce(F.col("_to"), F.col("_elem").getField(field)))
    )
    regrouped = (
        joined.withColumn("_elem2", new_elem)
        .groupBy(rid, *other_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(pos).alias("p"), F.col("_elem2").alias("e")))
            ).alias("_pe")
        )
        .withColumn(array_col, F.transform(F.col("_pe"), lambda x: x.getField("e")))
        .drop("_pe")
    )
    return (
        regrouped.select(rid, *df.columns)
        .unionByName(passthrough.select(rid, *df.columns))
        .drop(rid)
    )


# ---------------------------------------------------------------------------
# D2 — two-level digest (struct-of-digests)
# ---------------------------------------------------------------------------

def with_section_digests(
    df: DataFrame,
    scalar_cols: Sequence[str],
    array_col: str | None = None,
    out_prefix: str = "digest",
) -> DataFrame:
    """Attach ``{prefix}_top`` over the scalar payload and, if given,
    ``{prefix}_{array_col}`` over the canonical form of a nested array
    (elements serialized with to_json, ORDER-INSENSITIVE via array_sort —
    the reference diffs resources first, order-ignored, then the rest:
    CKANData.py:599-703 + deepdiff ignore_order)."""
    out = df.withColumn(f"{out_prefix}_top", row_digest_expr(list(scalar_cols)))
    if array_col is not None:
        canon = F.array_sort(
            F.transform(F.col(array_col), lambda e: F.to_json(e))
        )
        out = out.withColumn(
            f"{out_prefix}_{array_col}",
            F.sha2(F.concat_ws("\x1f", canon), 256),
        )
    return out
