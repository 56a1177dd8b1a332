"""sha256 content digests — the change-detection predicate (D1).

The reference detects UPDATEs by deep-diffing canonicalized records
(/root/reference/bcdc2bcdc/CKANData.py:307-313, Diff.py:35-67). Here the
canonical record is reduced to a sha256 digest and "changed" is digest
inequality — associative, order-insensitive, and computable map-side.

Two implementations, identical output, both tested against each other:

* ``sha256_expr``  — JVM built-in ``F.sha2(..., 256)``: stays inside
  whole-stage codegen, zero Python boundary. The fast path.
* ``sha256_arrow`` — vectorized pandas/Arrow UDF (the north-rule mandated
  form; Arrow batch transfer, hashlib over a pandas Series). Used at the
  schema-reconciliation boundary where rows already cross into Arrow, and
  selectable engine-wide via ``impl="arrow"``.

NULL handling: digests must distinguish NULL from any real string while
treating every canonical-falsy as the same NULL (canonicalize first!).
A reserved sentinel (an invalid-UTF8-free control prefix) encodes NULL.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

#: digest input for SQL NULL — cannot collide with real content because we
#: prefix every real value with "v:" and NULL with "n:".
_NULL_TAG = "n:"
_VAL_TAG = "v:"
#: field separator for multi-column row digests; 0x1f = ASCII unit sep.
_SEP = "\x1f"


def _tagged(col: Column) -> Column:
    return F.when(col.isNull(), F.lit(_NULL_TAG)).otherwise(F.concat(F.lit(_VAL_TAG), col))


def sha256_expr(col: Column | str) -> Column:
    """JVM-side sha256 hex digest of one (nullable) string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(_tagged(c), 256)


@pandas_udf(T.StringType())
def sha256_arrow(s: pd.Series) -> pd.Series:
    """Arrow-vectorized sha256 hex digest; bit-identical to sha256_expr."""

    def one(v: object) -> str:
        data = _NULL_TAG if v is None or pd.isna(v) else _VAL_TAG + str(v)
        return hashlib.sha256(data.encode("utf-8")).hexdigest()

    return s.map(one, na_action=None)


def row_digest_expr(cols: list[Column | str]) -> Column:
    """Digest of the canonical payload of a row.

    Each column is hashed INDIVIDUALLY first (fixed-width hex), then the
    per-column digests are concatenated and hashed again. Because the
    inner digests have fixed length, no value can imitate a column
    boundary — the mapping payload→digest is injective up to sha256
    collisions (a plain tagged-concat scheme is NOT: a value containing
    ``\\x1fv:`` forges a boundary)."""
    inner = [F.sha2(_tagged(F.col(c) if isinstance(c, str) else c), 256) for c in cols]
    if len(inner) == 1:
        return inner[0]
    return F.sha2(F.concat_ws(_SEP, *inner), 256)


def pd_row_digest(frame: pd.DataFrame, cols: list[str]) -> pd.Series:
    """Pure-pandas row digest, bit-identical to ``row_digest_expr`` — the
    single implementation behind the Arrow UDF AND the ``cdclake`` Python
    data source's executor-side fold (sources/datasource.py), so the two
    engines can never drift."""

    def cell(v: object) -> str:
        data = _NULL_TAG if v is None or pd.isna(v) else _VAL_TAG + str(v)
        return hashlib.sha256(data.encode("utf-8")).hexdigest()

    def one(row: tuple) -> str:
        inner = [cell(v) for v in row]
        if len(inner) == 1:
            return inner[0]
        return hashlib.sha256(_SEP.join(inner).encode("utf-8")).hexdigest()

    sub = frame[list(cols)]
    return pd.Series(
        [one(t) for t in sub.itertuples(index=False, name=None)], index=frame.index
    )


@pandas_udf(T.StringType())
def _row_digest_arrow(*series: pd.Series) -> pd.Series:
    frame = pd.concat(series, axis=1)
    frame.columns = list(range(len(series)))
    return pd_row_digest(frame, list(frame.columns)).reset_index(drop=True)


def with_row_digest(
    df: DataFrame,
    cols: list[str],
    out: str = "digest",
    impl: str = "arrow",
) -> DataFrame:
    """Attach a canonical-payload digest column.

    impl="arrow"  → pandas/Arrow UDF (north-rule mandated path).
    impl="jvm"    → whole-stage-codegen ``sha2`` (fastest; identical output).
    """
    if impl == "jvm":
        return df.withColumn(out, row_digest_expr(list(cols)))
    if impl == "arrow":
        return df.withColumn(out, _row_digest_arrow(*[F.col(c) for c in cols]))
    raise ValueError(f"unknown digest impl: {impl!r} (want 'arrow' or 'jvm')")
