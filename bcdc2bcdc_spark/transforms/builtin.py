"""Built-in canonicalizers — the reference's CustomTransformers family
re-expressed as Column-expression builders (never per-row Python; the one
genuinely non-relational case, canonical JSON, is an Arrow pandas UDF).

Each builder takes config kwargs and returns DataFrame → DataFrame, so a
configured pipeline is just function composition — the run-once guarantee
the reference enforces with an ``operations`` memo list
(/root/reference/bcdc2bcdc/CKANData.py:143-169) falls out of building a
DAG instead of mutating records.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

Transform = Callable[[DataFrame], DataFrame]


def fix_none_as_string(columns: Sequence[str]) -> Transform:
    """literal 'None' (and casing variants) → real NULL.
    Reference: CustomTransformers.fixNoneAsString (:153-170, T5)."""

    def apply(df: DataFrame) -> DataFrame:
        for c in columns:
            df = df.withColumn(
                c, F.when(F.lower(F.col(c)) == "none", None).otherwise(F.col(c))
            )
        return df

    return apply


def canonical_nullish(columns: Sequence[str], extra_nulls: Sequence[str] = ()) -> Transform:
    """''/'None'/'null'/'N/A' (+ configured variants) → NULL.
    Reference: __checkForNoneInResource family (:379-402, T8) and
    check4MissingProperties (:451-469, T12 — key-removal ≡ null)."""
    nulls = ["", "None", "null", "NULL", "N/A", *extra_nulls]

    def apply(df: DataFrame) -> DataFrame:
        for c in columns:
            df = df.withColumn(
                c, F.when(F.col(c).isin(nulls), None).otherwise(F.col(c))
            )
        return df

    return apply


def force_constant(column: str, value: str) -> Transform:
    """Pin a field to a constant on both sides before compare.
    Reference: fixPackageType (:292-303, T7)."""
    return lambda df: df.withColumn(column, F.lit(value))


def required_default(column: str, default: str) -> Transform:
    """NULL/missing → default. Reference: DataPopulator / required_default_values
    (CKANData.py:1789-1885, :1127-1159, T1) and addStrangeFields (:781-796, T17)."""
    return lambda df: df.withColumn(column, F.coalesce(F.col(column), F.lit(default)))


def canonical_bool_string(column: str) -> Transform:
    """'True'/'FALSE'/... → canonical 'true'/'false' (schema stays string).
    Reference: fixOFI (:317-338, T9)."""

    def apply(df: DataFrame) -> DataFrame:
        low = F.lower(F.col(column))
        return df.withColumn(
            column,
            F.when(low.isin("true", "t", "1", "yes"), "true")
            .when(low.isin("false", "f", "0", "no"), "false")
            .otherwise(F.col(column)),
        )

    return apply


def rewrite_host(column: str, src_host: str, dest_host: str, default: str | None = None) -> Transform:
    """URL host == src → rewrite to dest; NULL → default.
    Reference: adjustURLDomain (:340-377, T10)."""

    def apply(df: DataFrame) -> DataFrame:
        rewritten = F.regexp_replace(
            F.col(column), f"^(https?://){src_host}", f"$1{dest_host}"
        )
        out = F.when(F.col(column).isNull(), F.lit(default)).otherwise(rewritten)
        return df.withColumn(column, out)

    return apply


def domain_validate(column: str, domain: Sequence[str], default: str) -> Transform:
    """value ∉ domain (or NULL) → default.
    Reference: fixResourceBCDC_TYPE/AccessMethod/StorageFormat/... via
    __validateResourceProperty (:404-599, T11)."""
    return lambda df: df.withColumn(
        column,
        F.when(F.col(column).isin(list(domain)), F.col(column)).otherwise(default),
    )


def value_remap(column: str, mapping: dict[str, str], default: str | None = None) -> Transform:
    """Closed value remap ladder; unmapped → default (None = keep).
    Reference: fixSecurityClass (:601-637, T13)."""

    def apply(df: DataFrame) -> DataFrame:
        expr: Column | None = None
        for src, dst in mapping.items():
            expr = (
                F.when(F.col(column) == src, dst)
                if expr is None
                else expr.when(F.col(column) == src, dst)
            )
        fallback = F.col(column) if default is None else F.lit(default)
        return df.withColumn(column, expr.otherwise(fallback) if expr is not None else fallback)

    return apply


def conditional_default(column: str, default: str, when_column: str, equals: str) -> Transform:
    """If when_column == equals and column is NULL → inject default.
    Reference: fixResourceStatus retention_expiry_date (:639-656, T14)."""
    return lambda df: df.withColumn(
        column,
        F.when(
            (F.col(when_column) == equals) & F.col(column).isNull(), F.lit(default)
        ).otherwise(F.col(column)),
    )


def word_match_domain(column: str, domain: Sequence[str], default: str) -> Transform:
    """NULL → default; else substitute the first domain value sharing a
    (lowercased) word with the current value; no match → default.
    Reference: fixDownloadAudience/__fixDataSetPropertyUsingDomainWordMatch
    (:658-713, T15)."""

    def apply(df: DataFrame) -> DataFrame:
        words = F.split(F.lower(F.col(column)), r"\s+")
        expr = F.lit(None).cast("string")
        # build right-to-left so earlier domain entries win
        for d in reversed(list(domain)):
            d_words = [w for w in d.lower().split() if w]
            cond = None
            for w in d_words:
                c = F.array_contains(words, w)
                cond = c if cond is None else (cond | c)
            if cond is not None:
                expr = F.when(cond, F.lit(d)).otherwise(expr)
        return df.withColumn(
            column,
            F.when(F.col(column).isNull(), F.lit(default)).otherwise(
                F.coalesce(expr, F.lit(default))
            ),
        )

    return apply


@pandas_udf(T.StringType())
def _canonical_json_arrow(s: pd.Series) -> pd.Series:
    """Arrow-vectorized canonical JSON: parse → sorted keys, compact
    separators → re-serialize. Unparseable/NULL → canonical empty '[]'.
    Reference: fixMoreInfo/__fixMoreInfoAsStr (:715-779, T16)."""

    def one(v: object) -> str:
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "[]"
        try:
            return json.dumps(json.loads(str(v)), sort_keys=True, separators=(",", ":"))
        except (ValueError, TypeError):
            return "[]"

    return s.map(one, na_action=None)


def canonical_json(column: str) -> Transform:
    return lambda df: df.withColumn(column, _canonical_json_arrow(F.col(column)))


def rename_key_field(column: str, mapping: dict[str, str]) -> Transform:
    """Rename keys inside a stringified-JSON column (e.g. link→url) then
    canonicalize. Reference: __fixMoreInfoAsStr link→url (:746-767)."""

    def apply(df: DataFrame) -> DataFrame:
        out = F.col(column)
        for old, new in mapping.items():
            out = F.regexp_replace(out, f'"{old}"\\s*:', f'"{new}":')
        return df.withColumn(column, out)

    return apply


#: name → builder; the Spark-native MethodMapping
#: (reference: CustomTransformers.MethodMapping, :24-120, T4)
BUILTIN_TRANSFORMS: dict[str, Callable[..., Transform]] = {
    "fix_none_as_string": fix_none_as_string,
    "canonical_nullish": canonical_nullish,
    "force_constant": force_constant,
    "required_default": required_default,
    "canonical_bool_string": canonical_bool_string,
    "rewrite_host": rewrite_host,
    "domain_validate": domain_validate,
    "value_remap": value_remap,
    "conditional_default": conditional_default,
    "word_match_domain": word_match_domain,
    "canonical_json": canonical_json,
    "rename_key_field": rename_key_field,
}
