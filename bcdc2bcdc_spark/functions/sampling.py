"""Deterministic sampling for training-data pipelines.

Corpus assembly needs sampling that is (a) reproducible run-to-run and
cluster-size-invariant, (b) joinable — the SAME document must land in the
same split everywhere it appears, and (c) cheap — no shuffle, no global
RNG state.  ``df.sample()`` gives none of that (partition-RNG seeded by
split index: results change with partitioning).  The standard fix is
content-hash thresholding: map each key through a salted hash to a
uniform [0,1) value and compare against the keep fraction.  Everything
here is a column expression over ``md5`` — whole-stage codegen, zero
Python, zero shuffle, and bit-reproducible in any engine that has md5
(the DuckDB oracles recompute identical values).

Uniformity: the first 13 hex digits of md5 are 52 bits — they fit a
double EXACTLY, so ``value / 16^13`` is the same double in Spark, DuckDB,
NumPy, anywhere. Changing ``salt`` draws an independent sample; keeping
it fixes the sample forever (the property that makes decontamination and
eval-split audits possible months later).

At 100 TB: filters push down nothing (the hash must be computed) but the
expression is a pure per-row map — no shuffle, no skew, and the filter
prunes rows before any downstream shuffle. Stratified fractions arrive
as a broadcast-small literal CASE, not a join.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 16^13 — the first 13 md5 hex digits as an integer are < 2^52, exactly
#: representable in a double on every engine.
_HASH_SPACE = float(16 ** 13)


def hash_uniform(key: Column | str, salt: str = "") -> Column:
    """Deterministic uniform [0,1) draw per key: md5(salt ':' key) first
    13 hex digits / 16^13. Same key + same salt → same double, in Spark
    and in SQL."""
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("double") / F.lit(_HASH_SPACE)


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — reproducible,
    partitioning-invariant, and consistent across tables sharing keys."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(hash_uniform(key_col, salt) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str,
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum keep fractions (the corpus-mixture knob: 'keep 100% of
    books, 30% of web, 5% of logs'). ``fractions`` becomes a literal CASE
    over ``strata_col`` — no join, no shuffle; unlisted strata get
    ``default_fraction``."""
    for s, f_ in fractions.items():
        if not 0.0 <= f_ <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0,1], got {f_}")
    frac: Column = F.lit(float(default_fraction))
    for s, f_ in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == F.lit(s), F.lit(float(f_))).otherwise(frac)
    return df.filter(hash_uniform(key_col, salt) < frac)


def split_column(
    key: Column | str,
    boundaries: Mapping[str, float],
    salt: str = "split",
) -> Column:
    """Label each row with a split name from cumulative ``boundaries``
    (e.g. {'train': 0.98, 'eval': 0.01, 'test': 0.01} — must sum to 1).
    Disjoint and exhaustive by construction: one uniform draw per key
    bucketed by running cumulative sum, so a document can never be in two
    splits and membership never changes when data moves."""
    total = sum(boundaries.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    u = hash_uniform(key, salt)
    expr: Column | None = None
    acc = 0.0
    items = list(boundaries.items())
    for name, frac in items[:-1]:
        acc += float(frac)
        expr = (
            F.when(u < F.lit(acc), F.lit(name))
            if expr is None
            else expr.when(u < F.lit(acc), F.lit(name))
        )
    last = F.lit(items[-1][0])
    return last if expr is None else expr.otherwise(last)
