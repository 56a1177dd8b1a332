"""Last-writer-wins dedup — one winner per business key per epoch.

The reference never resolves duplicate keys: its snapshots are unique-keyed
and its one duplicate-key situation (duplicate user emails) is *excluded*
rather than resolved (/root/reference/bcdc2bcdc/CKANData.py:1582-1637, P6).
A change-event tailer must *resolve*: several events per (repo, path) per
epoch collapse to the one with the greatest (commit, event_seq) — a total
order by construction (commit lexically monotone per key, event_seq unique).

Three physical strategies, identical results (property-tested):

* ``window``   — row_number over Window.partitionBy(keys).orderBy(desc order).
  Textbook; but a window sorts *within* every hash partition and a mega-hot
  key serializes into one task → the skew victim at 100 TB.
* ``maxby``    — groupBy(keys).agg(max_by(payload_struct, order_struct)).
  A hash aggregate with MAP-SIDE PARTIAL COMBINE: a hot key is reduced to
  one row per input partition before the shuffle, so skew largely
  disappears and shuffled bytes drop from O(events) to O(distinct keys).
  The default at scale.
* ``salted``   — the north-rule-mandated *explicit* salting: two-phase
  window (local winner per (keys, salt), then global winner over ≤n_salts
  survivors per key). Bounds any single task at ~1/n_salts of a hot key
  even where a full-row window is required.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from bcdc2bcdc_spark.schema import KEY_COLS, ORDER_COLS


def _desc_order(order_cols: Sequence[str]) -> list:
    return [F.col(c).desc() for c in order_cols]


def lww_dedup(
    df: DataFrame,
    key_cols: Sequence[str] = KEY_COLS,
    order_cols: Sequence[str] = ORDER_COLS,
    strategy: str = "maxby",
    n_salts: int = 16,
) -> DataFrame:
    """Keep exactly the last writer per key. Column set/order preserved."""
    if strategy == "window":
        return _lww_window(df, key_cols, order_cols)
    if strategy == "maxby":
        return _lww_maxby(df, key_cols, order_cols)
    if strategy == "salted":
        return _lww_salted(df, key_cols, order_cols, n_salts)
    raise ValueError(f"unknown LWW strategy {strategy!r}")


def _lww_window(df: DataFrame, key_cols: Sequence[str], order_cols: Sequence[str]) -> DataFrame:
    w = Window.partitionBy(*key_cols).orderBy(*_desc_order(order_cols))
    return (
        df.withColumn("_lww_rn", F.row_number().over(w))
        .filter(F.col("_lww_rn") == 1)
        .drop("_lww_rn")
    )


def _lww_maxby(df: DataFrame, key_cols: Sequence[str], order_cols: Sequence[str]) -> DataFrame:
    cols = df.columns
    payload = [c for c in cols if c not in key_cols]
    order_struct = F.struct(*[F.col(c) for c in order_cols])
    winner = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), order_struct).alias("_w")
    )
    return winner.select(
        *[F.col(f"_w.{c}").alias(c) if c in payload else F.col(c) for c in cols]
    )


def _lww_salted(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    n_salts: int,
) -> DataFrame:
    # Salt from the order columns: uniform within a key, deterministic.
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(n_salts))
    )
    w_local = Window.partitionBy(*key_cols, "_salt").orderBy(*_desc_order(order_cols))
    local = (
        salted.withColumn("_lww_rn", F.row_number().over(w_local))
        .filter(F.col("_lww_rn") == 1)
        .drop("_lww_rn", "_salt")
    )
    # ≤ n_salts survivors per key → the global pass is skew-free.
    return _lww_window(local, key_cols, order_cols)
