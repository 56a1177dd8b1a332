"""Incremental aggregate maintenance — materialized views fed by the
change data feed instead of recomputed from the table.

The reference recomputes its summary counts from scratch every run (delta
summary logging, /root/reference/bcdc2bcdc/CKANUpdate.py:120-145); at
100 TB a per-repo rollup recomputed per epoch is an O(table) scan for an
O(changes) truth change. This module maintains SUM/COUNT-shaped rollups
*incrementally*: the feed's pre/post images yield per-group NET deltas
(post-contribution minus pre-contribution), and one small full-outer join
folds them into the standing view. Maintenance cost is O(changes) +
O(affected groups) — independent of table size — and the invariant

    apply_delta(full_state(v_a), delta(read_changes(v_a, v_b)))
        == full_state(v_b)

is exact (not approximate) because every measure is an abelian-group
aggregate: COUNT and SUM admit subtraction, so deletes and updates
reverse cleanly. MIN/MAX do not (a deleted extremum needs a rescan) and
are deliberately not offered here.

Measures are SQL expressions over the payload columns (evaluated against
the post-image for additions and against the pre-image for retractions),
so the whole path is Catalyst expressions — no UDFs, no Python rows.

Standing-stream hygiene: ``apply_delta`` returns a NEW DataFrame whose
lineage includes the previous view. A long-lived driver loop (e.g. a
foreachBatch maintaining one view across micro-batches) must (a) cache
the new view and materialize it BEFORE dropping the old one, (b)
``unpersist()`` the superseded handle — otherwise storage memory grows
linearly in batch count — and (c) cut the lineage chain every N batches
(``localCheckpoint(eager=True)``), or a cache eviction recomputes the
view through every delta since the stream started. See
``q_stream_incremental_mv`` in ``driver_queries.py`` for the pattern.
"""

from __future__ import annotations

import re
from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

#: aggregate heads that are NOT abelian-group measures: a deleted
#: extremum cannot be reversed by subtraction, so a view over them would
#: silently drift from the recompute after the first retraction
_NON_ABELIAN = re.compile(r"\b(min|max|first|last|any_value)\s*\(", re.IGNORECASE)

from bcdc2bcdc_spark.schema import OP_ADD, OP_DELETE

#: the implicit group-liveness measure: when a group's row count reaches
#: zero it leaves the view (matching what a recompute would produce)
_N_ROWS = "n_rows"


@dataclass
class IncrementalAggregate:
    """A SUM/COUNT rollup over the lake table, maintainable from the feed.

    ``group_cols`` must be business-key columns (present on both images —
    DELETE feed rows carry NULL payload but full keys). ``measures`` maps
    output column → SQL expression over payload columns; each is summed
    per group. ``n_rows`` (COUNT(*)) is always included — it is the
    group-liveness signal.
    """

    group_cols: tuple[str, ...] = ("repo",)
    measures: Mapping[str, str] = field(
        default_factory=lambda: {"total_bytes": "length(content)"}
    )

    def __post_init__(self) -> None:
        for name, expr in self.measures.items():
            hit = _NON_ABELIAN.search(expr)
            if hit:
                raise ValueError(
                    f"measure {name!r} uses {hit.group(1)}(), which is not "
                    "an abelian-group aggregate: retractions (DELETE/UPDATE "
                    "pre-images) cannot reverse it by subtraction, so the "
                    "incremental view would diverge from a recompute. Use "
                    "SUM/COUNT-shaped expressions, or recompute via "
                    "full_state()."
                )

    @property
    def _names(self) -> list[str]:
        return [_N_ROWS, *self.measures]

    def _contrib(self) -> dict[str, F.Column]:
        """Per-row measure contributions, unaliased (NULL expression
        values count 0 — a SUM skips NULLs, so retractions must too)."""
        return {
            name: F.coalesce(F.expr(expr).cast("long"), F.lit(0))
            for name, expr in self.measures.items()
        }

    def full_state(self, snapshot: DataFrame) -> DataFrame:
        """The view recomputed from scratch — initialization, and the
        oracle the incremental path must equal."""
        return snapshot.groupBy(*self.group_cols).agg(
            F.count(F.lit(1)).alias(_N_ROWS),
            *[
                F.sum(F.coalesce(F.expr(e).cast("long"), F.lit(0))).alias(n)
                for n, e in self.measures.items()
            ],
        )

    def delta(self, feed: DataFrame) -> DataFrame:
        """Per-group NET deltas from a pre/post-image change feed
        (``read_changes(..., include_pre=True)``): ADD contributes
        +post, DELETE contributes −pre, UPDATE contributes both. One
        union + one partial-aggregated groupBy — O(changes) shuffled
        rows, no window."""
        contrib = self._contrib()
        post = feed.filter(F.col("op") != OP_DELETE).select(
            *self.group_cols,
            F.lit(1).alias(_N_ROWS),
            *[c.alias(n) for n, c in contrib.items()],
        )
        # expose the pre-image under the plain payload names, so the SAME
        # measure expressions evaluate against it — then negate
        pre_names = [c[len("pre_") :] for c in feed.columns if c.startswith("pre_")]
        pre_view = feed.select(
            *self.group_cols,
            *[F.col(f"pre_{c}").alias(c) for c in pre_names],
            "op",
        )
        pre = pre_view.filter(F.col("op") != OP_ADD).select(
            *self.group_cols,
            F.lit(-1).alias(_N_ROWS),
            *[(-c).alias(n) for n, c in contrib.items()],
        )
        return (
            post.unionByName(pre)
            .groupBy(*self.group_cols)
            .agg(*[F.sum(n).alias(n) for n in self._names])
        )

    def apply_delta(self, view: DataFrame, delta: DataFrame) -> DataFrame:
        """Fold net deltas into the standing view: full-outer join on the
        group key, sum, and drop groups whose row count reached zero.
        O(affected groups) new state — the view itself never rescans the
        table."""
        v = view.select(
            *self.group_cols, *[F.col(n).alias(f"_v_{n}") for n in self._names]
        )
        d = delta.select(
            *self.group_cols, *[F.col(n).alias(f"_d_{n}") for n in self._names]
        )
        merged = v.join(d, list(self.group_cols), "full_outer").select(
            *self.group_cols,
            *[
                (
                    F.coalesce(F.col(f"_v_{n}"), F.lit(0))
                    + F.coalesce(F.col(f"_d_{n}"), F.lit(0))
                ).alias(n)
                for n in self._names
            ],
        )
        return merged.filter(F.col(_N_ROWS) > 0)
