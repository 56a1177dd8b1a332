"""Multi-entity dependency-ordered pipeline — FK parents before children.

The reference synchronizes entity types in a hard-coded dependency order —
users → groups → organizations → packages — so that FK parents exist on the
destination before children reference them
(/root/reference/bin/runBCDC2BCDC.py:286-289), and rewrites child foreign
keys through the cross-instance id cache (``src2DestRemap``,
/root/reference/bcdc2bcdc/DataCache.py:384-437: src surrogate id →
business key → dest surrogate id).

Spark-first generalization:

* The order is DERIVED from the declared FK remaps (topological sort), not
  hard-coded; a cycle is a config error raised at construction.
* Epochs run OUTER, entities inner: for each epoch, every entity applies in
  dependency order, and each child's FK columns are rewritten through the
  parent table's CURRENT (post-apply) state via ONE broadcast join per
  remap — the collapsed form of the reference's two-hop id→name→id lookup.
  A parent added in epoch N is therefore referenceable by a child event in
  the same epoch.
* Unresolvable references pass through unchanged (the reference demand-
  loads missing entries and warns; here the untranslated value is visible
  downstream rather than silently dropped).

At 100 TB each remap is a broadcast of the parent's (map_from, map_to)
projection — dimension-sized by construction (orgs/users are small
relative to packages); if a parent ever outgrows broadcast, the join
degrades gracefully to sort-merge because the hint is only a hint.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from bcdc2bcdc_spark.plans.pipeline import CDCPipeline


class DependencyCycleError(ValueError):
    """The declared FK remaps contain a dependency cycle."""


@dataclass(frozen=True)
class FKRemap:
    """Rewrite ``column`` of a child's events through the parent table:
    values matching the parent's ``map_from`` column become the parent's
    ``map_to`` value (reference DataCache.src2DestRemap collapsed to one
    broadcast join)."""

    column: str
    parent: str
    map_from: str
    map_to: str


def dependency_order(named: Sequence, deps_of) -> list:
    """Kahn topological sort over parent→child edges (deterministic:
    declaration order breaks ties, like the reference's fixed user→group→
    org→package order). ``deps_of(item)`` yields parent names."""
    deps = {e.name: {p for p in deps_of(e) if p != e.name} for e in named}
    order: list = []
    placed: set[str] = set()
    pending = list(named)
    while pending:
        ready = [e for e in pending if deps[e.name] <= placed]
        if not ready:
            cyc = ", ".join(e.name for e in pending)
            raise DependencyCycleError(f"FK dependency cycle among: {cyc}")
        for e in ready:
            order.append(e)
            placed.add(e.name)
        pending = [e for e in pending if e.name not in placed]
    return order


def apply_fk_remaps(events: DataFrame, remaps: Sequence[FKRemap], read_parent) -> DataFrame:
    """Rewrite each FK column through its parent's current state with ONE
    broadcast join per remap (the collapsed form of the reference's
    two-hop id→name→id lookup, DataCache.py:384-437). ``read_parent(name)``
    returns the parent DataFrame. The parent is unique on its BUSINESS
    key, not necessarily on map_from: duplicate map_from values collapse
    to the MIN map_to so the join can never fan a child event into
    duplicate rows (which lww_dedup would then tie-break arbitrarily).
    Unresolvable values pass through unchanged (visible downstream rather
    than silently dropped — the reference demand-loads and warns)."""
    for rm in remaps:
        mapping = (
            read_parent(rm.parent)
            .select(
                F.col(rm.map_from).alias("_fk_from"),
                F.col(rm.map_to).alias("_fk_to"),
            )
            .groupBy("_fk_from")
            .agg(F.min("_fk_to").alias("_fk_to"))
        )
        events = (
            events.join(
                F.broadcast(mapping),
                events[rm.column] == F.col("_fk_from"),
                "left",
            )
            .withColumn(rm.column, F.coalesce(F.col("_fk_to"), F.col(rm.column)))
            .drop("_fk_from", "_fk_to")
        )
    return events


@dataclass
class Entity:
    """One synchronized table: a name, its CDCPipeline, and the FK remaps
    its events need (each naming a parent entity)."""

    name: str
    pipeline: CDCPipeline
    fk_remaps: tuple[FKRemap, ...] = ()


@dataclass
class MultiTablePipeline:
    """Apply per-entity event logs in FK dependency order, epoch by epoch."""

    entities: Sequence[Entity]
    _order: list[Entity] = field(init=False, repr=False)

    def __post_init__(self) -> None:
        by_name = {e.name: e for e in self.entities}
        for e in self.entities:
            for rm in e.fk_remaps:
                if rm.parent not in by_name:
                    raise ValueError(
                        f"entity {e.name!r} remaps through unknown parent {rm.parent!r}"
                    )
        self._order = dependency_order(
            self.entities, lambda e: (rm.parent for rm in e.fk_remaps)
        )

    @property
    def apply_order(self) -> list[str]:
        return [e.name for e in self._order]

    def _remap(self, entity: Entity, events: DataFrame) -> DataFrame:
        by_name = {e.name: e for e in self.entities}
        return apply_fk_remaps(
            events,
            entity.fk_remaps,
            lambda name: by_name[name].pipeline.table.read(),
        )

    def run(
        self, events_by_entity: dict[str, DataFrame], epoch_col: str = "epoch"
    ) -> dict[str, dict[int, bool]]:
        """Apply every epoch across all entities: epochs ascend, entities
        follow dependency order within each epoch. Each entity keeps its
        own checkpoint store, so a crash resumes mid-epoch with parents
        already committed and children replaying idempotently."""
        missing = [e.name for e in self.entities if e.name not in events_by_entity]
        if missing:
            raise ValueError(f"no event frame for entities: {missing}")
        # ONE count job per entity up front replaces the former per-(entity,
        # epoch) isEmpty() probe — the epoch loop below launches zero extra
        # Spark jobs deciding what to skip.
        counts: dict[str, dict[int, int]] = {}
        for e in self.entities:
            rows = (
                events_by_entity[e.name]
                .groupBy(epoch_col)
                .agg(F.count(F.lit(1)).alias("_n"))
                .collect()
            )
            counts[e.name] = {int(r[epoch_col]): int(r["_n"]) for r in rows}
        epochs: set[int] = set()
        for per_entity in counts.values():
            epochs.update(per_entity)

        results: dict[str, dict[int, bool]] = {e.name: {} for e in self.entities}
        for e in self._order:
            e.pipeline.checkpoints.acquire_writer_lock()
        try:
            for ep in sorted(epochs):
                for e in self._order:
                    if not counts[e.name].get(ep):
                        continue
                    batch = events_by_entity[e.name].filter(
                        F.col(epoch_col) == ep
                    ).drop(epoch_col)
                    remapped = self._remap(e, batch)
                    results[e.name][ep] = e.pipeline.apply_epoch(remapped, ep)
        finally:
            for e in self._order:
                e.pipeline.checkpoints.release_writer_lock()
        return results
