"""Multi-table catalog: consistent cross-table snapshots + coordinated
rollback.

The reference operates on a SET of entity types as one logical unit —
users, groups, orgs and packages are synced in one run, in FK order
(``/root/reference/bin/runBCDC2BCDC.py:286-289``), and a run summary
describes the whole set. Per-table commits alone cannot answer "what did
the WHOLE lake look like when the run finished?" — readers joining
tables pinned at unrelated versions see FK states that never coexisted.

:class:`LakeCatalog` is the metadata layer for that question. It owns no
data: a catalog version is one atomically-written JSON fact mapping every
registered table to the ``commit_seq`` it was at — Iceberg's
"snapshot of snapshots" / a transaction log over table pointers.

* ``snapshot()`` — record the current (table → seq) vector as a new
  catalog version. Call it at run boundaries (after a
  MultiTableReplicator pass, after a pipeline epoch) to publish "these
  versions belong together".
* ``read(name, version=...)`` — a table AS OF a catalog version: every
  table read through the same catalog version yields a mutually
  consistent join surface (valid while each table's generations survive
  its retention window — same contract as ``read_version``).
* ``restore(version)`` — coordinated rollback: every registered table is
  ``restore()``d to its pinned seq (each a metadata-only commit), then
  the post-restore state is snapshotted as a NEW catalog version.
  Partial-failure honesty: tables are restored one by one; if a restore
  raises (e.g. expired generations), the already-restored tables stay
  restored and the exception reports which table failed — the catalog
  file itself is only advanced after ALL tables succeed, so a re-run
  resumes the same target trivially (restore is idempotent per table).

At 100 TB the catalog stays a few KB per version — it scales with table
COUNT, not data size — and adds zero work to the tables' own write
paths.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from bcdc2bcdc_spark.sources.fs import LocalFS


@dataclass
class LakeCatalog:
    """Catalog rooted at ``path``; tables register by name."""

    path: str
    fs: object = field(default_factory=LocalFS)
    _tables: dict = field(default_factory=dict)

    @property
    def state_path(self) -> str:
        return os.path.join(self.path, "_catalog.json")

    def register(self, name: str, table) -> "LakeCatalog":
        """Attach a table handle under ``name`` (chainable). Registration
        is per-process wiring; the persisted catalog versions only store
        names + paths + seqs."""
        self._tables[name] = table
        return self

    def _require(self, name: str):
        if name not in self._tables:
            raise ValueError(
                f"table {name!r} not registered; have {sorted(self._tables)}"
            )
        return self._tables[name]

    def _state(self) -> dict:
        if not self.fs.exists(self.state_path):
            return {"versions": {}}
        return self.fs.read_json(self.state_path)

    def versions(self) -> list[int]:
        return sorted(int(v) for v in self._state()["versions"])

    def _pins(self, version: int) -> dict:
        st = self._state()
        key = str(version)
        if key not in st["versions"]:
            raise ValueError(
                f"no catalog version {version}; have {self.versions()}"
            )
        return st["versions"][key]

    # -- snapshot / read --------------------------------------------------

    def snapshot(self) -> int:
        """Publish the current (table → commit_seq) vector as the next
        catalog version; returns its number. The write is one atomic
        JSON swap — a reader either sees the whole vector or none of it.

        NOTE: the seqs are sampled table-by-table; call at a quiescent
        boundary (end of a pass/epoch, as the reference's run summary
        does) — the catalog makes co-published versions consistent, it
        does not freeze concurrent writers mid-pass."""
        st = self._state()
        ver = max((int(v) for v in st["versions"]), default=0) + 1
        st["versions"][str(ver)] = {
            name: {"path": t.path, "seq": t.commit_seq()}
            for name, t in sorted(self._tables.items())
        }
        self.fs.write_json_atomic(self.state_path, st)
        return ver

    def pinned_seq(self, name: str, version: int) -> int:
        return int(self._pins(version)[name]["seq"])

    def read(self, name: str, version: int | None = None) -> DataFrame:
        """``name`` as of catalog ``version`` (default: latest snapshot).
        All reads through one version form a consistent join surface."""
        t = self._require(name)
        if version is None:
            vs = self.versions()
            if not vs:
                raise ValueError("no catalog snapshot yet — call snapshot()")
            version = vs[-1]
        pins = self._pins(version)
        if name not in pins:
            raise ValueError(
                f"table {name!r} is not in catalog version {version} "
                f"(registered later?); that version pins {sorted(pins)}"
            )
        return t.read_version(int(pins[name]["seq"]))

    # -- coordinated rollback --------------------------------------------

    def restore(self, version: int) -> int:
        """Roll EVERY table in catalog ``version`` back to its pinned
        seq (each a metadata-only ``restore`` commit), then snapshot the
        result as a new catalog version and return its number. Tables
        registered after the target version was taken are left untouched
        (and reported in the new snapshot at their current seq)."""
        pins = self._pins(version)
        unknown = sorted(set(pins) - set(self._tables))
        if unknown:
            raise ValueError(
                f"catalog version {version} pins unregistered tables "
                f"{unknown} — register them before restoring"
            )
        for name in sorted(pins):
            try:
                self._tables[name].restore(int(pins[name]["seq"]))
            except Exception as e:
                raise RuntimeError(
                    f"coordinated restore to catalog version {version} "
                    f"failed at table {name!r}: {e} — previously restored "
                    "tables remain restored; fix and re-run (per-table "
                    "restore is idempotent)"
                ) from e
        return self.snapshot()
