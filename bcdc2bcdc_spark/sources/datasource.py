"""``cdclake`` — the lake as a first-class Spark data source (PySpark 4
Python Data Source API).

* ``spark.read.format("cdclake").option("path", p).load()`` scans the
  CURRENT table state: one input partition per bucket, each folding its
  base + outstanding MOR deltas executor-side.
* ``spark.readStream.format("cdclake").option("path", p).load()`` tails
  the CHANGE DATA FEED: stream offsets ARE the table's commit sequence
  numbers, each micro-batch is the manifest-diff between two committed
  versions, and partitions are the CHANGED buckets only — the streaming
  form of ``HashBucketParquetTable.read_changes`` (sources/lake.py).
  Feeding it to ``foreachBatch(dst.upsert)`` is streaming lake→lake
  replication (the reference's source→dest sync as a continuous query).

Executor-side reads use pyarrow + pandas directly (a Python data source
runs its ``read()`` in Python workers — there is no SparkSession there),
re-implementing the same per-key version fold as the JVM path
(`lake._merge_versions`): versions sorted by commit seq, DELETE resets,
digest-equal upsert keeps the prior row (no-op suppression preserves
``commit``). ``tests/test_datasource.py`` pins the two implementations
together. Work per partition is O(bucket + its deltas); planning is
driver-side manifest JSON only.

Per-task memory on the snapshot path is BOUNDED: key-sorted tables (the
default layout — no cluster_cols) fold through a boundary-chunked k-way
merge over the generation streams (``_fold_bucket_streamed``), peak
O(batch_rows × generations) regardless of bucket size. Clustered tables
(whose files are ordered by non-key columns) fall back to whole-bucket
materialization behind ``_guard_bucket_bytes``, as does the change-feed
diff path (two full folds per bucket).

Offsets/retention: a stream that falls more than ``retain_generations``
commits behind loses the frozen manifests it needs — same contract as
``read_version``. Size retention to the longest expected stream outage.

Rows are yielded as Arrow RecordBatches (one per partition), not
per-row tuples — the Arrow path keeps the Python-source overhead at the
batch level.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql import SparkSession, types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

#: Filter class → predicate-DSL op (sources/lake.py). Only these translate;
#: anything else stays Spark-side (pushFilters returns every filter as
#: residual anyway — pruning is a fast path, never load-bearing).
_FILTER_OPS = {
    EqualTo: "=",
    In: "in",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
}

OP_DELETE = "DELETE"  # schema.py constant, inlined: executors import nothing heavy


# ---------------------------------------------------------------------------
# executor-side helpers (plain pyarrow/pandas — no Spark)
# ---------------------------------------------------------------------------


def _nullable_dtypes():
    """pyarrow→pandas nullable dtype map for ints/bools: a NULL in any
    file must NOT float-promote the column (str(42.0) != the JVM digest's
    '42' — functions/digest.py pd_row_digest is dtype-aware and relies on
    this)."""
    import pandas as pd
    import pyarrow as pa

    return {
        pa.int8(): pd.Int8Dtype(),
        pa.int16(): pd.Int16Dtype(),
        pa.int32(): pd.Int32Dtype(),
        pa.int64(): pd.Int64Dtype(),
        pa.bool_(): pd.BooleanDtype(),
    }


def _backfill(df, columns: list[str]):
    """NULL-backfill missing columns and project to exactly ``columns`` —
    schema evolution reads old files under the new schema, like the JVM
    path."""
    for c in columns:
        if c not in df.columns:
            df[c] = None
    return df[columns]


def _read_dir(path: str, columns: list[str]):
    """All parquet files directly under ``path`` as one pandas frame with
    exactly ``columns``."""
    import pandas as pd
    import pyarrow.parquet as pq

    nullable = _nullable_dtypes()
    frames = []
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            if f.endswith(".parquet"):
                tbl = pq.read_table(os.path.join(path, f))
                frames.append(tbl.to_pandas(types_mapper=nullable.get))
    if not frames:
        return pd.DataFrame({c: pd.Series(dtype="object") for c in columns})
    return _backfill(pd.concat(frames, ignore_index=True), columns)


#: default per-task ceiling on one bucket's LIVE parquet bytes
#: (base + outstanding deltas, compressed on-disk size) — applies only
#: where a task materializes its whole bucket in pandas before folding
#: (the feed's diff path, clustered tables, streamfold=false); there peak
#: memory is O(bucket bytes × decompression ratio), unlike the JVM read
#: path (streaming hash aggregate) and the default streamed snapshot fold
#: (O(batch × generations)). 2 GiB compressed is a conservative fit for
#: the default 4-8 GiB Python-worker budget; override per read with
#: .option("maxbucketbytes", n) — 0 disables the guard.
DEFAULT_MAX_BUCKET_BYTES = 2 * 1024**3


class BucketTooLargeError(RuntimeError):
    """A bucket's live bytes exceed the per-task materialization ceiling."""


def _dir_bytes(path: str | None) -> int:
    if not path or not os.path.isdir(path):
        return 0
    return sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )


def _guard_bucket_bytes(specs: list[dict], max_bytes: int) -> None:
    """Refuse — BEFORE allocating anything — to materialize a bucket whose
    live on-disk bytes exceed the ceiling, pointing at the actual fixes.
    Runs executor-side per task: O(files in this bucket) stat calls, no
    data read. This is the table_stats-per-bucket-bytes check pushed to
    the one place it cannot be skipped (the 100 TB failure mode is a
    silent worker OOM mid-scan; this turns it into a planned, actionable
    error)."""
    if max_bytes <= 0:
        return
    total = sum(
        _dir_bytes(s.get("base")) + sum(_dir_bytes(d["dir"]) for d in s.get("deltas", []))
        for s in specs
    )
    if total > max_bytes:
        raise BucketTooLargeError(
            f"cdclake: bucket holds {total:,} live parquet bytes, over the "
            f"per-task materialization ceiling of {max_bytes:,} (the Python "
            "source folds a whole bucket in pandas). Fixes: rebucket() the "
            "table to more buckets, compact_deltas() to shed MOR overlap, "
            "use the JVM read path (HashBucketParquetTable.read), or raise "
            ".option('maxbucketbytes', n) / 0 to disable."
        )


def _load_versions(spec: dict, columns: list[str]):
    """One version's rows for one bucket: base dir at seq -1 plus delta
    dirs at their commit seqs, concatenated with a ``_seq`` column."""
    import pandas as pd

    parts = []
    if spec.get("base"):
        b = _read_dir(spec["base"], columns + ["_digest"])
        b["op"] = None
        b["_seq"] = -1
        parts.append(b)
    for d in spec.get("deltas", []):
        f = _read_dir(d["dir"], columns + ["_digest", "op"])
        f["_seq"] = int(d["seq"])
        parts.append(f)
    if not parts:
        return pd.DataFrame(
            {c: pd.Series(dtype="object") for c in columns + ["_digest", "op", "_seq"]}
        )
    return pd.concat(parts, ignore_index=True)


def _fold_bucket(spec: dict, key_cols: list[str], columns: list[str],
                 redigest_cols: list[str] | None = None):
    """The per-key version fold (pandas mirror of lake._merge_versions):
    sort by seq, DELETE resets, digest-equal upsert is a no-op that keeps
    the prior row. O(rows) single pass after one sort.

    ``redigest_cols``: when the manifest's stored digests are incoherent
    (digest_cols lags compare_cols after evolve(), or the caller spans
    two compare sets), recompute ``_digest`` over this column set with
    the SAME bit-exact formula as the engine (functions/digest.py
    pd_row_digest) — mirroring lake._read_merged_raw's lag branch."""
    df = _load_versions(spec, columns)
    return _fold_frame(df, key_cols, redigest_cols)


def _fold_frame(df, key_cols: list[str], redigest_cols: list[str] | None = None):
    """The vectorized fold core over one frame holding ALL versions of
    every key it contains (columns ``*payload, _digest, op, _seq``)."""
    if df.empty:
        return df.drop(columns=["op", "_seq"], errors="ignore")
    if redigest_cols is not None:
        from bcdc2bcdc_spark.functions.digest import pd_row_digest

        df["_digest"] = pd_row_digest(df, redigest_cols)
    import numpy as np
    import pandas as pd

    df = df.sort_values([*key_cols, "_seq"], kind="mergesort").reset_index(drop=True)
    # Vectorized fold (no per-row Python): walking versions in seq order,
    # the state's digest always equals the last non-delete row's digest
    # (a no-op keeps a state whose digest already matches), so the
    # survivor is exactly the FIRST row of the LAST run of consecutive
    # equal digests AFTER the key's last DELETE — and keeping the run's
    # first row is what preserves `commit` across no-op upserts.
    n = len(df)
    pos = np.arange(n)
    key_id = df.groupby(key_cols, sort=False, dropna=False).ngroup().to_numpy()
    isdel = df["op"].to_numpy(dtype=object) == OP_DELETE
    last_del = (
        pd.Series(np.where(isdel, pos, -1))
        .groupby(key_id)
        .transform("max")
        .to_numpy()
    )
    in_suffix = ~isdel & (pos > last_del)  # contiguous tail: no DELETE after
    dig = df["_digest"].to_numpy(dtype=object)
    prev_ok = np.zeros(n, dtype=bool)
    prev_ok[1:] = in_suffix[1:] & in_suffix[:-1] & (key_id[1:] == key_id[:-1])
    continues = np.zeros(n, dtype=bool)
    continues[1:] = prev_ok[1:] & (dig[1:] == dig[:-1])
    starts = in_suffix & ~continues
    winners = pd.Series(np.where(starts, pos, -1)).groupby(key_id).max()
    out = df.iloc[winners[winners >= 0].to_numpy()]
    return out.drop(columns=["op", "_seq"]).reset_index(drop=True)


#: rows per pyarrow batch on the streamed fold path — peak task memory is
#: O(this × (1 + MOR depth)) decoded rows, independent of bucket size
STREAM_FOLD_BATCH_ROWS = 65536


class UnsortedGenerationError(RuntimeError):
    """A generation file violated the writer's key-sorted layout."""


class _SortedGenStream:
    """Sequential batched reader over ONE generation's bucket dir,
    exploiting the writer's layout guarantee (lake._write_generation:
    every bucket file is sorted by key_cols when no cluster_cols are
    declared; a task's file splits stay globally sorted in filename
    order). Keys are UNIQUE per generation (each generation is one
    LWW-deduped batch), so a buffered prefix reaching key K holds ALL of
    this generation's rows with key ≤ K.

    Monotonicity across batch/file boundaries is verified as batches
    arrive (two scalar tuple compares per batch); a violation raises
    ``UnsortedGenerationError`` rather than silently mis-folding."""

    def __init__(self, path: str, seq: int, key_cols: list[str],
                 columns: list[str], batch_rows: int) -> None:
        self.seq = seq
        self.key_cols = key_cols
        self.columns = columns  # payload + _digest (+ op when seq >= 0)
        self.batch_rows = batch_rows
        self.path = path
        self.buf = None  # pandas frame, key-sorted
        self.exhausted = False
        self._last_seen: tuple | None = None
        self._iter = self._batches(path)

    def _batches(self, path: str):
        import pyarrow.parquet as pq

        nullable = _nullable_dtypes()
        if os.path.isdir(path):
            for f in sorted(os.listdir(path)):
                if not f.endswith(".parquet"):
                    continue
                pf = pq.ParquetFile(os.path.join(path, f))
                have = [c for c in self.columns if c in pf.schema_arrow.names]
                for rb in pf.iter_batches(batch_size=self.batch_rows, columns=have):
                    import pyarrow as pa

                    yield pa.Table.from_batches([rb]).to_pandas(
                        types_mapper=nullable.get
                    )

    @staticmethod
    def _sorted_ok(frame, key_cols: list[str]) -> bool:
        """Every adjacent row pair non-decreasing on the key (vectorized
        shift-compare — loops over key COLUMNS, never rows)."""
        import numpy as np

        if len(frame) <= 1:
            return True
        n = len(frame) - 1
        lt = np.zeros(n, dtype=bool)
        eq = np.ones(n, dtype=bool)
        for col in key_cols:
            v = frame[col].to_numpy(dtype=object)
            lt |= eq & (v[:-1] < v[1:])
            eq &= v[:-1] == v[1:]
        return bool((lt | eq).all())

    def pull(self) -> None:
        """Append the next batch to the buffer (marks exhausted at EOF)."""
        import pandas as pd

        nxt = next(self._iter, None)
        if nxt is None:
            self.exhausted = True
            return
        nxt = _backfill(nxt, self.columns)
        if len(nxt):
            first = tuple(nxt.iloc[0][k] for k in self.key_cols)
            bad_seam = self._last_seen is not None and first < self._last_seen
            if bad_seam or not self._sorted_ok(nxt, self.key_cols):
                raise UnsortedGenerationError(
                    f"cdclake: generation at {self.path} is not key-sorted; "
                    "the table was written by a writer without the "
                    "key-sorted layout. Read with "
                    ".option('streamfold', 'false') to fall back to "
                    "whole-bucket materialization."
                )
            self._last_seen = tuple(nxt.iloc[-1][k] for k in self.key_cols)
        nxt["_seq"] = self.seq
        if "op" not in nxt.columns:  # base generation carries no op column
            nxt["op"] = None
        self.buf = nxt if self.buf is None else pd.concat(
            [self.buf, nxt], ignore_index=True
        )

    def buffered_max(self) -> tuple | None:
        if self.buf is None or not len(self.buf):
            return None
        return tuple(self.buf.iloc[-1][k] for k in self.key_cols)

    def split_le(self, boundary: tuple):
        """Vectorized lexicographic split: rows with key ≤ boundary leave
        the buffer and are returned (column-wise compares — loops over
        key COLUMNS, never rows)."""
        import numpy as np

        if self.buf is None or not len(self.buf):
            return None
        n = len(self.buf)
        le = np.zeros(n, dtype=bool)
        eq = np.ones(n, dtype=bool)
        for col, bval in zip(self.key_cols, boundary):
            v = self.buf[col].to_numpy(dtype=object)
            le |= eq & (v < bval)
            eq &= v == bval
        le |= eq
        if not le.any():
            return None
        out = self.buf[le]
        self.buf = self.buf[~le].reset_index(drop=True)
        return out


def _fold_bucket_streamed(spec: dict, key_cols: list[str], columns: list[str],
                          redigest_cols: list[str] | None = None,
                          batch_rows: int = STREAM_FOLD_BATCH_ROWS):
    """Bounded-memory version of ``_fold_bucket``: a boundary-chunked
    k-way merge over the bucket's (base + delta) generation streams.

    Each round picks boundary B = min over non-exhausted streams of their
    buffered max key. Every live stream's buffer is a prefix reaching
    ≥ B and keys are unique per stream, so rows with key ≤ B are COMPLETE
    version sets across all generations — they split off, fold through
    the same vectorized core as the materialized path (`_fold_frame`,
    bit-exact by construction), and yield as one chunk. Peak memory is
    O(batch_rows × generations), independent of bucket size — the 100 TB
    fix for the whole-bucket ``pd.concat`` this module previously
    required (and still uses, behind ``_guard_bucket_bytes``, for tables
    whose cluster_cols order files by non-key columns)."""
    import pandas as pd

    streams: list[_SortedGenStream] = []
    if spec.get("base"):
        streams.append(
            _SortedGenStream(spec["base"], -1, key_cols,
                             columns + ["_digest"], batch_rows)
        )
    for d in spec.get("deltas", []):
        streams.append(
            _SortedGenStream(d["dir"], int(d["seq"]), key_cols,
                             columns + ["_digest", "op"], batch_rows)
        )
    all_cols = columns + ["_digest", "op", "_seq"]
    while True:
        for s in streams:
            while not s.exhausted and s.buffered_max() is None:
                s.pull()
        live = [s for s in streams if not s.exhausted]
        if not live:
            tails = [s.buf for s in streams if s.buf is not None and len(s.buf)]
            if tails:
                chunk = pd.concat(tails, ignore_index=True)[all_cols]
                out = _fold_frame(chunk, key_cols, redigest_cols)
                if len(out):
                    yield out
            return
        boundary = min(s.buffered_max() for s in live)
        parts = [p for p in (s.split_le(boundary) for s in streams) if p is not None]
        chunk = pd.concat(parts, ignore_index=True)[all_cols]
        out = _fold_frame(chunk, key_cols, redigest_cols)
        if len(out):
            yield out


def _diff_bucket(old_spec: dict, new_spec: dict, key_cols: list[str],
                 columns: list[str], redigest_cols: list[str] | None = None,
                 include_pre: bool = False):
    """Feed rows for one bucket between two versions: outer-merge the two
    folded states on the key, classify by persisted digest (recomputed
    over ``redigest_cols`` when the versions' stored digests are not
    provably over one column set — same rule as lake.read_changes)."""
    import pandas as pd

    old = _fold_bucket(old_spec, key_cols, columns, redigest_cols)
    new = _fold_bucket(new_spec, key_cols, columns, redigest_cols)
    payload = [c for c in columns if c not in key_cols]
    old = old.rename(columns={c: f"_o_{c}" for c in [*payload, "_digest"]})
    new = new.rename(columns={"_digest": "_n_digest"})
    j = new.merge(old, on=key_cols, how="outer", indicator=True)
    import numpy as np

    m = j["_merge"].to_numpy(dtype=object)
    changed = j["_n_digest"].to_numpy(dtype=object) != j["_o__digest"].to_numpy(
        dtype=object
    )
    j["op"] = pd.Series(
        np.select(
            [m == "left_only", m == "right_only", changed],
            ["ADD", OP_DELETE, "UPDATE"],
            default=None,
        ),
        index=j.index,
        dtype="object",
    )
    j = j[j["op"].notna()]
    for c in payload:  # DELETE rows carry NULL payload (event shape)
        j.loc[j["op"] == OP_DELETE, c] = None
    if include_pre:
        for c in payload:
            j[f"pre_{c}"] = j[f"_o_{c}"]
            j.loc[j["op"] == "ADD", f"pre_{c}"] = None
        return j[[*key_cols, *payload, "op", *[f"pre_{c}" for c in payload]]]
    return j[[*key_cols, *payload, "op"]]


def _arrow_schema(spark_schema: T.StructType):
    """Explicit Arrow schema: an all-NULL column must still carry its
    declared type (from_pylist would infer pa.null and break the source
    contract)."""
    import pyarrow as pa

    mapping = {
        T.StringType(): pa.string(),
        T.LongType(): pa.int64(),
        T.IntegerType(): pa.int32(),
        T.DoubleType(): pa.float64(),
        T.FloatType(): pa.float32(),
        T.BooleanType(): pa.bool_(),
        T.BinaryType(): pa.binary(),
    }
    fields = []
    for f in spark_schema.fields:
        if f.dataType not in mapping:
            raise TypeError(
                f"cdclake: unsupported column type {f.dataType} for {f.name}"
            )
        fields.append(pa.field(f.name, mapping[f.dataType]))
    return pa.schema(fields)


def _to_record_batch(df, schema: T.StructType):
    import pyarrow as pa

    names = [f.name for f in schema.fields]
    clean = df[names].astype("object")
    clean = clean.where(clean.notna(), None)
    arrow = _arrow_schema(schema)
    arrays = [
        pa.array(list(clean[n]), type=arrow.field(n).type) for n in names
    ]
    return pa.RecordBatch.from_arrays(arrays, schema=arrow)


# ---------------------------------------------------------------------------
# planning helpers (driver-side manifest JSON)
# ---------------------------------------------------------------------------


def _read_json(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def _manifest(table_path: str, seq: int | None = None) -> dict:
    if seq is None:
        return _read_json(os.path.join(table_path, "_table.json"))
    p = os.path.join(table_path, "_history", f"manifest-{seq}.json")
    if not os.path.exists(p):
        raise ValueError(f"no frozen manifest for commit {seq} at {table_path}")
    return _read_json(p)


def _bucket_spec(meta: dict, table_path: str, bucket: str) -> dict:
    data = os.path.join(table_path, "data")
    base_gen = meta.get("buckets", {}).get(bucket)
    return {
        "base": os.path.join(data, base_gen, f"_bucket={bucket}") if base_gen else None,
        "deltas": [
            {"dir": os.path.join(data, e["gen"], f"_bucket={bucket}"), "seq": e["seq"]}
            for e in meta.get("deltas", {}).get(bucket, [])
        ],
    }


def _entry(meta: dict, bucket: str):
    return (
        meta.get("buckets", {}).get(bucket),
        tuple((e["gen"], int(e["seq"])) for e in meta.get("deltas", {}).get(bucket, [])),
    )


class _BucketPartition(InputPartition):
    def __init__(self, payload: dict) -> None:
        super().__init__(payload)


# ---------------------------------------------------------------------------
# the data source
# ---------------------------------------------------------------------------


class LakeChangeFeedDataSource(DataSource):
    """``format("cdclake")`` — batch: current merged snapshot (+``op``
    NULL, ``_version`` = head); stream: the change data feed (``op`` set,
    ``_version`` = the micro-batch's end commit seq)."""

    @classmethod
    def name(cls) -> str:
        return "cdclake"

    def _table_path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("cdclake requires .option('path', <table dir>)")
        return p

    def _frozen_meta(self) -> dict:
        """The manifest read ONCE per scan and shared by ``schema()`` and
        ``reader()`` — a commit (e.g. evolve) landing between two
        independent reads would give the reader a column list that
        disagrees with the declared schema."""
        if not hasattr(self, "_meta_cache"):
            self._meta_cache = _manifest(self._table_path())
        return self._meta_cache

    def schema(self) -> T.StructType:
        meta = self._frozen_meta()
        payload = T.StructType.fromJson(meta["schema"])
        key_cols = set(meta.get("key_cols", ["repo", "path"]))
        fields = (
            # EVERY field nullable regardless of the table schema: DELETE
            # feed rows carry NULL payload by contract, and a non-null
            # table field would make the unsafe projection NPE on them
            [T.StructField(f.name, f.dataType, True) for f in payload.fields]
            + [
                T.StructField("op", T.StringType(), True),
                T.StructField("_version", T.LongType(), True),
            ]
        )
        if self.options.get("includepre", "false").lower() == "true":
            # Delta-CDF-style pre-images: what incremental aggregate
            # maintenance consumes (NULL on ADD rows, and on every
            # batch-snapshot row)
            fields += [
                T.StructField(f"pre_{f.name}", f.dataType, True)
                for f in payload.fields
                if f.name not in key_cols
            ]
        return T.StructType(fields)

    def _max_bucket_bytes(self) -> int:
        return int(
            self.options.get("maxbucketbytes", str(DEFAULT_MAX_BUCKET_BYTES))
        )

    def reader(self, schema: T.StructType) -> "LakeSnapshotReader":
        return LakeSnapshotReader(
            self._table_path(),
            schema,
            self._frozen_meta(),
            max_bucket_bytes=self._max_bucket_bytes(),
            stream_fold=self.options.get("streamfold", "true").lower() != "false",
            fold_batch_rows=int(
                self.options.get("foldbatchrows", str(STREAM_FOLD_BATCH_ROWS))
            ),
        )

    def streamReader(self, schema: T.StructType) -> "LakeFeedStreamReader":
        return LakeFeedStreamReader(
            self._table_path(),
            schema,
            start_seq=int(self.options.get("startseq", "1")),
            max_versions_per_batch=int(self.options.get("maxversionsperbatch", "0")),
            include_pre=self.options.get("includepre", "false").lower() == "true",
            max_bucket_bytes=self._max_bucket_bytes(),
        )


class LakeSnapshotReader(DataSourceReader):
    def __init__(
        self,
        path: str,
        schema: T.StructType,
        meta: dict | None = None,
        max_bucket_bytes: int = DEFAULT_MAX_BUCKET_BYTES,
        stream_fold: bool = True,
        fold_batch_rows: int = STREAM_FOLD_BATCH_ROWS,
    ) -> None:
        self.path = path
        self.out_schema = schema
        self.max_bucket_bytes = max_bucket_bytes
        if meta is None:  # standalone use; DataSource passes its frozen copy
            meta = _manifest(path)
        # bounded-memory chunked fold: requires the writer's key-sorted
        # file layout, which cluster_cols replace with their own order —
        # clustered tables fall back to whole-bucket materialization
        # behind the byte guard
        self.stream_fold = stream_fold and not meta.get("cluster_cols")
        self.fold_batch_rows = fold_batch_rows
        self.key_cols = list(meta.get("key_cols", ["repo", "path"]))
        self.columns = [f.name for f in T.StructType.fromJson(meta["schema"]).fields]
        self.head = int(meta.get("commit_seq", 0))
        # stored digests are mixed-column-set while digest_cols lags the
        # compare set (post-evolve, pre-redigest) — recompute in the fold
        # so no-op suppression matches the JVM read exactly
        compare = meta.get("compare_cols", [])
        self.redigest = compare if meta.get("digest_cols", compare) != compare else None
        self._meta = meta  # frozen manifest — pushFilters prunes against it
        self._path = path  # sidecar-mode bounds live beside it (_stats/)
        self._buckets = sorted(
            set(meta.get("buckets", {})) | set(meta.get("deltas", {})), key=int
        )
        self.specs = [_bucket_spec(meta, path, b) for b in self._buckets]

    def pushFilters(self, filters):
        """Manifest-bounds partition pruning (PySpark 4.1 filter pushdown):
        translate the supported conjuncts to the predicate DSL and drop
        every bucket whose column bounds PROVE no row can match
        (lake._bounds_exclude_bucket — pure metadata, no Spark, exactly
        what this planning worker has). ALL filters are returned as
        residual: pruning here is conservative (bucket granularity), so
        Spark must still re-apply the full predicate to the folded rows —
        the same never-load-bearing contract as ``read_where``.

        Hash pruning on the bucket columns is deliberately absent on this
        path: it needs the engine's own ``_bucket_expr`` (a Spark job over
        the candidate tuples), and no SparkSession exists in a data-source
        planning worker — re-implementing xxhash64 in Python would fork
        the hash definition. Use ``HashBucketParquetTable.read_where`` /
        ``lookup`` when bucket-column pruning matters."""
        from bcdc2bcdc_spark.sources.lake import (
            _bounds_exclude_bucket,
            _stats_lookup,
            _usable_bounds_preds,
        )

        preds = []
        for flt in filters:
            op = _FILTER_OPS.get(type(flt))
            attr = getattr(flt, "attribute", ())
            if op is None or len(attr) != 1 or attr[0] not in self.columns:
                continue
            val = list(flt.value) if op == "in" else flt.value
            if val is None:
                continue
            preds.append((attr[0], op, val))
        usable = _usable_bounds_preds(self._meta, preds)
        if usable:
            # sidecar-mode bounds are plain JSON files beside the table —
            # readable from this planning worker with the same reader the
            # frozen manifest came through; one lazy load per live
            # generation, cached across buckets by the lookup
            stats_get = _stats_lookup(self._meta, self._path, _read_json)
            keep = [
                (b, s)
                for b, s in zip(self._buckets, self.specs)
                if not _bounds_exclude_bucket(self._meta, int(b), usable, stats_get)
            ]
            self._buckets = [b for b, _ in keep]
            self.specs = [s for _, s in keep]
        return filters

    def partitions(self):
        return [_BucketPartition(s) for s in self.specs] or [_BucketPartition({})]

    def read(self, partition: _BucketPartition) -> Iterator:
        spec = partition.value
        if not spec:
            return
        if self.stream_fold:
            # bounded memory: one Arrow batch per folded key-range chunk;
            # the byte ceiling is irrelevant here (peak is O(batch × gens))
            for df in _fold_bucket_streamed(
                spec, self.key_cols, self.columns, self.redigest,
                batch_rows=self.fold_batch_rows,
            ):
                yield self._finish(df)
            return
        _guard_bucket_bytes([spec], self.max_bucket_bytes)
        df = _fold_bucket(spec, self.key_cols, self.columns, self.redigest)
        if not df.empty:
            yield self._finish(df)

    def _finish(self, df):
        df["op"] = None
        df["_version"] = self.head
        for f in self.out_schema.fields:  # includepre → all-NULL pre_*
            if f.name.startswith("pre_") and f.name not in df.columns:
                df[f.name] = None
        return _to_record_batch(df, self.out_schema)


class LakeFeedStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        path: str,
        schema: T.StructType,
        start_seq: int,
        max_versions_per_batch: int = 0,
        include_pre: bool = False,
        max_bucket_bytes: int = DEFAULT_MAX_BUCKET_BYTES,
    ) -> None:
        self.path = path
        self.out_schema = schema
        self.start_seq = start_seq
        self.include_pre = include_pre
        self.max_bucket_bytes = max_bucket_bytes
        #: rate limit (maxOffsetsPerTrigger analog): cap how many source
        #: commits one micro-batch may span. 0 = unbounded (each batch
        #: coalesces everything outstanding — cheapest, but nets out
        #: intermediate states); 1 = per-commit replay (exact audit
        #: trail, one batch per source version). The FIRST batch of a
        #: (re)started stream is always unbounded: the reader cannot see
        #: Spark's checkpointed progress until a batch is planned, so a
        #: start-seq-anchored clamp would hand a restarted stream an
        #: offset BEHIND its checkpoint and stall it (restart-regression
        #: bug, fixed). Limiting kicks in from the second batch on.
        self.max_versions_per_batch = max_versions_per_batch
        self._cursor: int | None = None
        meta = _manifest(path)
        self.key_cols = list(meta.get("key_cols", ["repo", "path"]))

    def initialOffset(self) -> dict:
        return {"seq": self.start_seq}

    def latestOffset(self) -> dict:
        head = int(_manifest(self.path).get("commit_seq", 0))
        if self.max_versions_per_batch > 0 and self._cursor is not None:
            head = min(head, self._cursor + self.max_versions_per_batch)
        return {"seq": head}

    def partitions(self, start: dict, end: dict):
        a, b = int(start["seq"]), int(end["seq"])
        # advance the rate-limit cursor at PLANNING time — commit() may
        # lag the next latestOffset() poll. This is also where a
        # restarted stream reveals its checkpointed progress (`end` of
        # the replayed batch), seeding the cursor correctly.
        self._cursor = b if self._cursor is None else max(self._cursor, b)
        if b <= a:
            return [_BucketPartition({})]
        m_a, m_b = _manifest(self.path, a), _manifest(self.path, b)
        if int(m_a.get("n_buckets", 0)) != int(m_b.get("n_buckets", 0)):
            raise ValueError(
                f"bucket scheme changed inside stream interval {a}→{b} "
                "(rebucket); restart the stream from a post-rebucket offset "
                "or use the batch read_changes path"
            )
        columns = [f["name"] for f in m_b["schema"]["fields"]]
        # stored digests are comparable only when both versions' digests
        # provably cover ONE column set (same rule as lake.read_changes);
        # otherwise every partition recomputes over the newer compare set
        cmp_a = m_a.get("compare_cols", [])
        cmp_b = m_b.get("compare_cols", [])
        coherent = (
            cmp_a == cmp_b
            and m_a.get("digest_cols", cmp_a) == cmp_a
            and m_b.get("digest_cols", cmp_b) == cmp_b
        )
        redigest = None if coherent else cmp_b
        out = []
        all_b = set(m_a.get("buckets", {})) | set(m_b.get("buckets", {}))
        all_b |= set(m_a.get("deltas", {})) | set(m_b.get("deltas", {}))
        for bucket in sorted(all_b, key=int):
            if _entry(m_a, bucket) == _entry(m_b, bucket):
                continue  # immutable generations: identical entry ⇒ no change
            out.append(
                _BucketPartition(
                    {
                        "old": _bucket_spec(m_a, self.path, bucket),
                        "new": _bucket_spec(m_b, self.path, bucket),
                        "columns": columns,
                        "version": b,
                        "redigest": redigest,
                    }
                )
            )
        return out or [_BucketPartition({})]

    def read(self, partition: _BucketPartition) -> Iterator:
        spec = partition.value
        if not spec:
            return
        _guard_bucket_bytes([spec["old"], spec["new"]], self.max_bucket_bytes)
        df = _diff_bucket(
            spec["old"],
            spec["new"],
            self.key_cols,
            spec["columns"],
            spec.get("redigest"),
            include_pre=self.include_pre,
        )
        if df.empty:
            return
        df["_version"] = spec["version"]
        yield _to_record_batch(df, self.out_schema)

    def commit(self, end: dict) -> None:
        # advance the rate-limit cursor; storage retention itself is the
        # lake's own commit-count contract
        e = int(end["seq"])
        self._cursor = e if self._cursor is None else max(self._cursor, e)


def register_lake_source(spark: SparkSession) -> None:
    """Register the ``cdclake`` source.

    SESSION-GLOBAL SIDE EFFECT, documented: when the session has no
    explicit setting for ``spark.sql.python.filterPushdown.enabled``,
    this turns it on — a reader that implements ``pushFilters`` is
    REJECTED outright while the (default-false) conf is off, so cdclake
    reads need it, and enabling it also makes every OTHER registered
    Python data source's ``pushFilters`` start being invoked. A value the
    user set explicitly (either way) is respected and never overridden;
    note that with an explicit ``false`` cdclake reads will fail with
    Spark's pushdown-disabled error until it is re-enabled."""
    if spark.conf.get("spark.sql.python.filterPushdown.enabled", None) is None:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakeChangeFeedDataSource)


def stream_changes(
    spark: SparkSession,
    table_path: str,
    start_seq: int = 1,
    max_versions_per_batch: int = 0,
    include_pre: bool = False,
    max_bucket_bytes: int = DEFAULT_MAX_BUCKET_BYTES,
):
    """The change feed as an unbounded DataFrame (micro-batch per new
    committed version interval). ``max_versions_per_batch=1`` replays one
    source commit per micro-batch in steady state (exact audit trail);
    0 coalesces all outstanding commits into each batch (cheapest
    catch-up). The first batch of a (re)started stream is always
    coalesced — see LakeFeedStreamReader on why a start-anchored clamp
    would stall restarts."""
    register_lake_source(spark)
    return (
        spark.readStream.format("cdclake")
        .option("path", table_path)
        .option("startseq", str(start_seq))
        .option("maxversionsperbatch", str(max_versions_per_batch))
        .option("includepre", str(include_pre).lower())
        .option("maxbucketbytes", str(max_bucket_bytes))
        .load()
    )


def read_snapshot(
    spark: SparkSession,
    table_path: str,
    max_bucket_bytes: int = DEFAULT_MAX_BUCKET_BYTES,
    stream_fold: bool = True,
):
    """The current merged table state via the Python source (one
    partition per bucket, MOR deltas folded executor-side). On key-sorted
    tables (no cluster_cols) the fold streams in bounded-memory key-range
    chunks (``_fold_bucket_streamed``); clustered tables — or
    ``stream_fold=False`` — materialize the whole bucket behind the
    ``max_bucket_bytes`` guard (``_guard_bucket_bytes``) instead of
    OOMing the worker."""
    register_lake_source(spark)
    return (
        spark.read.format("cdclake")
        .option("path", table_path)
        .option("maxbucketbytes", str(max_bucket_bytes))
        .option("streamfold", "true" if stream_fold else "false")
        .load()
    )
