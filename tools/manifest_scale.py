"""Manifest scaling curve (VERDICT r4 task 5).

`HashBucketParquetTable` keeps ONE JSON manifest per table carrying the
bucket→generation map, outstanding MOR delta lists, and per-(generation,
bucket) column-stats bounds. Every commit parses and atomically rewrites
it on the driver, so its size curve IS the driver-side commit floor's
growth law: O(live generations × touched buckets × stats_cols).

This tool measures that curve directly — the manifest is a pure data
structure, so the sweep synthesizes metas at the exact shapes the verdict
asked about (up to 4096 buckets × 8 live MOR generations × 4 stats
columns) and times the three driver-side operations a commit performs:

  * json.dumps (serialize the staged meta)
  * atomic rewrite (tmp file + fsync + rename — what fs.write_json_atomic does)
  * json.loads (the NEXT commit's read)

Usage: python tools/manifest_scale.py   # prints a markdown table
"""

from __future__ import annotations

import json
import os
import tempfile
import time


def synth_meta(n_buckets: int, mor_depth: int, n_stats_cols: int) -> dict:
    """A manifest at the given shape: every bucket holds a base generation
    plus ``mor_depth`` outstanding deltas; every (generation, bucket)
    carries min/max/nonnull bounds for ``n_stats_cols`` columns — the
    worst realistic case (every delta touched every bucket)."""
    scols = [f"col{i}" for i in range(n_stats_cols)]
    meta = {
        "key_cols": ["repo", "path"],
        "n_buckets": n_buckets,
        "bucket_cols": ["repo", "path"],
        "compare_cols": ["lang", "content"],
        "digest_cols": ["lang", "content"],
        "schema": {"type": "struct", "fields": []},
        "write_mode": "mor",
        "stats_cols": scols,
        "cluster_cols": [],
        "commit_seq": mor_depth + 1,
        "buckets": {},
        "deltas": {},
        "retired": {},
    }
    stats: dict = {}
    for b in range(n_buckets):
        base_gen = f"gen-{b:08x}base"
        meta["buckets"][str(b)] = base_gen
        meta["deltas"][str(b)] = [
            {"gen": f"gen-{d:08x}delta", "seq": d + 2} for d in range(mor_depth)
        ]
        for g in [base_gen] + [f"gen-{d:08x}delta" for d in range(mor_depth)]:
            if scols:
                stats.setdefault(g, {})[str(b)] = {
                    c: {
                        "min": f"aaaa{b:06d}",
                        "max": f"zzzz{b:06d}",
                        "nonnull": 123456,
                    }
                    for c in scols
                }
    if stats:
        meta["stats"] = stats
    return meta


def measure(meta: dict, tmpdir: str) -> dict:
    t0 = time.perf_counter()
    blob = json.dumps(meta)
    dump_ms = (time.perf_counter() - t0) * 1000

    path = os.path.join(tmpdir, "_table.json")
    t0 = time.perf_counter()
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(blob)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)
    write_ms = (time.perf_counter() - t0) * 1000

    t0 = time.perf_counter()
    with open(path) as fh:
        json.loads(fh.read())
    load_ms = (time.perf_counter() - t0) * 1000

    return {
        "bytes": len(blob),
        "dump_ms": round(dump_ms, 1),
        "write_ms": round(write_ms, 1),
        "load_ms": round(load_ms, 1),
        "commit_overhead_ms": round(dump_ms + write_ms + load_ms, 1),
    }


def main() -> None:
    shapes = [
        # (n_buckets, mor_depth, stats_cols)
        (16, 0, 0),       # test scale, CoW, no stats
        (64, 2, 1),       # bench scale
        (512, 8, 4),
        (4096, 0, 0),     # 100TB-ish bucket count, CoW, no stats
        (4096, 8, 0),     # deep MOR, no stats
        (4096, 0, 4),     # stats only
        (4096, 8, 4),     # the verdict's worst case
        (8192, 8, 4),
    ]
    rows = []
    with tempfile.TemporaryDirectory() as td:
        for nb, depth, sc in shapes:
            m = measure(synth_meta(nb, depth, sc), td)
            rows.append((nb, depth, sc, m))
            print(
                f"| {nb} | {depth} | {sc} | {m['bytes']:,} | {m['dump_ms']} "
                f"| {m['write_ms']} | {m['load_ms']} | {m['commit_overhead_ms']} |"
            )
    print()
    print(json.dumps([
        {"n_buckets": nb, "mor_depth": d, "stats_cols": sc, **m}
        for nb, d, sc, m in rows
    ]))


if __name__ == "__main__":
    print("| buckets | MOR depth | stats cols | manifest bytes | dumps ms | atomic write ms | loads ms | per-commit total ms |")
    print("|---|---|---|---|---|---|---|---|")
    main()
