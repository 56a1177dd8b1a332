"""Ingest sources: JSONL quarantine semantics and paged fetch incl. the
reference's broken-paging detection."""

import json
import os

import pytest
from pyspark.sql import types as T

from bcdc2bcdc_spark.sources.ingest import (
    BrokenPagingError,
    fetch_paged,
    read_events_jsonl,
)


def test_jsonl_good_and_quarantine(spark, tmp_path):
    good_row = {
        "repo": "r1", "path": "p1", "commit": "c1", "lang": "py",
        "content": "x", "op": "ADD", "event_seq": 1,
    }
    lines = [
        json.dumps(good_row),
        '{"repo": "r2", "path": broken json!!',
        json.dumps({**good_row, "repo": "r3", "event_seq": 2}),
        "not json at all",
    ]
    p = str(tmp_path / "ev.jsonl")
    with open(p, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    good, quarantined = read_events_jsonl(spark, p)
    assert {r["repo"] for r in good.collect()} == {"r1", "r3"}
    bad = [r["raw"] for r in quarantined.collect()]
    assert len(bad) == 2
    assert any("broken json" in b for b in bad)
    assert any(b == "not json at all" for b in bad)


def test_fetch_paged_until_short_page(spark):
    universe = [{"name": f"n{i}"} for i in range(23)]

    calls = []

    def pager(offset, limit):
        calls.append(offset)
        return universe[offset : offset + limit]

    schema = T.StructType([T.StructField("name", T.StringType())])
    df = fetch_paged(spark, pager, schema, page_size=10)
    assert df.count() == 23
    assert calls == [0, 10, 20]  # stops at the short page
    assert {r["name"] for r in df.collect()} == {f"n{i}" for i in range(23)}


def test_fetch_paged_detects_broken_paging(spark):
    page = [{"name": f"n{i}"} for i in range(10)]

    def broken(offset, limit):
        return page  # ignores offset — the reference's failure mode

    schema = T.StructType([T.StructField("name", T.StringType())])
    with pytest.raises(BrokenPagingError, match="identical"):
        fetch_paged(spark, broken, schema, page_size=10)


def test_fetch_paged_empty(spark):
    schema = T.StructType([T.StructField("name", T.StringType())])
    df = fetch_paged(spark, lambda o, l: [], schema, page_size=10)
    assert df.count() == 0 and df.schema == schema


def test_jsonl_edge_shapes_quarantined_not_dropped(spark, tmp_path):
    """Blank lines, scalar JSON, and array JSON must appear in exactly
    one frame (quarantine) — never silently vanish from both."""
    good_row = {
        "repo": "r1", "path": "p1", "commit": "c1", "lang": "py",
        "content": "x", "op": "ADD", "event_seq": 1,
    }
    lines = [json.dumps(good_row), "", "   ", "123", '[1, 2]', json.dumps(good_row)]
    p = str(tmp_path / "edge.jsonl")
    with open(p, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    good, quarantined = read_events_jsonl(spark, p)
    n_good, n_bad = good.count(), quarantined.count()
    assert n_good == 2
    # every non-good input line is accounted for in quarantine
    assert n_good + n_bad == len(lines)


def test_fetch_paged_parallel_matches_sequential(spark):
    universe = [{"name": f"n{i}", "rank": i} for i in range(55)]

    def pager(offset, limit):
        return universe[offset : offset + limit]

    schema = T.StructType(
        [T.StructField("name", T.StringType()), T.StructField("rank", T.LongType())]
    )
    from bcdc2bcdc_spark.sources.ingest import fetch_paged_parallel

    # n_pages overshoots (pages past the end return []) — executor path
    par = fetch_paged_parallel(spark, pager, schema, n_pages=8, page_size=10, parallelism=4)
    seq = fetch_paged(spark, pager, schema, page_size=10)
    assert sorted(map(tuple, par.collect())) == sorted(map(tuple, seq.collect()))
    assert par.count() == 55


def test_fetch_paged_parallel_detects_broken_paging(spark):
    page = [{"name": f"n{i}", "rank": i} for i in range(10)]

    def broken(offset, limit):
        return page  # ignores offset

    schema = T.StructType(
        [T.StructField("name", T.StringType()), T.StructField("rank", T.LongType())]
    )
    from bcdc2bcdc_spark.sources.ingest import fetch_paged_parallel

    with pytest.raises(BrokenPagingError, match="identical to page 0"):
        fetch_paged_parallel(spark, broken, schema, n_pages=5, page_size=10)
