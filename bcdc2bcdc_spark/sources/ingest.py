"""Ingest-side sources: JSONL event files and paged REST-style fetch.

The reference consumes entity snapshots as JSON over a paged REST API
(``CKAN.py:208-257`` ``getPackageNames`` — 500/page until a short page,
with a broken-paging fallback that detects the SAME page repeating,
``CKAN.py:102-124``). The engine's equivalents:

* ``read_events_jsonl`` — schema-enforced JSONL scan with malformed-line
  QUARANTINE (text scan + from_json carrying a corrupt-record column):
  bad producer output lands in a reviewable frame instead of failing the
  job or silently nulling; fully distributed, nothing cached.
* ``fetch_paged`` — the driver-side paged-API shape: pull pages through
  a user callable until a short/empty page, detecting broken paging
  (identical page repeated) exactly like the reference, then
  parallelize the accumulated rows. At 100 TB you do NOT page a REST
  API — but catalog/control-plane fetches (the reference's entire
  problem) are bounded metadata, and the docstring documents the
  executor-parallel variant for when the endpoint supports offset
  ranges (spark.range(n_pages) + mapInPandas fetch per partition).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from bcdc2bcdc_spark.schema import EVENTS_SCHEMA

#: column that captures the raw text of unparseable lines
CORRUPT_COL = "_corrupt_record"


def read_events_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENTS_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) frames from JSONL event files.

    A line that fails to parse appears ONLY in the quarantine frame (raw
    text preserved for review); good rows carry exactly ``schema``.
    Mirrors the pipeline's quarantine-malformed stage at the ingest
    boundary.

    Implementation: lines read as text, parsed with ``from_json`` whose
    schema carries the corrupt-record column (non-NULL ⟺ the line failed
    to parse; a bare NULL-struct test cannot work — PERMISSIVE from_json
    yields an all-NULL struct for malformed input). Both frames are
    ordinary lazy plans over the file, so nothing is cached: the JSON
    *datasource*'s corrupt-record filter requires caching the parsed
    batch (pinning the whole input in executor storage), but from_json
    over a text scan has no such restriction."""
    parse_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    parsed = spark.read.text(path).select(
        F.col("value"),
        F.from_json(
            "value",
            parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("rec"),
    )
    # a blank/whitespace line parses to a NULL rec struct (no corrupt
    # field populated) — it must land in quarantine, not vanish: a bare
    # corrupt-field test is NULL there and both filters would drop it
    bad = F.col("rec").isNull() | F.col("rec").getField(CORRUPT_COL).isNotNull()
    good = parsed.filter(~bad).select(
        *[F.col("rec").getField(f.name).alias(f.name) for f in schema.fields]
    )
    quarantined = parsed.filter(bad).select(F.col("value").alias("raw"))
    return good, quarantined


class BrokenPagingError(RuntimeError):
    """The endpoint returned the identical page twice (ignored offset)."""


def fetch_paged(
    spark: SparkSession,
    fetch_page: Callable[[int, int], Sequence[dict]],
    schema: T.StructType,
    page_size: int = 500,
    max_pages: int = 10_000,
) -> DataFrame:
    """Pull ``fetch_page(offset, limit)`` until a short or empty page and
    parallelize the rows (reference S1). Detects broken paging — the
    endpoint returning the IDENTICAL page for a new offset — and raises
    instead of looping or silently duplicating (the reference falls back
    to its alternate pager on this signal; callers here can catch
    ``BrokenPagingError`` and do the same)."""
    rows: list[dict] = []
    prev_page: Sequence[dict] | None = None
    for page_no in range(max_pages):
        page = list(fetch_page(page_no * page_size, page_size))
        if prev_page is not None and page and page == prev_page:
            raise BrokenPagingError(
                f"page at offset {page_no * page_size} identical to the "
                "previous page — endpoint ignores the offset parameter"
            )
        rows.extend(page)
        if len(page) < page_size:
            break
        prev_page = page
    else:
        raise RuntimeError(f"pagination did not terminate within {max_pages} pages")
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(rows, schema)


def fetch_paged_parallel(
    spark: SparkSession,
    fetch_page: Callable[[int, int], Sequence[dict]],
    schema: T.StructType,
    n_pages: int,
    page_size: int = 500,
    parallelism: int | None = None,
) -> DataFrame:
    """EXECUTOR-parallel paged fetch — the scale path for endpoints that
    honor offset ranges: page numbers are distributed over tasks
    (``spark.range`` + Arrow ``mapInPandas``), each task pulls its pages
    with the user callable and emits rows directly into the plan. No
    driver accumulation; throughput scales with parallelism until the
    endpoint saturates. ``fetch_page`` must be serializable and safe to
    call concurrently; a page past the end should return []. Use
    ``fetch_paged`` when the total count is unknown (sequential
    short-page detection) — e.g. probe the count first, then fan out.

    Broken paging (the endpoint ignoring the offset) would here yield
    n_pages silent copies of page 0 — so the same check the sequential
    path applies per page runs ONCE up front: two driver-side probe
    calls comparing page 0 against page 1."""
    import pandas as pd

    if n_pages > 1:
        p0 = list(fetch_page(0, page_size))
        if len(p0) == page_size and p0 == list(fetch_page(page_size, page_size)):
            raise BrokenPagingError(
                "page at offset {0} identical to page 0 — endpoint ignores "
                "the offset parameter".format(page_size)
            )

    cols = [f.name for f in schema.fields]
    pages = spark.range(int(n_pages))
    if parallelism:
        pages = pages.repartition(int(parallelism))

    def fn(batches):
        for pdf in batches:
            rows: list[dict] = []
            for pno in pdf["id"]:
                rows.extend(fetch_page(int(pno) * page_size, page_size))
            yield pd.DataFrame(rows, columns=cols)

    return pages.mapInPandas(fn, schema=schema)
