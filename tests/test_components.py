"""Connected-components dedup clustering: fixpoint correctness vs a
driver-side union-find oracle, chain (multi-hop) convergence, singleton
handling, empty input, and deterministic representative selection."""

import random

import pytest
from pyspark.sql import functions as F

from bcdc2bcdc_spark.operators.components import (
    connected_components,
    dedup_keep_representative,
)


def _uf_oracle(pairs, vertices):
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member id ( = root under min-union)
    return {v: find(v) for v in vertices}


def _cc(spark, pairs, vertices=None, **kw):
    pdf = spark.createDataFrame(pairs or [(0, 0)], "a long, b long")
    if not pairs:
        pdf = pdf.limit(0)
    vdf = (
        spark.createDataFrame([(v,) for v in vertices], "doc_id long")
        if vertices is not None
        else None
    )
    out = connected_components(pdf, vertices=vdf, **kw)
    return {r["id"]: r["cluster_id"] for r in out.collect()}


def test_chain_needs_multihop(spark):
    # path graph 0-1-2-...-9: every vertex must reach label 0 (diameter 9
    # forces >1 round; compression keeps rounds logarithmic)
    pairs = [(i, i + 1) for i in range(9)]
    got = _cc(spark, pairs)
    assert got == {i: 0 for i in range(10)}


def test_two_components_and_singletons(spark):
    pairs = [(1, 2), (2, 3), (10, 11)]
    got = _cc(spark, pairs, vertices=[1, 2, 3, 10, 11, 99])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_empty_pairs_all_singletons(spark):
    got = _cc(spark, [], vertices=[5, 7])
    assert got == {5: 5, 7: 7}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    vertices = list(range(60))
    pairs = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(45)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    got = _cc(spark, pairs, vertices=vertices)
    assert got == _uf_oracle(pairs, vertices)


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, [(i, i + 1) for i in range(40)], max_iter=1)


def test_keep_representative_longest_then_min_id(spark):
    docs = spark.createDataFrame(
        [
            (1, "aaaa"),
            (2, "bbbbbb"),   # longest in cluster 1 → kept
            (3, "cc"),
            (10, "dddd"),
            (11, "dddd"),    # tie on length → min id 10 kept
            (99, "solo"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "a long, b long")
    clusters = connected_components(
        pairs, vertices=docs.select("doc_id"), id_col="doc_id"
    )
    kept = dedup_keep_representative(docs, clusters)
    rows = {r["cluster_id"]: (r["doc_id"], r["cluster_size"]) for r in kept.collect()}
    assert rows == {1: (2, 3), 10: (10, 2), 99: (99, 1)}
    # exactly one kept row per cluster, and the dropped mass is the rest
    assert kept.count() == 3
    assert kept.agg(F.sum("cluster_size")).first()[0] == docs.count()


def test_keep_representative_without_vertex_universe(spark):
    """Clusters computed WITHOUT the full vertex universe: docs absent
    from the cluster frame are their own singleton clusters — not
    silently dropped (left join + coalesce)."""
    docs = spark.createDataFrame(
        [(1, "aa"), (2, "bbb"), (9, "solo")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    clusters = connected_components(pairs)  # no vertices: only 1 and 2
    kept = dedup_keep_representative(docs, clusters)
    rows = {r["cluster_id"]: r["doc_id"] for r in kept.collect()}
    assert rows == {1: 2, 9: 9}  # doc 9 kept as its own cluster


def test_components_property_random_graphs(spark):
    """Property check across many random graphs (incl. the min-neighbor
    seeding): engine labels always equal the union-find oracle."""
    import random

    for seed in (7, 19, 101):
        rng = random.Random(seed)
        n = rng.randrange(5, 40)
        vertices = list(range(n))
        pairs = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(0, 2 * n))
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        got = _cc(spark, pairs, vertices=vertices)
        assert got == _uf_oracle(pairs, vertices), f"seed={seed}"
