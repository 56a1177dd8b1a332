"""Approximate-nearest-neighbor search over an embedding column.

* ``brute_force_topk`` — exact cosine top-k: queries (small) are
  BROADCAST against the corpus, cosine is a sequential double fold
  (deterministic), top-k via window row_number per query. The baseline
  and the verifier for the approximate paths.
* ``ivf_topk`` — the scale path: k-means-lite (deterministic seeded
  centroid sample) partitions the corpus into cells; a query probes only
  its ``n_probe`` nearest cells, turning the scan from O(corpus) into
  O(corpus × n_probe / n_cells). All DataFrame ops: centroid assignment is
  a broadcast join + argmin, probing is a key-equality join on cell id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from bcdc2bcdc_spark.operators.dedupe import cosine_expr


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (query_id, neighbor_id, cosine,
    rank). Deterministic tie-break on neighbor id; self-matches excluded."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("cv"), F.col("qv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _centroids(corpus: DataFrame, n_cells: int, vec_col: str, id_col: str) -> DataFrame:
    """Deterministic centroid pick: the n_cells corpus vectors with the
    smallest md5(id) — a seeded random sample without randomness.

    Physical plan: orderBy+limit compiles to TakeOrderedAndProject — a
    DISTRIBUTED per-partition top-n followed by a driver-side merge of
    n_cells rows; the subsequent cell-numbering window runs over only
    those n_cells rows (never the corpus). No global single-task sort."""
    small = (
        corpus.select(
            _as_double(F.col(vec_col)).alias("centroid"),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h")
        .limit(n_cells)
    )
    w = Window.orderBy("_h")  # n_cells rows only — bounded, not a scale risk
    return (
        small.withColumn("_r", F.row_number().over(w))
        .select((F.col("_r") - 1).alias("cell_id"), "centroid")
    )


def _assign_cells(
    vecs: DataFrame, centroids: DataFrame, vec_alias: str, n_best: int
) -> DataFrame:
    """Attach the n_best nearest cell ids to each vector (broadcast join +
    windowed argmin — centroids are tiny by construction)."""
    scored = vecs.crossJoin(F.broadcast(centroids)).withColumn(
        "_sim", cosine_expr(F.col(vec_alias), F.col("centroid"))
    )
    w = Window.partitionBy(vecs.columns[0]).orderBy(F.desc("_sim"), F.asc("cell_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_best)
        .drop("centroid", "_sim", "_rk")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-style ANN: corpus assigned to its nearest cell, queries probe
    their n_probe nearest cells, exact cosine within probed cells only."""
    cents = _centroids(corpus, n_cells, vec_col, id_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c_cells = _assign_cells(c, cents, "cv", 1)
    q_cells = _assign_cells(q, cents, "qv", n_probe)
    scored = (
        q_cells.join(c_cells, "cell_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("cv"), F.col("qv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .distinct()
    )


def ann_recall(exact: DataFrame, approx: DataFrame) -> float:
    """Fraction of exact top-k pairs recovered by the approximate index."""
    e = exact.select("query_id", "neighbor_id")
    hits = e.join(approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]).count()
    total = e.count()
    return hits / total if total else 1.0
