"""Connected components over near-dup candidate pairs → dedup clusters.

Every candidate generator in :mod:`bcdc2bcdc_spark.operators.dedupe`
(n-gram Jaccard, MinHash LSH, SimHash, embedding LSH) emits *pairs*; a
training-data pipeline needs *clusters* — one canonical document kept per
group of mutual near-dups, the rest dropped.  This module closes that gap
with a pure-DataFrame connected-components operator: each vertex is
labelled with the MINIMUM vertex id reachable from it, so the label IS a
stable, deterministic cluster id.

Algorithm: iterative min-label propagation with pointer compression
(the "hash-to-min" scheme of Rastogi et al., *Finding Connected
Components in Map-Reduce in Logarithmic Rounds*, ICDE'13).  Per round:

1. propagate — every vertex takes the min of its own label and its
   neighbours' labels (one join + one partial-aggregated groupBy);
2. compress — every vertex re-reads the label OF its label
   (``l(v) ← l(l(v))``, one self-join), the parallel analog of
   union-find path compression.

Labels only ever decrease, so the fixpoint is exact; with compression the
round count is O(log n) even on adversarial path graphs, while LSH dedup
graphs (near-cliques) converge in 2–3 rounds.  All shuffles are
hash-partitioned on vertex id — there is no single-partition step and no
driver-side graph state; per-round work is O(|E| + |V|) shuffled bytes.

Lineage is truncated every round via ``localCheckpoint`` (iterative plans
otherwise grow unboundedly and re-execute from the source each action).
On a real cluster prefer a reliable ``spark.sparkContext.setCheckpointDir``
+ ``checkpoint()`` — localCheckpoint blocks live on executors and do not
survive executor loss; the operator takes a ``checkpoint`` callable so
deployments can swap the strategy without forking the loop.

Reference parity note: the reference engine has no graph step — this is
part of the beyond-reference training-data-pipeline surface mandated by
the brief (same family as operators/dedupe.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _default_checkpoint(df: DataFrame) -> DataFrame:
    """LAZY local checkpoint: the convergence probe (the round's one
    action) materializes it, so each round schedules a single job instead
    of checkpoint-job + probe-job — on small/medium graphs the round cost
    is scheduling, not data."""
    return df.localCheckpoint(eager=False)


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    vertices: DataFrame | None = None,
    id_col: str = "doc_id",
    max_iter: int = 25,
    checkpoint: Callable[[DataFrame], DataFrame] = _default_checkpoint,
) -> DataFrame:
    """Label every vertex with the min id of its connected component.

    ``pairs`` is an undirected edge list (one row per candidate pair);
    ``vertices`` optionally supplies the full vertex universe so isolated
    documents (no near-dup) come back as singleton clusters
    (``cluster_id = id``) instead of being absent.  Returns
    ``(id, cluster_id)``, exactly one row per vertex.

    Raises ``RuntimeError`` if ``max_iter`` rounds do not reach the
    fixpoint — with compression that needs a component of diameter
    ≳ 2^max_iter, i.e. it fires only on a mis-wired input.
    """
    edges = checkpoint(
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    # vertex universe derives from the CHECKPOINTED edges (the candidate
    # generator feeding ``pairs`` is usually the expensive plan — deriving
    # verts from the raw edge plan would execute it a second time), with
    # ONE distinct over the union instead of one per branch
    verts = edges.select(F.col("src").alias("id"))
    if vertices is not None:
        verts = verts.union(vertices.select(F.col(id_col).alias("id")))
    verts = verts.distinct()
    # seed labels with min(self, neighbors) — folds the first propagation
    # into initialization (same fixpoint, one fewer round on the
    # near-clique graphs LSH produces)
    seed_min = edges.groupBy("src").agg(F.min("dst").alias("nbr_min")).withColumnRenamed(
        "src", "id"
    )
    labels = checkpoint(
        verts.join(seed_min, "id", "left").select(
            "id", F.least("id", F.coalesce("nbr_min", "id")).alias("label")
        )
    )

    def _compress(frame: DataFrame) -> DataFrame:
        """One pointer-compression hop: ``l(v) ← l(l(v))`` on an
        (id, _new, _old) frame.  Labels are always vertex ids, so the
        inner join is total; the two branches of the self-join are the
        identical subplan, so Spark reuses one exchange for both."""
        ptr = frame.select(F.col("id").alias("_p"), F.col("_new").alias("_pn"))
        return frame.join(ptr, frame["_new"] == ptr["_p"]).select(
            "id", F.col("_pn").alias("_new"), "_old"
        )

    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("id").alias("dst"), F.col("label").alias("nl")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("nbr_min"))
            .withColumnRenamed("src", "id")
        )
        # the pre-round label rides along as ``_old`` so the convergence
        # probe is a FILTER on the round's own output instead of an extra
        # join-against-previous-labels per round (guide §1.2: one fewer
        # shuffle per iteration)
        prop = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least("label", F.coalesce("nbr_min", "label")).alias("_new"),
            F.col("label").alias("_old"),
        )
        compressed = _compress(prop)
        new_labels = checkpoint(compressed)
        # Labels decrease monotonically → converged ⟺ zero rows changed.
        # The probe is a FULL count on purpose: it is the round's only
        # action, so it must compute every partition — that is what
        # materializes the lazy checkpoint completely (a limit(1) would
        # stop early and leave partitions un-checkpointed, re-growing
        # lineage across rounds).
        changed = new_labels.filter(F.col("_new") != F.col("_old")).count()
        labels = new_labels.select("id", F.col("_new").alias("label"))
        if changed == 0:
            return labels.select("id", F.col("label").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter ≳ 2^max_iter; check the pair generator"
    )


def dedup_keep_representative(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    order_by: Column | list[Column] | None = None,
) -> DataFrame:
    """Keep ONE document per dedup cluster: the first under ``order_by``
    (default: longest text, ties → smallest id — deterministic).  Returns
    the kept docs with their ``cluster_id`` and the cluster size, i.e. the
    deduplicated corpus plus the bookkeeping a pipeline logs.

    One broadcast-friendly join (clusters is (id, cluster_id), tiny next
    to the doc payload) + one window partitioned by cluster_id — both
    hash-partitioned; skew equals the largest dup cluster, which the
    candidate generators already bound (band/bucket caps).
    """
    if order_by is None:
        order_by = [F.length("text").desc(), F.col(id_col).asc()]
    elif isinstance(order_by, Column):
        order_by = [order_by]
    # LEFT join: a doc absent from the cluster frame (e.g. components run
    # without the full vertex universe) is its OWN singleton cluster —
    # an inner join here would silently drop the entire non-duplicate
    # majority of the corpus.
    joined = docs.join(
        clusters.select(F.col("id").alias(id_col), "cluster_id"), id_col, "left"
    ).withColumn("cluster_id", F.coalesce("cluster_id", F.col(id_col)))
    w = Window.partitionBy("cluster_id")
    ranked = joined.withColumn(
        "_rn", F.row_number().over(w.orderBy(*order_by))
    ).withColumn("cluster_size", F.count(F.lit(1)).over(w))
    return ranked.filter(F.col("_rn") == 1).drop("_rn")
