"""Eval-set decontamination for training corpora.

Before training, any document that shares verbatim n-grams with an
evaluation/benchmark set must be dropped (or flagged) — otherwise eval
scores measure memorization. The standard method (GPT-3 appendix C,
The Pile, FineWeb) is n-gram overlap: build the eval set's distinct
n-gram shingles, then flag every training document containing at least
``min_hits`` of them.

Spark shape: the eval shingle set is tiny next to the corpus (benchmarks
are a few MB; the corpus is the 100 TB side), so it is BROADCAST — the
contamination join is map-side, no shuffle of the corpus shingle stream.
The only wide op is the per-document hit count, a partially-aggregated
groupBy on doc id. Shingling itself reuses the zip_with formulation from
:mod:`bcdc2bcdc_spark.operators.dedupe` (no UDF, whole-stage codegen).

At 100 TB: corpus shingles are O(total tokens) exploded rows but they
stream through a broadcast-hash semi join and a partial count — nothing
materializes them; a document with zero hits contributes zero rows after
the join. If the eval set ever outgrows broadcast (hundreds of MB of
shingles), pass ``broadcast_eval=False`` to fall back to a shuffled
hash join keyed on the shingle — same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bcdc2bcdc_spark.operators.dedupe import _shingles


def contamination_hits(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-training-document count of DISTINCT n-gram shingles shared
    with the eval set: (id_col, hits), only documents with ≥1 hit."""
    tr = _shingles(train, text_col, id_col, n)  # distinct per doc already
    ev = _shingles(eval_df, text_col, id_col, n).select("tok").distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    return (
        tr.join(ev, "tok")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("hits"))
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_hits: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Training corpus with contaminated documents removed (anti-join on
    the flagged id set — the corpus payload never shuffles)."""
    flagged = (
        contamination_hits(train, eval_df, text_col, id_col, n, broadcast_eval)
        .filter(F.col("hits") >= min_hits)
        .select(id_col)
    )
    return train.join(flagged, id_col, "left_anti")
