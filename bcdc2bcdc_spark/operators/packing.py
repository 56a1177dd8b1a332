"""Sequence packing: assign documents to fixed token-budget training
windows (the "concat-then-split" packing used to build pretraining
batches — docs are concatenated in a deterministic order and the stream
is cut every ``seq_len`` tokens).

Formulation: an exclusive prefix sum of token counts within each shard
(window ``SUM ... ROWS UNBOUNDED PRECEDING`` minus the row's own count)
gives every document's start offset in the shard's token stream; the
windows it lands in are pure arithmetic on that offset. One shuffle
(hash by shard), deterministic output, no driver state.

Scale: packing is per-SHARD by construction — a global token order would
funnel the whole corpus through one partition, and pretraining does not
need one (shards are shuffled at training time anyway). Pick
``n_shards`` ≫ cluster cores; each shard's window is an independent
partition of the one exchange. Skew equals shard size variance, which
hash-sharding bounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    seq_len: int = 2048,
    n_shards: int = 8,
    shard_col: Column | str | None = None,
) -> DataFrame:
    """Per document: its shard, start offset in the shard's concatenated
    token stream (docs ordered by ``id_col``), the first training
    sequence it lands in, and how many sequences it spans (a doc longer
    than the remaining window crosses one or more cut points). Empty
    documents occupy zero tokens: they get their stream position with
    ``n_seqs = 0``.

    Output: input columns + ``shard, start_tok, seq_first, n_seqs``.
    Deterministic — same input, same packing, any partitioning — provided
    ``id_col`` is unique within a shard (the normal case: it is the
    document key). With duplicate ids the window order ties and only
    rows whose (id, token count) both tie are interchangeable — those
    produce identical output rows either way; duplicate ids with
    different payloads have no defined concatenation order and the
    assignment between them is partitioning-dependent.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be ≥ 1, got {seq_len}")
    if shard_col is None:
        shard = F.pmod(F.col(id_col), F.lit(n_shards))
    else:
        shard = F.col(shard_col) if isinstance(shard_col, str) else shard_col
    out = df.withColumn("shard", shard.cast("long"))
    w = (
        Window.partitionBy("shard")
        # tokens_col as tiebreak: equal-(id, tokens) rows become
        # interchangeable, making the output a deterministic multiset
        # even under duplicate ids
        .orderBy(F.col(id_col).asc(), F.col(tokens_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.col(tokens_col).cast("long")
    out = out.withColumn("start_tok", (F.sum(t).over(w) - t).cast("long"))
    end_tok = F.col("start_tok") + t  # exclusive
    out = out.withColumn(
        "seq_first", F.floor(F.col("start_tok") / seq_len).cast("long")
    ).withColumn(
        "n_seqs",
        F.when(t == 0, F.lit(0)).otherwise(
            F.floor((end_tok - 1) / seq_len) - F.col("seq_first") + 1
        ).cast("long"),
    )
    return out
