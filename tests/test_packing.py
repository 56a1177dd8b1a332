"""Sequence packing: prefix-sum correctness vs a Python fold, boundary
spanning, empty docs, determinism under repartitioning, and custom
shard columns."""

import pytest
from pyspark.sql import functions as F

from bcdc2bcdc_spark.operators.packing import pack_sequences


def _py_pack(rows, seq_len, n_shards):
    out = {}
    by_shard = {}
    for i, t in sorted(rows):
        by_shard.setdefault(i % n_shards, []).append((i, t))
    for shard, docs in by_shard.items():
        pos = 0
        for i, t in docs:  # already id-ordered
            first = pos // seq_len
            n = 0 if t == 0 else (pos + t - 1) // seq_len - first + 1
            out[i] = (shard, pos, first, n)
            pos += t
    return out


def test_matches_python_fold(spark):
    rows = [(i, (i * 37) % 900 + 1) for i in range(200)] + [(500, 0), (501, 5000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["shard"], r["start_tok"], r["seq_first"], r["n_seqs"])
        for r in pack_sequences(df, seq_len=512, n_shards=4).collect()
    }
    assert got == _py_pack(rows, 512, 4)


def test_boundary_spanning_and_empty(spark):
    # one shard, seq_len 10: doc 0 fills 0..9, doc 1 (len 15) spans seqs
    # 1..2, doc 2 is empty at offset 25, doc 3 starts mid-seq 2
    rows = [(0, 10), (1, 15), (2, 0), (3, 4)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["start_tok"], r["seq_first"], r["n_seqs"])
        for r in pack_sequences(df, seq_len=10, n_shards=1).collect()
    }
    assert got == {0: (0, 0, 1), 1: (10, 1, 2), 2: (25, 2, 0), 3: (25, 2, 1)}


def test_deterministic_under_repartition(spark):
    rows = [(i, i % 50 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = sorted(map(tuple, pack_sequences(df, seq_len=64).collect()))
    b = sorted(map(tuple, pack_sequences(df.repartition(17), seq_len=64).collect()))
    assert a == b


def test_custom_shard_col_and_validation(spark):
    df = spark.createDataFrame(
        [(1, 5, "x"), (2, 5, "x"), (3, 5, "y")], "doc_id long, n_tokens long, src string"
    )
    got = pack_sequences(
        df, seq_len=8, shard_col=F.crc32("src").cast("long")
    ).groupBy("shard").count().collect()
    assert sorted(r["count"] for r in got) == [1, 2]
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(df, seq_len=0)
