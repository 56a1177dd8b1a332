"""Decontamination: hit counting vs a Python set oracle, min_hits
thresholding, short-document edge (doc shorter than n = one shingle),
and the broadcast/shuffle paths agreeing."""

import pytest

from bcdc2bcdc_spark.operators.decontam import contamination_hits, decontaminate


def _py_shingles(text, n):
    toks = [t for t in text.lower().split() if t]
    if not toks:
        return set()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@pytest.fixture(scope="module")
def corpora(spark):
    train = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "the quick brown cat sits very still today"),
        (4, "short doc"),
        (5, "completely unrelated words appear in this sentence"),
    ]
    evals = [
        (100, "the quick brown fox ran away"),
        (101, "short doc"),
    ]
    return (
        spark.createDataFrame(train, "doc_id long, text string"),
        spark.createDataFrame(evals, "doc_id long, text string"),
        train,
        evals,
    )


def _oracle_hits(train_rows, eval_rows, n):
    ev = set()
    for _, t in eval_rows:
        ev |= _py_shingles(t, n)
    return {
        i: len(_py_shingles(t, n) & ev)
        for i, t in train_rows
        if _py_shingles(t, n) & ev
    }


@pytest.mark.parametrize("n", [2, 3])
def test_hits_match_python_oracle(spark, corpora, n):
    train, evals, train_rows, eval_rows = corpora
    got = {
        r["doc_id"]: r["hits"]
        for r in contamination_hits(train, evals, n=n).collect()
    }
    assert got == _oracle_hits(train_rows, eval_rows, n)


def test_short_doc_single_shingle_contaminates(spark, corpora):
    train, evals, *_ = corpora
    # 'short doc' (2 tokens < n=3) becomes ONE whole-text shingle on both
    # sides and must be flagged
    kept = decontaminate(train, evals, n=3)
    assert 4 not in {r["doc_id"] for r in kept.collect()}


def test_min_hits_threshold(spark, corpora):
    train, evals, train_rows, eval_rows = corpora
    oracle = _oracle_hits(train_rows, eval_rows, 3)
    hi = max(oracle.values())
    kept = {r["doc_id"] for r in decontaminate(train, evals, n=3, min_hits=hi + 1).collect()}
    assert kept == {i for i, _ in train_rows}  # threshold above max → keep all
    kept1 = {r["doc_id"] for r in decontaminate(train, evals, n=3, min_hits=1).collect()}
    assert kept1 == {i for i, _ in train_rows} - set(oracle)


def test_broadcast_and_shuffle_paths_agree(spark, corpora):
    train, evals, *_ = corpora
    a = contamination_hits(train, evals, n=3, broadcast_eval=True)
    b = contamination_hits(train, evals, n=3, broadcast_eval=False)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
