"""Property-based invariants (hypothesis) for canonicalization + digests.

Strategy: hypothesis generates the VALUE SPACE python-side; each property
batches all examples into ONE DataFrame and a single Spark action checks
the whole batch (per-example Spark jobs would be prohibitively slow).
"""

import hashlib

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from bcdc2bcdc_spark.functions.canonicalize import NULLISH_STRINGS, canonical_nullish
from bcdc2bcdc_spark.functions.digest import row_digest_expr

FALSY = list(NULLISH_STRINGS) + [None]

text = st.one_of(
    st.none(),
    st.sampled_from(FALSY),
    st.text(min_size=0, max_size=40),
)


def _py_canon(v):
    if v is None or v in NULLISH_STRINGS:
        return None
    return v


def _py_digest(lang, content):
    inner = [
        hashlib.sha256(("n:" if v is None else "v:" + str(v)).encode()).hexdigest()
        for v in (_py_canon(lang), _py_canon(content))
    ]
    return hashlib.sha256("\x1f".join(inner).encode()).hexdigest()


@settings(max_examples=1, deadline=None)
@given(st.lists(st.tuples(text, text), min_size=200, max_size=200))
def test_digest_matches_independent_python_model(spark, rows):
    """Spark canonical digest == independently computed python digest, for
    arbitrary (lang, content) pairs incl. every falsy spelling."""
    df = spark.createDataFrame(rows, "lang string, content string")
    got = df.select(
        "lang",
        "content",
        row_digest_expr([canonical_nullish("lang"), canonical_nullish("content")]).alias("d"),
    ).collect()
    for r in got:
        assert r["d"] == _py_digest(r["lang"], r["content"])


@settings(max_examples=1, deadline=None)
@given(st.lists(st.sampled_from(FALSY), min_size=50, max_size=50))
def test_all_falsy_spellings_digest_identically(spark, vals):
    """Falsy-equivalence (Diff.py:55-67): every falsy spelling of a value
    produces the SAME canonical digest — so falsy-vs-falsy is never a diff."""
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    digs = (
        df.select(row_digest_expr([canonical_nullish("v")]).alias("d"))
        .distinct()
        .collect()
    )
    assert len(digs) == 1


def test_falsy_vs_real_always_differs(spark):
    """Falsy vs an actual value IS a difference (one-sided falsy)."""
    reals = ["x", "0", "false", " ", "none "]  # note: not canonical-falsy
    df = spark.createDataFrame([(v,) for v in reals + list(FALSY)], "v string")
    d = df.select(
        "v", row_digest_expr([canonical_nullish("v")]).alias("d")
    ).collect()
    falsy_digest = next(r["d"] for r in d if r["v"] is None)
    for r in d:
        if r["v"] in reals:
            assert r["d"] != falsy_digest, r["v"]


def test_digest_injective_on_separator_adversaries(spark):
    """Multi-column digests must not collide when values contain the
    separator or tag characters (the classic concat-ambiguity bug)."""
    pairs = [
        ("a\x1fb", "c"),
        ("a", "b\x1fc"),
        ("a\x1fb\x1fc", None),
        ("v:a", "b"),
        ("a", "v:b"),
        ("n:", "x"),
        (None, "n:x"),
        # true boundary forgeries — collide under naive tagged-concat:
        ("x\x1fv:y", "z"),
        ("x", "y\x1fv:z"),
    ]
    df = spark.createDataFrame(pairs, "x string, y string")
    digs = [r["d"] for r in df.select(row_digest_expr(["x", "y"]).alias("d")).collect()]
    assert len(set(digs)) == len(pairs)


# ---------------------------------------------------------------------------
# operator-level properties: LWW strategy agreement, diff→apply convergence
# ---------------------------------------------------------------------------

_vals = st.sampled_from(["a", "b", "", "None", None, "x y"])


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.sampled_from(["ADD", "UPDATE", "DELETE"]), _vals),
        min_size=1,
        max_size=60,
    )
)
def test_lww_strategies_agree_on_random_logs(spark, evs):
    """window / maxby / salted LWW produce the identical winner set on
    arbitrary event logs (duplicate keys, falsy payloads, every op mix)."""
    from bcdc2bcdc_spark.operators.lww import lww_dedup

    rows = [
        (f"r{k % 3}", f"p{k}", f"{i:06d}", lang, op, i)
        for i, (k, op, lang) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, op string, event_seq long"
    )
    outs = [
        sorted(
            map(
                tuple,
                lww_dedup(
                    df, order_cols=("commit", "event_seq"), strategy=s, n_salts=4
                ).collect(),
            )
        )
        for s in ("window", "maxby", "salted")
    ]
    assert outs[0] == outs[1] == outs[2]


@settings(max_examples=3, deadline=None)
@given(
    src=st.dictionaries(st.integers(0, 20), st.tuples(_vals, _vals), max_size=20),
    dest=st.dictionaries(st.integers(0, 20), st.tuples(_vals, _vals), max_size=20),
)
def test_diff_apply_converges_on_random_snapshots(spark, src, dest):
    """D3 as a law: for ARBITRARY src/dest snapshots (falsy noise included),
    dest + apply(diff(src, dest)) ≡ src under falsy-equivalence, and a
    second application of the same delta changes nothing (idempotence)."""
    from bcdc2bcdc_spark.functions.canonicalize import canonicalize_snapshot
    from bcdc2bcdc_spark.operators.apply import apply_changes
    from bcdc2bcdc_spark.operators.diff import datasets_equal, snapshot_diff

    schema = "repo string, path string, commit string, lang string, content string"

    def frame(d):
        rows = [(f"r{k % 3}", f"p{k}", "c0", v[0], v[1]) for k, v in d.items()]
        return spark.createDataFrame(rows, schema)

    s, d = frame(src), frame(dest)
    delta = snapshot_diff(s, d)
    converged = apply_changes(canonicalize_snapshot(d), delta)
    assert datasets_equal(converged, canonicalize_snapshot(s))
    again = apply_changes(converged, delta)
    assert datasets_equal(again, converged)
