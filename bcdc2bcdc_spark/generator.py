"""Deterministic synthetic data generator (FIXTURES.md §1-§3, §5).

Mirrors the reference's test-data strategy — deliberately dirty canned
snapshots (/root/reference/tests/data/users_src.json: duplicate emails,
nulls, autogen noise) and paired src/dest snapshots of one entity
(/root/reference/data/bc-parks-..._{PROD,TEST}.json) — transposed onto the
``(repo, path, commit, lang, content)`` lake shape.

Everything is generated with Spark column expressions over ``spark.range``:
deterministic given (seed, sizes), trivially parallel, and scales to any
row count without driver-side loops. "Randomness" is ``xxhash64`` of
(seed, id, tag) — stable across runs, partitionings and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from bcdc2bcdc_spark.schema import OP_ADD, OP_DELETE, OP_UPDATE

LANGS = ("py", "java", "go", "md", "rs", "c", "ts", "sql")
#: repos whose events the engine must skip (transformationConfig
#: ignore_list analog, /root/reference/bcdc2bcdc/CKANTransform.py:232-251)
IGNORED_REPOS = ("vendored/ignored-a", "vendored/ignored-b")


def _h(seed: int, tag: str, *cols: Column) -> Column:
    """Deterministic 64-bit hash stream, one stream per tag."""
    return F.xxhash64(F.lit(seed), F.lit(tag), *cols)


def _pct(seed: int, tag: str, col: Column) -> Column:
    """Deterministic uniform int in [0, 100)."""
    return F.pmod(_h(seed, tag, col), F.lit(100))


def _repo_expr(seed: int, key_id: Column, n_repos: int) -> Column:
    """Zipf-ish skewed repo assignment: repo_00 owns ~30% of keys, repo_01
    ~15% (exercises salting), a sliver lands in the ignore-listed repos,
    the rest spread uniformly."""
    bucket = _pct(seed, "repo_skew", key_id)
    uniform = F.pmod(_h(seed, "repo_pick", key_id), F.lit(max(n_repos - 2, 1))) + 2
    return (
        F.when(bucket < 30, F.lit("org/repo_00"))
        .when(bucket < 45, F.lit("org/repo_01"))
        .when(bucket < 47, F.lit(IGNORED_REPOS[0]))
        .when(bucket < 48, F.lit(IGNORED_REPOS[1]))
        .otherwise(F.format_string("org/repo_%02d", uniform))
    )


def _path_expr(key_id: Column) -> Column:
    ext = F.element_at(F.array(*[F.lit(x) for x in LANGS]), (F.pmod(key_id, F.lit(len(LANGS))) + 1).cast("int"))
    return F.format_string("src/dir%03d/file_%06d.%s", F.pmod(key_id, F.lit(200)).cast("int"), key_id.cast("int"), ext)


def _lang_expr(seed: int, key_id: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(x) for x in LANGS]),
        (F.pmod(_h(seed, "lang", key_id), F.lit(len(LANGS))) + 1).cast("int"),
    )


def _content_expr(seed: int, key_id: Column, version: Column) -> Column:
    """Deterministic pseudo-code text, distinct per (key, version)."""
    body = F.sha2(F.concat_ws("|", F.lit(seed), key_id, version), 256)
    return F.format_string(
        "def fn_%d(x):\n    # v=%s\n    y = '%s'\n    return hash(x) ^ len(y)\n",
        key_id,
        version.cast("string"),
        body,
    )


def _commit_expr(seed: int, key_id: Column, version: Column) -> Column:
    """40-char hex-shaped commit id, lexically monotone in ``version``
    (zero-padded decimal prefix) so LWW order-by-commit is well defined
    and tie-free (FIXTURES.md §2)."""
    return F.concat(
        F.lpad(version.cast("string"), 12, "0"),
        F.substring(F.sha2(F.concat_ws("|", F.lit(seed), key_id, version), 256), 1, 28),
    )


def gen_repos(spark: SparkSession, n_keys: int = 5000, n_repos: int = 40, seed: int = 42) -> DataFrame:
    """Base lake table (DEST-snapshot analog): one row per key_id in
    [0, n_keys), unique on (repo, path)."""
    ids = spark.range(n_keys).select(F.col("id").alias("key_id"))
    v0 = F.lit(0).cast("long")
    return ids.select(
        _repo_expr(seed, F.col("key_id"), n_repos).alias("repo"),
        _path_expr(F.col("key_id")).alias("path"),
        _commit_expr(seed, F.col("key_id"), v0).alias("commit"),
        _lang_expr(seed, F.col("key_id")).alias("lang"),
        _content_expr(seed, F.col("key_id"), v0).alias("content"),
    )


def gen_events(
    spark: SparkSession,
    n_events: int = 20000,
    n_keys: int = 5000,
    n_repos: int = 40,
    n_epochs: int = 4,
    seed: int = 42,
    key_universe_factor: float = 1.25,
) -> DataFrame:
    """Change-event log with the required dirtiness (FIXTURES.md §2):

    * several events per (repo, path) within an epoch  → LWW dedup
    * no-op UPDATEs (content == base-version content)  → digest suppression
    * ADD on existing key / UPDATE-DELETE on missing   → MERGE branch semantics
      (events target a key universe 25% larger than the base table)
    * 'None'/'' noise in lang, null content on DELETE  → canonicalization
    * ignore-listed repos present                      → skip filter
    * hot-key hammer: extra ~15% of events on 10 keys  → skew salting
    * commit lexically monotone per key, event_seq unique → tie-free LWW

    Returns columns (repo path commit lang content op event_seq epoch).
    """
    universe = int(n_keys * key_universe_factor)
    per_epoch = max(1, n_events // n_epochs)
    ev = spark.range(n_events).select(F.col("id").alias("event_seq"))

    hammer = _pct(seed, "hammer", F.col("event_seq")) < 15
    key_id = F.when(
        hammer, F.pmod(_h(seed, "hotkey", F.col("event_seq")), F.lit(10))
    ).otherwise(F.pmod(_h(seed, "key", F.col("event_seq")), F.lit(universe)))

    opsel = _pct(seed, "op", F.col("event_seq"))
    op = (
        F.when(opsel < 20, F.lit(OP_DELETE))
        .when(opsel < 45, F.lit(OP_ADD))
        .otherwise(F.lit(OP_UPDATE))
    )

    # commit monotonicity and content identity are decoupled: the commit is
    # ALWAYS derived from event_seq+1 (lexically monotone per key — the
    # FIXTURES §2 guarantee LWW associativity rests on), while a no-op
    # UPDATE reuses content version 0 (the base content) so only the
    # payload repeats, never the version.
    noop = (_pct(seed, "noop", F.col("event_seq")) < 12) & (op == OP_UPDATE)
    version = F.col("event_seq") + 1
    content_version = F.when(noop, F.lit(0).cast("long")).otherwise(version)

    lang_noise = _pct(seed, "langnoise", F.col("event_seq"))
    lang = (
        F.when(lang_noise < 4, F.lit("None"))
        .when(lang_noise < 7, F.lit(""))
        .when(lang_noise < 9, F.lit(None).cast("string"))
        .otherwise(_lang_expr(seed, key_id))
    )
    content_noise = _pct(seed, "cnoise", F.col("event_seq"))
    content = F.when(op == OP_DELETE, F.lit(None).cast("string")).otherwise(
        F.when((content_noise < 2) & ~noop, F.lit("None"))
        .when((content_noise < 4) & ~noop, F.lit(""))
        .otherwise(_content_expr(seed, key_id, content_version))
    )

    return ev.select(
        _repo_expr(seed, key_id, n_repos).alias("repo"),
        _path_expr(key_id).alias("path"),
        _commit_expr(seed, key_id, version).alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
        op.alias("op"),
        F.col("event_seq"),
        (F.col("event_seq") / per_epoch).cast("long").alias("epoch"),
    )


def gen_snapshot_pair(
    spark: SparkSession, n_keys: int = 3000, n_repos: int = 30, seed: int = 7
) -> tuple[DataFrame, DataFrame, dict]:
    """Paired src/dest snapshots with a generator-known delta (FIXTURES.md §5),
    the analog of the reference's PROD/TEST package pair.

    dest = base-shaped table. src = dest with, per key_id bucket:
      * ~5%  keys missing from src            → DELETE rows of diff(src,dest)
      * ~5%  extra keys only in src           → ADDs
      * ~10% content changed                  → UPDATEs
      * ~10% falsy-only differences: lang falsy on BOTH sides but as
        different variants (''/'None'/null) → MUST classify unchanged
        (Diff.py:55-67 falsy-equivalence: a key falsy on both sides is
        not a difference; falsy-vs-real IS one)
    Returns (src, dest, manifest) where manifest has exact expected counts.
    """
    ids = spark.range(int(n_keys * 1.05)).select(F.col("id").alias("key_id"))
    b = _pct(seed, "pairbucket", F.col("key_id"))
    is_extra = F.col("key_id") >= n_keys
    drop_in_src = (b < 5) & ~is_extra
    changed = (b >= 5) & (b < 15) & ~is_extra
    falsy_only = (b >= 15) & (b < 25) & ~is_extra

    def falsy_variant(shift: int) -> Column:
        v = F.pmod(F.col("key_id") + shift, F.lit(3))
        return (
            F.when(v == 0, F.lit(""))
            .when(v == 1, F.lit("None"))
            .otherwise(F.lit(None).cast("string"))
        )

    def snapshot(version: Column, lang: Column, keep) -> DataFrame:
        return ids.filter(keep).select(
            _repo_expr(seed, F.col("key_id"), n_repos).alias("repo"),
            _path_expr(F.col("key_id")).alias("path"),
            _commit_expr(seed, F.col("key_id"), version).alias("commit"),
            lang.alias("lang"),
            _content_expr(seed, F.col("key_id"), version).alias("content"),
        )

    v0 = F.lit(0).cast("long")
    dest = snapshot(
        v0,
        F.when(falsy_only, falsy_variant(0)).otherwise(_lang_expr(seed, F.col("key_id"))),
        ~is_extra,
    )
    src = snapshot(
        F.when(changed | is_extra, F.lit(999_999).cast("long")).otherwise(v0),
        F.when(falsy_only, falsy_variant(1)).otherwise(_lang_expr(seed, F.col("key_id"))),
        ~drop_in_src,
    )
    # manifest computed from the same deterministic bucketing (exact, cheap)
    n_extra = int(n_keys * 1.05) - n_keys
    counts = (
        ids.filter(~is_extra)
        .select(
            F.sum(F.when(drop_in_src, 1).otherwise(0)).alias("n_delete"),
            F.sum(F.when(changed, 1).otherwise(0)).alias("n_update"),
            F.sum(F.when(falsy_only, 1).otherwise(0)).alias("n_falsy_only"),
        )
        .collect()[0]
    )
    manifest = {
        "n_add": n_extra,
        "n_delete": int(counts["n_delete"]),
        "n_update": int(counts["n_update"]),
        "n_falsy_only_unchanged": int(counts["n_falsy_only"]),
    }
    # NOTE: falsy-only rows keep version 0 → identical content/commit; only
    # `lang` differs, and only between falsy variants, so the canonical diff
    # must call them unchanged.
    return src, dest, manifest
