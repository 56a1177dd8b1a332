"""Deduplication operators for training-data pipelines.

Five strategies, all shuffle-structured for scale (no cartesian products —
candidate generation is always a key-equality join):

* exact           — hash-groupBy on a content fingerprint; map-side combine.
* ngram_jaccard   — token/shingle sets, candidates via shared-token join,
                    Jaccard from intersection counts.
* minhash_lsh     — k md5-based minhashes → bands → bucket join; only
                    same-bucket pairs are compared. The 100 TB path:
                    shuffle is O(docs × bands), never O(docs²).
* simhash         — 16-bit bit-majority fingerprint; exact-bucket match
                    (Hamming-0) with the bit math portable to the SQL oracle.
* embedding_cosine — near-duplicate by cosine ≥ τ over an embedding column;
                    candidates via banded random-hyperplane LSH (md5-derived
                    ±1 planes, bucket count parameterized by band_bits),
                    exact cosine on candidates only.

md5-hex string ordering is used as the hash universe so every operator has
a bit-identical ANSI-SQL oracle (DuckDB md5) — see driver_queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from bcdc2bcdc_spark.functions.text import fingerprint, normalized_text


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One representative (min id) per exact normalized content; group sizes
    kept for lineage. groupBy = partial-agg hash aggregate, skew-tolerant."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .select(id_col, "n_copies")
    )


# ---------------------------------------------------------------------------
# token/shingle machinery
# ---------------------------------------------------------------------------

def _distinct_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = F.explode(
        F.array_distinct(F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""))
    )
    return df.select(F.col(id_col), toks.alias("tok"))


def _shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """Distinct word n-gram shingles per document, built with array
    higher-order functions — no UDF. A document shorter than n yields one
    shingle: all its tokens joined (same as the SQL oracles' list_slice
    truncation).

    Formulated as n-1 ``zip_with``s of shifted token arrays (concat_ws
    skips the trailing nulls the shorter side pads with), then one slice
    to drop the partial tail shingles. The obvious
    ``transform(sequence(...), i -> concat_ws(' ', slice(toks, i+1, n)))``
    is O(tokens) slice work per position — measured 3.8 s vs 0.48 s for
    this zip_with form on 5000 real documents (sf0.1)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    sh = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.size(toks))
        sh = F.zip_with(sh, shifted, lambda a, b: F.concat_ws(" ", a, b))
    sh = F.slice(sh, 1, F.greatest(F.size(toks) - n + 1, F.lit(1)))
    return df.select(
        F.col(id_col), F.explode(F.array_distinct(sh)).alias("tok")
    ).filter(F.col("tok") != "")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Candidate pairs (a < b) with token/shingle-set Jaccard ≥ threshold.

    Shuffle profile: explode → groupBy token (intersection counts) →
    join with per-doc set sizes.

    ``max_df`` is the SCALE guard: a shingle appearing in more than
    ``max_df`` documents contributes O(df²) candidate pairs through the
    shared-token self-join — one stop-shingle in a web corpus is a
    quadratic blowup. With the cap set, hot shingles (a SMALL set, so the
    anti-join broadcasts) are excluded from the token sets BEFORE sizes
    and intersections, bounding per-token join work at max_df² while
    keeping the measure deterministic (capped-set Jaccard). None keeps
    exact full-set semantics for small corpora.
    """
    toks = (_shingles(df, text_col, id_col, n) if n > 1 else _distinct_tokens(df, text_col, id_col))
    if max_df is not None:
        hot = (
            toks.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("tok")
        )
        toks = toks.join(F.broadcast(hot), "tok", "left_anti")
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = toks.select(F.col(id_col).alias("a"), "tok")
    b = toks.select(F.col(id_col).alias("b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 1,
) -> DataFrame:
    """k minhashes per doc: hash_i(tok) = md5(i || ':' || tok), minhash_i =
    min over the doc's token set. md5-hex strings ARE the hash values —
    uniform, deterministic, and portable to any SQL engine."""
    toks = (
        _shingles(df, text_col, id_col, shingle_n)
        if shingle_n > 1
        else _distinct_tokens(df, text_col, id_col)
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("tok")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return toks.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 1,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH: docs agreeing on ALL
    minhashes of any band land in the same bucket; bucket join emits pairs.
    Returns distinct (a < b) candidate pairs.

    Scale: the only shuffles are the signature groupBy and the bucket
    self-join keyed on (band_id, band_hash) — never all-pairs.
    """
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    n_bands = num_hashes // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws(
                    "|", *[F.col(f"mh{b * band_size + j}") for j in range(band_size)]
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    buckets = sigs.select(F.col(id_col), F.explode(bands).alias("bd")).select(
        F.col(id_col), F.col("bd.band_id"), F.col("bd.band_hash")
    )
    a = buckets.select(F.col(id_col).alias("a"), "band_id", "band_hash")
    b = buckets.select(F.col(id_col).alias("b"), "band_id", "band_hash")
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_lsh_star_edges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 1,
) -> DataFrame:
    """CONNECTIVITY-EQUIVALENT candidate edges for clustering: one STAR
    per LSH bucket (bucket-min doc → every other member) instead of the
    all-pairs clique ``minhash_lsh_pairs`` emits.

    An LSH bucket of m documents contributes m·(m-1)/2 clique pairs but
    only m-1 star edges, and the transitive closure is identical (every
    member reaches every other through the bucket minimum), so
    ``connected_components`` over these edges labels EXACTLY the same
    clusters as over the full pair set — while the edge count drops from
    O(Σ m²) to O(docs × bands). On the 10× synthetic corpus this is
    22 M pairs → <0.5 M edges for the same components (optimization
    guide §1.2 step 1: change the distributed algorithm, don't shuffle
    bytes you can prove redundant). Use ``minhash_lsh_pairs`` when the
    *pairs themselves* are the product (similarity reporting); use this
    when they only feed a clustering.

    The per-bucket min is a ``min() OVER (PARTITION BY bucket)`` — one
    hash-partitioned window with no ordering (no sort, map-side-free but
    single pass); a mega-hot bucket costs one task O(m) instead of the
    clique's O(m²) rows, so this is also the skew guard.
    """
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    n_bands = num_hashes // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws(
                    "|", *[F.col(f"mh{b * band_size + j}") for j in range(band_size)]
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    buckets = sigs.select(F.col(id_col), F.explode(bands).alias("bd")).select(
        F.col(id_col), F.col("bd.band_id"), F.col("bd.band_hash")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("band_id", "band_hash")
    return (
        buckets.withColumn("a", F.min(id_col).over(w))
        .filter(F.col(id_col) != F.col("a"))
        .select("a", F.col(id_col).alias("b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _nibble(hexchar: Column) -> Column:
    """hex char → 0..15 (portable: strpos over the hex alphabet)."""
    return F.instr(F.lit("0123456789abcdef"), hexchar) - 1


def simhash16(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash: per token take 16 bits (4 hex nibbles of md5);
    fingerprint bit_j = majority vote over tokens. Bit math is built from
    nibbles so the identical computation runs in the SQL oracle."""
    toks = _distinct_tokens(df, text_col, id_col)
    h = F.md5(F.col("tok"))
    val = None
    for i in range(4):  # 4 nibbles → 16 bits
        nib = _nibble(F.substring(h, i + 1, 1))
        val = nib if val is None else val * 16 + nib
    toks = toks.withColumn("hv", val)
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("hv"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(16)
    ]
    per_doc = toks.groupBy(id_col).agg(*votes)
    sim = None
    for j in range(16):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1)).otherwise(F.lit(0))
        term = bit * (1 << j)
        sim = term if sim is None else sim + term
    return per_doc.select(F.col(id_col), sim.cast("long").alias("simhash"))


def simhash_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Docs sharing an identical simhash (Hamming distance 0 buckets) —
    the bucketing stage of simhash dedup. Returns buckets with ≥2 docs."""
    sh = simhash16(df, text_col, id_col)
    return (
        sh.groupBy("simhash")
        .agg(F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )


def simhash_hamming_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 2,
) -> DataFrame:
    """Near-duplicate pairs within Hamming distance ``max_hamming`` (≤2) of
    the 16-bit simhash — MULTI-PROBE bucketing, not all-pairs: every doc
    probes its fingerprint plus each single-bit flip (17 probes); two
    fingerprints at Hamming distance 0/1/2 share ≥1 probe value, so the
    candidate join is keyed on probe value and per-bucket work stays
    O(bucket²) with 2^16 buckets × 17 probes. Exact distance is then
    bit_count(a XOR b) on candidates only — same plan shape at 64-bit
    fingerprints and any corpus size."""
    if not 0 <= max_hamming <= 2:
        raise ValueError("single-bit multi-probe covers Hamming distance ≤ 2")
    sh = simhash16(df, text_col, id_col)
    probes = F.array(
        F.col("simhash"), *[F.col("simhash").bitwiseXOR(F.lit(1 << j)) for j in range(16)]
    )
    b = sh.select(F.col(id_col), "simhash", F.explode(probes).alias("probe"))
    x = b.select(F.col(id_col).alias("a"), F.col("simhash").alias("sha"), "probe")
    y = b.select(F.col(id_col).alias("b"), F.col("simhash").alias("shb"), "probe")
    return (
        x.join(y, "probe")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.col("sha").bitwiseXOR(F.col("shb"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------

def cosine_expr(a: Column, b: Column) -> Column:
    """Exact cosine over two double arrays — sequential fold, deterministic."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def hyperplane_signs(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 random-hyperplane components: the sign of plane j,
    dimension d is taken from the first hex nibble of md5('j:d'). Pure
    driver-side constants — both the Spark plan and the SQL oracle inline
    the SAME literals, so candidate generation is engine-portable."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{j}:{d}".encode()).hexdigest()[0], 16) >= 8 else -1.0
            for d in range(dim)
        ]
        for j in range(n_planes)
    ]


def embedding_near_dups(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.99,
    n_bands: int = 4,
    band_bits: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold.

    Candidates come from banded random-hyperplane LSH (SimHash over the
    embedding space): bit j = sign(v · h_j) for ``n_bands × band_bits``
    md5-derived ±1 hyperplanes; docs agreeing on ALL bits of any band are
    candidates. P(bit agree) = 1 − θ/π, so recall at the threshold is
    1 − (1 − p^band_bits)^n_bands and — unlike a fixed lead-dimension
    signature — the bucket count (2^band_bits per band) is a PARAMETER:
    at corpus scale raise band_bits so expected bucket size stays bounded
    (E[bucket] = N / 2^band_bits under random signs; see PLANS.md).
    The band join shuffles only (id, band_id, band_hash) — vectors are
    joined back per candidate pair, never carried through the explode.
    Exact cosine (double, sequential fold) filters candidates.
    """
    if dim is None:
        dim = _infer_dim(df, vec_col=vec_col)
        if dim is None:  # empty (or all-NULL) corpus → no pairs
            schema = f"a {df.schema[id_col].dataType.simpleString()}, b {df.schema[id_col].dataType.simpleString()}, cosine double"
            return df.sparkSession.createDataFrame([], schema)
    planes = hyperplane_signs(n_bands * band_bits, dim)
    base, buckets = _hyperplane_buckets(df, vec_col, id_col, planes, n_bands, band_bits)
    pairs = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band_id", "band_hash"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    va = base.select(F.col("id").alias("a"), F.col("v").alias("va"))
    vb = base.select(F.col("id").alias("b"), F.col("v").alias("vb"))
    return (
        pairs.join(va, "a")
        .join(vb, "b")
        .withColumn("cosine", F.round(cosine_expr(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def _infer_dim(*frames, vec_col: str) -> int | None:
    """Embedding dimensionality from the first NON-NULL vector across the
    given frames (one bounded Spark job per probed frame; pass dim
    explicitly to keep plan construction lazy). None ⟺ no vectors —
    a NULL first row must not masquerade as a dimension (F.size of NULL
    is NULL, and building hyperplanes from it would crash downstream)."""
    from pyspark.sql import functions as F

    for df in frames:
        first = (
            df.filter(F.col(vec_col).isNotNull())
            .select(F.size(F.col(vec_col)).alias("d"))
            .first()
        )
        if first is not None and first["d"] is not None:
            return int(first["d"])
    return None


def _hyperplane_buckets(
    df: DataFrame, vec_col: str, id_col: str, planes: list, n_bands: int, band_bits: int
) -> tuple[DataFrame, DataFrame]:
    """(base: id+double vector, buckets: id/band_id/band_hash) for banded
    random-hyperplane LSH — the shared candidate machinery of the
    self-join (embedding_near_dups) and cross-set (embedding_cross_matches)
    paths; same md5-derived ±1 plane literals, same band-hash bytes."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col).alias("id"), v.alias("v"))

    def bit(j: int) -> Column:
        # the ±1 plane is rendered as ONE parsed SQL array literal — the
        # F.lit-per-component form cost one py4j round-trip per scalar
        # (n_planes × dim of them per plan build); integer literals parse
        # to the identical values (guide §1.2: driver-side work counts)
        h = F.expr("array(" + ", ".join(str(int(s)) for s in planes[j]) + ")")
        dot = F.aggregate(
            F.zip_with(F.col("v"), h, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
        return F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0"))

    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat(*[bit(b * band_bits + j) for j in range(band_bits)]).alias(
                    "band_hash"
                ),
            )
            for b in range(n_bands)
        ]
    )
    buckets = base.select("id", F.explode(bands).alias("bd")).select(
        "id", F.col("bd.band_id"), F.col("bd.band_hash")
    )
    return base, buckets


def embedding_cross_matches(
    left: DataFrame,
    right: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.99,
    n_bands: int = 4,
    band_bits: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """CROSS-SET near matches: (a = left id, b = right id, cosine) for
    every pair with cosine ≥ threshold — the semantic-decontamination /
    retrieval-overlap primitive (left = training corpus, right = eval
    set). Both sides hash through the SAME hyperplane bands, so the join
    is band-bucket equality — never |left|×|right|; the right side is a
    benchmark-sized set, so its bucket frame broadcasts.

    Scale mirror of embedding_near_dups: shuffled bytes O(rows × bands)
    of (id, band_id, band_hash); vectors join back per candidate only."""
    if dim is None:
        dim = _infer_dim(left, right, vec_col=vec_col)
        if dim is None:  # both sides empty/all-NULL → no matches
            schema = (
                f"a {left.schema[id_col].dataType.simpleString()}, "
                f"b {right.schema[id_col].dataType.simpleString()}, cosine double"
            )
            return left.sparkSession.createDataFrame([], schema)
    planes = hyperplane_signs(n_bands * band_bits, dim)
    lbase, lbuckets = _hyperplane_buckets(left, vec_col, id_col, planes, n_bands, band_bits)
    rbase, rbuckets = _hyperplane_buckets(right, vec_col, id_col, planes, n_bands, band_bits)
    pairs = (
        lbuckets.select(F.col("id").alias("a"), "band_id", "band_hash")
        .join(
            F.broadcast(rbuckets.select(F.col("id").alias("b"), "band_id", "band_hash")),
            ["band_id", "band_hash"],
        )
        .select("a", "b")
        .distinct()
    )
    va = lbase.select(F.col("id").alias("a"), F.col("v").alias("va"))
    vb = rbase.select(F.col("id").alias("b"), F.col("v").alias("vb"))
    return (
        pairs.join(va, "a")
        .join(F.broadcast(vb), "b")
        .withColumn("cosine", F.round(cosine_expr(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
