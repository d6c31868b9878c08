"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

LLM-data-pipeline extensions (SURVEY.md §2.M) over the ``documents`` table.
All stages are DataFrame ops designed for 100 TB:

- MinHash signatures are per-row expressions (narrow, codegen'd): k hash
  functions simulated as ``min(xxhash64(shingle, seed_i))`` over the shingle
  array — no explode, no shuffle.
- LSH banding groups signatures into b bands of r rows; candidate pairs come
  from a self-equi-join on ``(band_id, band_hash)`` — the *only* shuffle, on
  a uniformly-distributed hash key (no skew). Pair count is bounded by
  bucket sizes, never the n² cross join.
- Verification (exact Jaccard on candidates) touches only candidate pairs.

SimHash packs 64 weighted bit-votes into a long; near-dups are pairs within
a Hamming radius, found by the standard pigeonhole block trick (split the
64-bit key into radius+1 blocks; equal-block join produces candidates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.functions.text import shingles, tokens


def minhash_signature(
    text_col: Column | str,
    num_hashes: int = 16,
    shingle_n: int = 3,
    *,
    pre_shingled: bool = False,
) -> Column:
    """ArrayType(LongType) MinHash signature of a text column.

    Each of the ``num_hashes`` permutations is ``xxhash64(shingle, seed=i)``;
    the signature element is the min over the document's shingle set. Pure
    expression — evaluated JVM-side per row.

    PERF: the shingle expression is referenced by every permutation's
    ``transform``, and Catalyst does not CSE across them — passing raw text
    re-runs shingling ``num_hashes`` times per row. Operators therefore
    project the shingle array into a column FIRST and call with
    ``pre_shingled=True`` (then ``text_col`` IS the shingle array column —
    an attribute, free to reference 16x). Measured at sf0.1: the full LSH
    candidate run drops 104s -> ~3s combining this with the zipped
    :func:`shingles`."""
    sh = (
        (F.col(text_col) if isinstance(text_col, str) else text_col)
        if pre_shingled
        else shingles(text_col, shingle_n)
    )

    def perm_min(i: int):
        # closure over the seed literal — a 2-arg lambda would make
        # F.transform pass the array index as the second parameter
        seed = F.lit(i)
        return F.array_min(F.transform(sh, lambda s: F.xxhash64(s, seed)))

    return F.array(*[perm_min(i) for i in range(num_hashes)])


def minhash_band_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """The PERSISTABLE LSH index of a corpus: ``(id, band, bucket)`` rows,
    bucket = xxhash64 of the band's signature slice. This is the half of
    :func:`minhash_lsh_candidates` a production pipeline LANDS once and
    APPENDS to nightly — incremental near-dup joins only the new docs'
    bucket rows against it (:func:`lsh_candidates_from_buckets`) instead
    of re-signing the whole corpus. The LSH parameters are part of the
    index's identity: rows built at (16, 4, 3) only join against rows
    built with the same (num_hashes, bands, shingle_n)."""
    rows = num_hashes // bands
    # two-step projection: shingle ONCE per row, then let the 16
    # permutations reference the materialized array (CollapseProject keeps
    # the split — it refuses to duplicate non-cheap expressions)
    shingled = df.select(
        F.col(id_col), shingles(text_col, shingle_n).alias("__sh")
    )
    sig = shingled.select(
        F.col(id_col),
        minhash_signature(F.col("__sh"), num_hashes, pre_shingled=True).alias("__sig"),
    )
    return sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(",", *[F.col("__sig")[b * rows + r].cast("string") for r in range(rows)])
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def lsh_candidates_from_buckets(
    new_buckets: DataFrame,
    all_buckets: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate pairs touching at least one NEW document: equi-join the
    increment's ``(band, bucket)`` rows against the full index (existing ∪
    new, SAME LSH parameters). Old×old pairs were emitted by previous runs
    and never recompute, so the join cost scales with the increment's
    bucket matches, not corpus² — the nightly-append regime of A4/A6
    incrementality applied to near-dup. Returns ``(id_a, id_b)`` with
    id_a < id_b, distinct (a new↔new pair matching in several bands
    collapses to one row)."""
    a = new_buckets.alias("a")
    b = all_buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
        )
        .distinct()
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs ``(id_a, id_b)`` with id_a < id_b that agree
    on at least one LSH band (rows-per-band = num_hashes // bands)."""
    banded = minhash_band_buckets(
        df, id_col, text_col, num_hashes, bands, shingle_n
    )
    # the self-join would otherwise execute the signature pipeline TWICE
    # (once per alias); the banded frame is tiny (bands x docs x 2 cols)
    banded = banded.localCheckpoint(eager=True)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.0,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for document pairs.

    With ``candidates`` (from LSH) only those pairs are scored — the scale
    path. Without, every pair sharing ≥1 shingle is scored via an inverted
    index (explode -> self-join on shingle -> pair-count), which is the
    correct small/medium-scale oracle-checkable variant: the n² cross join
    never materializes, only shingle-sharing pairs.
    Returns ``(id_a, id_b, n_common, n_a, n_b, jaccard)``.
    """
    sets_ = df.select(
        F.col(id_col), F.array_distinct(shingles(text_col, shingle_n)).alias("__sh")
    )
    inv = sets_.select(id_col, F.explode("__sh").alias("__s"))
    # set sizes fall out of the inverted index (distinct shingles per doc) —
    # avoids re-running the tokenizer expression on a second scan branch
    sizes = inv.groupBy(id_col).agg(F.count("*").alias("__n"))
    a = inv.alias("a")
    b = inv.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.__s") == F.col("b.__s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    if candidates is not None:
        common = common.join(candidates, ["id_a", "id_b"], "left_semi")
    out = (
        common.join(sizes.withColumnsRenamed({id_col: "id_a", "__n": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({id_col: "id_b", "__n": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "n_common", "n_a", "n_b", "jaccard"
    )


def jaccard_verify_candidates(
    df: DataFrame,
    candidates: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact-Jaccard verification of LSH candidate pairs, candidate-linear:
    join each pair to the two docs' distinct-shingle sets and score with
    ``size(array_intersect)`` — cost scales with |candidates|, never with
    the inverted index (``jaccard_pairs`` without ``candidates`` scores
    every shingle-sharing pair, which is the oracle path, not this one).
    Returns the surviving ``(id_a, id_b)`` pairs."""
    sets_ = df.select(
        F.col(id_col), F.array_distinct(shingles(text_col, shingle_n)).alias("__sh")
    )
    inter = F.size(F.array_intersect("__sh_a", "__sh_b")).cast("double")
    union = (
        F.size("__sh_a") + F.size("__sh_b") - F.size(F.array_intersect("__sh_a", "__sh_b"))
    ).cast("double")
    return (
        candidates.join(
            sets_.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sh_a")),
            "id_a",
        )
        .join(
            sets_.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__sh_b")),
            "id_b",
        )
        .filter(union > 0)
        .filter((inter / union) >= threshold)
        .select("id_a", "id_b")
    )


SIMHASH_BITS = 32


def simhash(text_col: Column | str, bits: int = SIMHASH_BITS) -> Column:
    """SimHash of the token set, packed into a LongType (``bits`` ≤ 62).

    Each token votes ±1 on each low bit of its ``xxhash64``; the fingerprint
    bit is 1 iff the summed vote is positive. Pure expression, no UDF: token
    bits come from the binary-string rendering of the hash (``shiftright``
    needs a static shift amount in Spark, so ``element_at`` over the bin
    chars does column-indexed bit extraction), votes accumulate in one array
    fold, and the final pack uses static per-bit masks.

    NULL text coalesces to ``''`` before tokenizing (round-10, closing the
    round-9 advisory: the md5 twins got this coalesce in round 9 but this
    production path still tokenized raw text, so a NULL-text doc packed to
    fingerprint 0 — every when-condition NULL — while an empty-text doc got
    the real empty-token fingerprint; all simhash families now agree that
    NULL ≡ '').
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.array_distinct(tokens(F.coalesce(c, F.lit(""))))

    def token_votes(t: Column) -> Column:
        chars = F.split(F.lpad(F.bin(F.xxhash64(t)), 64, "0"), "")
        return F.transform(
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda i: F.when(F.element_at(chars, F.lit(64) - i) == "1", 1).otherwise(-1),
        )

    votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0), bits),
        lambda acc, t: F.zip_with(acc, token_votes(t), lambda a, v: a + v),
    )
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out.bitwiseOR(
            F.when(F.element_at(votes, i + 1) > 0, F.lit(1 << i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return out


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs within ``max_hamming`` SimHash distance via the pigeonhole
    trick: split the fingerprint into ``max_hamming + 1`` blocks; any pair
    within the radius must agree exactly on ≥1 block, so an equi-join per
    block yields all candidates (one uniform-key shuffle), then exact
    Hamming distance (``bit_count(a XOR b)``) filters."""
    nblocks = max_hamming + 1
    width = SIMHASH_BITS // nblocks
    fp = df.select(F.col(id_col), simhash(text_col).alias("__fp"))
    blocks = fp.select(
        id_col,
        "__fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("__fp"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for i in range(nblocks)
                ]
            )
        ).alias("b"),
    ).select(id_col, "__fp", "b.blk", "b.val")
    a = blocks.alias("a")
    b = blocks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.__fp").bitwiseXOR(F.col("b.__fp"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def minhash_signature_md5(
    text_col: Column | str,
    num_hashes: int = 16,
    shingle_n: int = 1,
    *,
    pre_shingled: bool = False,
) -> Column:
    """ArrayType(StringType) MinHash signature with md5 permutations
    (``md5(i || ':' || shingle)``, lexicographic min over the shingle set) —
    the cross-engine-reproducible twin of :func:`minhash_signature`, shared
    by the LSH banding and the estimator-quality query. Same
    ``pre_shingled`` contract (pass the DISTINCT shingle array column)."""
    sh = (
        (F.col(text_col) if isinstance(text_col, str) else text_col)
        if pre_shingled
        else F.array_distinct(shingles(text_col, shingle_n))
    )

    def perm_min(i: int):
        # closure over a ready-made literal — a 2-arg lambda would make
        # F.transform pass the array index as the second parameter
        prefix = F.lit(f"{i}:")
        return F.array_min(F.transform(sh, lambda s: F.md5(F.concat(prefix, s))))

    return F.array(*[perm_min(i) for i in range(num_hashes)])


def minhash_estimate_vs_exact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 1,
    threshold: float = 0.3,
) -> DataFrame:
    """Sketch-quality audit: for every pair with exact shingle-Jaccard >=
    ``threshold``, the MinHash estimate (matching signature positions /
    num_hashes) next to the exact value and the signed error.

    This is the measurement every LSH deployment needs before picking
    (num_hashes, bands): E[estimate] = J, stddev = sqrt(J(1-J)/k). The
    estimate is an exact small rational (int/num_hashes) and the exact
    Jaccard a single correctly-rounded division, so the comparison is
    bit-reproducible cross-engine. Returns ``(id_a, id_b, jaccard,
    mh_est, err)``; err = round(mh_est - jaccard, 6).
    """
    pairs = jaccard_pairs(
        df, id_col=id_col, text_col=text_col, shingle_n=shingle_n,
        threshold=threshold,
    )
    shingled = df.select(
        F.col(id_col),
        F.array_distinct(shingles(text_col, shingle_n)).alias("__shd"),
    )
    sig = shingled.select(
        F.col(id_col),
        minhash_signature_md5(
            F.col("__shd"), num_hashes, pre_shingled=True
        ).alias("__sig"),
    )
    sa = sig.select(F.col(id_col).alias("id_a"), F.col("__sig").alias("__sa"))
    sb = sig.select(F.col(id_col).alias("id_b"), F.col("__sig").alias("__sb"))
    matches = F.aggregate(
        F.zip_with(
            F.col("__sa"), F.col("__sb"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    est = matches.cast("double") / F.lit(float(num_hashes))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b", "jaccard",
            est.alias("mh_est"),
            F.round(est - F.col("jaccard"), 6).alias("err"),
        )
    )


def minhash_band_buckets_md5(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """The md5 twin of :func:`minhash_band_buckets` — ``(id, band,
    bucket)`` rows where the bucket key is the comma-joined md5-hex band
    slice, identical in any engine with md5. Same landable-index contract
    as the xxhash64 variant (build once, append increments, equi-join
    candidates); exists so the INCREMENTAL near-dup path is
    oracle-checkable end to end, not just its batch twin."""
    rows = num_hashes // bands
    # shingle once per row; the 16 md5 permutations read the materialized
    # array (same no-CSE-into-lambda economics as minhash_lsh_candidates)
    shingled = df.select(
        F.col(id_col), shingles(text_col, shingle_n).alias("__sh")
    )
    sig = shingled.select(
        F.col(id_col),
        minhash_signature_md5(
            F.col("__sh"), num_hashes, pre_shingled=True
        ).alias("__sig"),
    )
    return sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[F.col("__sig")[b * rows + r] for r in range(rows)],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def minhash_lsh_candidates_md5(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Cross-engine-reproducible MinHash-LSH: permutations are
    ``md5(i || ':' || shingle)`` and the signature element is the
    lexicographic min of the hex digests — identical in any engine with
    md5, so the whole candidate set is oracle-checkable (the xxhash64
    variant stays the faster in-engine default; same plan shape: band
    equi-join on uniform keys, no cross product)."""
    banded = minhash_band_buckets_md5(
        df, id_col, text_col, num_hashes, bands, shingle_n
    )
    # the self-join would otherwise execute the signature pipeline TWICE
    # (once per alias); the banded frame is tiny (bands x docs x 2 cols)
    banded = banded.localCheckpoint(eager=True)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def simhash_md5(text_col: Column | str, bits: int = 60) -> Column:
    """Cross-engine-reproducible SimHash: token hash = first 15 md5 hex
    chars as a 60-bit integer (identical in any md5 engine; 60 bits keeps
    every intermediate — token hash, per-bit mask, packed fingerprint —
    strictly below 2^63, so signed-BIGINT engines like DuckDB replay it
    without unsigned-overflow hazards), each token voting ±1 per low bit.
    Mirrors ``simhash`` (xxhash64, 62-bit) structurally; exists so the
    near-pair set can be bit-verified against a SQL oracle.

    PERF: md5 is evaluated ONCE per token (the ``transform`` into a hash
    array), and bit extraction is integer ``shiftrightunsigned``/AND with
    static shift literals — no per-token binary-string materialization
    (the previous ``lpad(bin())``+``split`` walk dominated the runtime).

    NULL text coalesces to '' BEFORE tokenizing (round-9 fix), so a
    missing document body fingerprints exactly like an empty one —
    ``tokens('') = ['']``, one empty-string token — on this path, the
    aggregation-shaped :func:`simhash_md5_fingerprints`, AND the DuckDB
    oracle (which would otherwise drop NULL-text docs at unnest)."""
    text_col = F.coalesce(
        text_col if isinstance(text_col, Column) else F.col(text_col), F.lit("")
    )
    toks = F.array_distinct(tokens(text_col))
    hashes = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )

    def bit_votes(hv: Column) -> Column:
        # static per-bit shifts (shiftrightunsigned needs a literal amount);
        # hv is a lambda variable, so referencing it `bits` times is free
        return F.array(
            *[
                F.when(
                    F.shiftrightunsigned(hv, i).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
                for i in range(bits)
            ]
        )

    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, hv: F.zip_with(acc, bit_votes(hv), lambda a, v: a + v),
    )
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out.bitwiseOR(
            F.when(F.element_at(votes, i + 1) > 0, F.lit(1 << i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return out


def simhash_md5_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
) -> DataFrame:
    """(id, __fp) 60-bit md5 SimHash fingerprints, computed the
    aggregation-shaped way: explode distinct tokens (one md5+conv per
    token row), then ``bits`` conditional SUMs in a single hash aggregate
    — every operator stays inside whole-stage codegen, and map-side
    partial aggregation reduces the shuffle to ONE row per document no
    matter the token count. Measured ~6x faster than the pure-Column
    ``simhash_md5`` fold (nested ``aggregate``/``zip_with`` lambdas fall
    out of codegen) at sf0.1. Bit-identical to :func:`simhash_md5`
    INCLUDING on NULL/empty text (round-9 fix — plain ``explode`` of the
    un-coalesced tokens silently dropped NULL-text docs where the
    pure-Column fold kept them): text coalesces to '' before tokenizing
    (→ one ``''`` token, same as the pure path and the SQL oracle) and
    ``explode_outer`` belt-and-braces the empty-array case."""
    tok = df.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(tokens(F.coalesce(F.col(text_col), F.lit(""))))
        ).alias("__tk"),
    ).select(
        id_col,
        F.conv(F.substring(F.md5("__tk"), 1, 15), 16, 10).cast("long").alias("__hv"),
    )
    votes = [
        F.sum(
            F.when(
                F.shiftrightunsigned("__hv", i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"__v{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out.bitwiseOR(
            F.when(F.col(f"__v{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return agg.select(F.col(id_col), out.alias("__fp"))


def simhash_near_pairs_md5(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bits: int = 60,
) -> DataFrame:
    """Oracle-checkable twin of ``simhash_near_pairs``: same pigeonhole
    block join, over the md5-based 60-bit fingerprint. With max_hamming=3
    the four blocks are 15 bits wide (32,768 buckets each), so candidate
    growth tracks true near-duplicate density, not n²/buckets — the old
    32-bit/8-bit-block shape produced ~n²/256 candidates and was the single
    most expensive plan in the bench."""
    nblocks = max_hamming + 1
    width = bits // nblocks
    nparts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    src = df.select(F.col(id_col), F.col(text_col).alias("__text"))
    # the per-token hash stage is the compute-heavy part; a single-file
    # local read would run it in ONE task, so widen only when the scan is
    # narrower than the shuffle width (a real multi-file corpus already is)
    if src.rdd.getNumPartitions() < nparts:
        src = src.repartition(nparts)
    fp = simhash_md5_fingerprints(src, id_col, "__text", bits)
    blocks = fp.select(
        id_col,
        "__fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("__fp"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for i in range(nblocks)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "__fp", "bb.blk", "bb.val")
    # the self-join would otherwise evaluate the fingerprint pipeline TWICE
    # (once per alias); the blocks frame is tiny (4 rows/doc). Repartition on
    # the join key first so AQE's small-shuffle coalescing doesn't collapse
    # the (output-heavy) candidate join to a single task.
    blocks = blocks.repartition(nparts, "blk", "val").localCheckpoint(eager=True)
    a = blocks.alias("a")
    b = blocks.alias("b")
    ham = F.bit_count(F.col("a.__fp").bitwiseXOR(F.col("b.__fp")))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken — the MOSS
    algorithm): hash every character k-gram (rolling hash =
    ``functions.text.kgram_hashes``), slide a window of ``w`` consecutive
    hashes, keep each window's minimum, return the distinct selected hashes
    as ``(id, fp)`` rows. Guarantees any shared substring of length
    >= k + w - 1 contributes at least one common fingerprint. Documents with
    fewer than ``w`` k-grams contribute the min over all their hashes.

    Scale shape: hashing is a narrow per-row expression evaluated ONCE per
    document; ``posexplode`` fans out to one row per k-gram; window
    selection is a sliding window-frame ``min`` over rows (O(w) per row,
    JVM-side) — one shuffle on the doc key, which also co-locates the
    per-doc ``distinct``. A pure-Column formulation (array slices inside
    ``F.transform``) re-evaluates the hash array per window — O(n^2) — so
    the row-based plan is deliberate.
    """
    from pyspark.sql import Window

    from unified_firmographic_data_pipeline_spark.functions.text import kgram_hashes

    grams = df.select(
        F.col(id_col),
        F.posexplode(kgram_hashes(text_col, k)).alias("pos", "h"),
    )
    frame = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    whole = Window.partitionBy(id_col)
    return (
        grams.withColumn("wmin", F.min("h").over(frame))
        .withColumn("mx", F.max("pos").over(whole))
        # full windows only (start + w - 1 <= last pos); docs shorter than w
        # k-grams keep the pos-0 row, whose frame min spans the whole doc
        .filter((F.col("pos") + (w - 1) <= F.col("mx")) | (F.col("pos") == 0))
        .select(F.col(id_col), F.col("wmin").alias("fp"))
        .distinct()
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    min_common: int = 2,
) -> DataFrame:
    """Shared-winnowing-fingerprint pairs ``(id_a, id_b, n_common)`` with
    ``id_a < id_b`` and at least ``min_common`` fingerprints in common — the
    MOSS-style plagiarism/near-dup detector over rolling-hash fingerprints.

    Scale shape: after ``winnow_fingerprints`` (one doc-key shuffle), the
    self-equi-join shuffles on the fingerprint hash (uniformly distributed —
    no skew); pair cardinality is bounded by per-fingerprint bucket sizes,
    never n².
    """
    fps = winnow_fingerprints(df, id_col, text_col, k, w)
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def multiset_token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document term-frequency multiset: ``(id, tok, cnt)`` — the
    shared input of the exact and sketched weighted-Jaccard tiers. One
    explode + one map-side-combinable groupBy."""
    return (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def weighted_jaccard_exact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.0,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact weighted (multiset) Jaccard between term-frequency profiles:
    ``J_w = Σ_t min(cnt_a, cnt_b) / Σ_t max(cnt_a, cnt_b)`` — the right
    similarity when REPETITION matters: set Jaccard calls "the the the
    cat" and "the cat" identical; the multiset form does not. Same
    inverted-index shape as :func:`jaccard_pairs` (only token-sharing
    pairs are generated, never the cross product) with the min/max
    identity ``Σ max = |A| + |B| - Σ min`` so the non-shared tail of both
    profiles never joins. With ``candidates`` only those pairs are scored
    (the scale path behind an LSH/banding front).
    Returns ``(id_a, id_b, w_common, w_a, w_b, weighted_jaccard)``."""
    tf = multiset_token_counts(df, id_col, text_col)
    sizes = tf.groupBy(id_col).agg(F.sum("cnt").cast("long").alias("__n"))
    a, b = tf.alias("a"), tf.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.sum(F.least("a.cnt", "b.cnt")).cast("long").alias("w_common"))
    )
    if candidates is not None:
        common = common.join(candidates, ["id_a", "id_b"], "left_semi")
    out = (
        common.join(sizes.withColumnsRenamed({id_col: "id_a", "__n": "w_a"}), "id_a")
        .join(sizes.withColumnsRenamed({id_col: "id_b", "__n": "w_b"}), "id_b")
        .withColumn(
            "weighted_jaccard",
            F.round(
                F.col("w_common").cast("double")
                / (F.col("w_a") + F.col("w_b") - F.col("w_common")).cast("double"),
                6,
            ),
        )
    )
    return out.filter(F.col("weighted_jaccard") >= threshold).select(
        "id_a", "id_b", "w_common", "w_a", "w_b", "weighted_jaccard"
    )


def multiset_minhash_signature_md5(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash over the MULTISET via unary expansion: integer term counts
    make weighted Jaccard exactly the set Jaccard of ``(token, k)`` pairs
    for ``k = 1..cnt`` (each occurrence is its own element — the classic
    reduction; Ioffe's CWS generalizes to real weights, which integer
    term frequencies don't need). So the estimator machinery is plain
    MinHash over the expanded element ``tok || '#' || k`` with the repo's
    md5-permutation device — bit-replayable by a SQL oracle end to end.

    Expansion cost is Σ cnt = the corpus token count, i.e. the same row
    count the tokenizer explode already produced — NOT a blowup; counts
    cap at document length by construction. Returns ``(id, h, m)`` rows
    (num_hashes minima per document)."""
    tf = multiset_token_counts(df, id_col, text_col)
    expanded = tf.select(
        F.col(id_col),
        F.explode(F.expr("sequence(1, cnt)")).alias("k"),
        "tok",
    ).select(
        id_col, F.concat(F.col("tok"), F.lit("#"), F.col("k")).alias("el")
    )
    h = expanded.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("h"),
        "el",
    )
    return h.groupBy(id_col, "h").agg(
        F.min(F.md5(F.concat(F.col("h").cast("string"), F.lit(":"), F.col("el"))))
        .alias("m")
    )


def weighted_jaccard_estimate_vs_exact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.3,
    num_hashes: int = 16,
) -> DataFrame:
    """Calibration frame for the multiset sketch: exact weighted Jaccard
    (pairs above ``threshold``) next to the MinHash estimate (matching
    signature positions / num_hashes) and their signed error — the
    multiset twin of :func:`minhash_estimate_vs_exact`. Estimate cost is
    signature-sized (num_hashes rows per doc), pair generation is the
    exact tier's inverted index."""
    exact = weighted_jaccard_exact(df, id_col, text_col, threshold)
    sig = multiset_minhash_signature_md5(df, id_col, text_col, num_hashes)
    sa = sig.withColumnsRenamed({id_col: "id_a"})
    sb = sig.withColumnsRenamed({id_col: "id_b", "m": "mb"})
    est = (
        exact.select("id_a", "id_b")
        .join(sa, "id_a")
        .join(sb, ["id_b", "h"])
        .groupBy("id_a", "id_b")
        .agg(
            F.round(
                F.count_if(F.col("m") == F.col("mb")).cast("double")
                / F.lit(float(num_hashes)),
                6,
            ).alias("mh_est")
        )
    )
    return exact.join(est, ["id_a", "id_b"]).select(
        "id_a",
        "id_b",
        "weighted_jaccard",
        "mh_est",
        F.round(F.col("mh_est") - F.col("weighted_jaccard"), 6).alias("err"),
    )
