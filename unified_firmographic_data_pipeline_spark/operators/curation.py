"""Corpus-curation operators for LLM training-data pipelines.

Extends the SURVEY §2.M text/dedup family with the remaining standard
pretraining-curation passes (public-knowledge designs: C4's line/window
dedup, Gopher's repetition filters, CCNet's LM quality scoring, benchmark
decontamination, sequence packing). Every operator is DataFrame-first:

- per-document metrics are pure Catalyst expressions (no shuffle at all);
- corpus-level passes shuffle once on a uniform key (token, n-gram hash,
  chunk hash) — never on raw text, never all-pairs;
- scalar corpus statistics (vocabulary size, total token count) stay
  in-plan as 1-row broadcast joins, not driver round-trips.

Doubles destined for the cross-engine oracle are micro-rounded
(``round(x*1e6)`` summed as BIGINT — see ``plans/driver_queries``
module docstring) so results are bit-exact vs DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.functions.text import token_count, tokens


def token_chunks(text_col, width: int = 10, *, pre_tokenized: bool = False):
    """Split a text column into fixed-``width`` token windows ("lines" for
    corpora without newlines) -> ArrayType(StringType). A pure expression:
    chunk assembly costs no shuffle; only the (short) chunk strings flow to
    downstream dedup. The last partial window is kept.

    The token array is sliced inside the per-chunk lambda and Catalyst
    does not CSE into lambda bodies (the :func:`...functions.text.shingles`
    lesson), so passing raw text re-runs the regex tokenizer once per
    chunk. Callers on a hot path should project ``tokens(text)`` into a
    column first and pass it with ``pre_tokenized=True``."""
    t = F.col(text_col) if pre_tokenized and isinstance(text_col, str) else (
        text_col if pre_tokenized else tokens(text_col)
    )
    n_chunks = F.ceil(F.size(t) / F.lit(width)).cast("int")
    # a 0-length (or NULL) token array yields NO chunks — the previous
    # greatest(n_chunks - 1, 0) emitted one md5('')-able empty chunk that a
    # SQL twin's generate_series(0, -1) would not (round-7 ADVICE #2)
    return F.when(
        n_chunks <= 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(" ", F.slice(t, i * width + 1, width)),
        )
    )


def token_windows(
    text_col,
    width: int = 128,
    stride: int = 64,
    *,
    pre_tokenized: bool = False,
):
    """OVERLAPPING sliding token windows -> ArrayType(StringType) — the
    context-window chunker for training-sequence prep (``token_chunks`` is
    the non-overlapping C4-"line" special case ``stride == width``).

    Window ``i`` covers tokens ``[i*stride, i*stride + width)``;
    ``n = 1 + ceil(max(0, size - width) / stride)`` windows, so every token
    is covered, the final window may be partial, and a document shorter
    than ``width`` yields exactly one window. Empty/whitespace-only
    documents yield an EMPTY array (explode drops them) — not one empty
    chunk. Pure expression, no shuffle; same pre-tokenization contract as
    ``token_chunks`` (Catalyst does not CSE into lambda bodies — project
    ``tokens(text)`` first on hot paths)."""
    if width < 1 or stride < 1:
        raise ValueError("width and stride must be >= 1")
    if stride > width:
        raise ValueError("stride > width would skip tokens between windows")
    t = F.col(text_col) if pre_tokenized and isinstance(text_col, str) else (
        text_col if pre_tokenized else tokens(text_col)
    )
    n = (
        F.lit(1)
        + F.ceil(F.greatest(F.size(t) - width, F.lit(0)) / F.lit(stride))
    ).cast("int")
    # ``tokens('')`` is [''] (split never yields []), so "empty" is NULL
    # text, the 0-length array, and the single-empty-token array alike
    empty = (
        t.isNull()
        | (F.size(t) == 0)
        | ((F.size(t) == 1) & (F.try_element_at(t, F.lit(1)) == ""))
    )
    # sequence(0, n-1) is safe: n >= 1 always, so the range never descends
    return F.when(empty, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.concat_ws(" ", F.slice(t, i * stride + 1, width)),
        )
    )


def chunk_documents(
    docs: DataFrame,
    width: int = 128,
    stride: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode documents into training-sequence rows:
    ``(doc_id, chunk_id, chunk_start, n_tokens, chunk_text)`` with
    ``chunk_start`` the 0-based token offset — enough provenance to map a
    training sequence back to its source span (the lineage contract
    dedup/decontamination audits need).

    Scale shape: tokenize once (projected column), window inside the scan
    stage, posexplode — a narrow fan-out whose output row count is
    ~``total_tokens / stride``; no shuffle until whatever comes next."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("__toks")
    )
    win = token_windows("__toks", width, stride, pre_tokenized=True)
    return toks.select(
        "doc_id", F.posexplode(win).alias("chunk_id", "chunk_text")
    ).select(
        "doc_id",
        "chunk_id",
        (F.col("chunk_id") * stride).alias("chunk_start"),
        (F.size(F.split("chunk_text", r"\s+"))).alias("n_tokens"),
        "chunk_text",
    )


def sentence_chunks(
    docs: DataFrame,
    capacity: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sentence-boundary chunking — the semantic tier above
    ``token_windows``: split with Spark's locale-aware ``sentences()``,
    then pack CONSECUTIVE sentences into chunks targeting ``capacity``
    tokens with the same streaming-pack rule as ``pack_sequences``
    (``chunk_id = floor(preceding_tokens / capacity)``). Sentences are
    never split across chunks, so a chunk may overshoot ``capacity`` by
    up to one sentence — the documented greedy-pack tolerance; a sentence
    longer than ``capacity`` owns its chunk(s).

    Returns ``(doc_id, chunk_id, n_sentences, n_tokens, chunk_text)``.
    Scale shape: one narrow sentence explode, ONE window shuffle on the
    doc key (each document packs independently), one groupBy on
    (doc, chunk) — output rows ≈ total_tokens / capacity.

    Splitter semantics (java.text.BreakIterator via ``sentences()``):
    punctuation is dropped from the word arrays, single letters before a
    period read as initials, and a lowercase continuation after a period
    does NOT open a new sentence — lowercase-normalized corpora degrade
    to one sentence per document (= whole-doc chunks); run this BEFORE
    any lowercasing, or fall back to ``token_windows``."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    sent = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.sentences(F.col(text_col))).alias("sent_id", "__words"),
    ).select(
        "doc_id",
        "sent_id",
        F.size("__words").alias("n_tokens"),
        F.array_join("__words", " ").alias("sent_text"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("sent_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    preceding = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    packed = sent.withColumn(
        "chunk_id", F.floor(preceding / F.lit(capacity)).cast("int")
    )
    ordered = F.array_sort(
        F.collect_list(F.struct("sent_id", "sent_text"))
    )
    return (
        packed.groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_sentences"),
            F.sum("n_tokens").cast("int").alias("n_tokens"),
            F.array_join(
                F.transform(ordered, lambda s: s["sent_text"]), " "
            ).alias("chunk_text"),
        )
    )


def boilerplate_chunk_stats(
    docs: DataFrame, width: int = 10, min_docs: int = 3
) -> DataFrame:
    """CCNet-style corpus-level BOILERPLATE detection (Wenzek et al.,
    CCNet, LREC 2020 — paragraph-hash dedup across shards): a fixed-width
    token chunk whose fingerprint occurs in >= ``min_docs`` DISTINCT
    documents is boilerplate (headers, footers, navigation soup — the
    text that repeats across pages rather than within one). Differs from
    :func:`chunk_dedup_stats` (keep-first C4 rule): boilerplate is judged
    by cross-document spread, not mere duplication.

    Per source: (n_docs, n_chunks, n_boiler_chunks, n_docs_clean). Scale
    shape: chunk assembly is a pure expression; the distinct (chunk_fp,
    doc_id) projection and the per-fp document count shuffle on the
    uniform 32-hex fingerprint; the mark-join is fp-keyed equi. Raw text
    never crosses a shuffle — only ``width``-token chunks."""
    chunks = (
        docs.select("doc_id", "source", tokens("text").alias("__toks"))
        .select(
            "doc_id",
            "source",
            F.explode(token_chunks("__toks", width, pre_tokenized=True)).alias(
                "chunk"
            ),
        )
        .select("doc_id", "source", F.md5(F.col("chunk")).alias("chunk_fp"))
    )
    docs_per_fp = (
        chunks.select("chunk_fp", "doc_id")
        .distinct()
        .groupBy("chunk_fp")
        .agg(F.count("*").alias("__nd"))
    )
    per_doc = (
        chunks.join(docs_per_fp, "chunk_fp")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("__n_chunks"),
            F.count(F.when(F.col("__nd") >= min_docs, 1)).alias("__n_boiler"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("__n_chunks").cast("long").alias("n_chunks"),
        F.sum("__n_boiler").cast("long").alias("n_boiler_chunks"),
        F.count(F.when(F.col("__n_boiler") == 0, 1)).cast("long").alias("n_docs_clean"),
    )


def chunk_dedup_stats(docs: DataFrame, width: int = 10) -> DataFrame:
    """C4-style window("line")-level dedup statistics per source: how many
    fixed-width token chunks each source contributes and how many are
    corpus-unique. Scale shape: explode -> md5 chunk key -> per-chunk
    first-owner as a window ``min(doc_id)`` over the fingerprint partition
    (ONE shuffle on the uniform 32-hex key — a groupBy+self-join would
    shuffle the same data and then join it back) -> per-source counts.
    Raw text never moves, only ``width``-token chunks."""
    chunks = (
        docs.select("doc_id", "source", tokens("text").alias("__toks"))
        .select(
            "doc_id",
            "source",
            F.explode(
                token_chunks("__toks", width, pre_tokenized=True)
            ).alias("chunk"),
        )
        .select("doc_id", "source", F.md5(F.col("chunk")).alias("chunk_fp"))
    )
    # corpus-wide: a chunk is "kept" for its first owner (min doc_id),
    # duplicated elsewhere — the C4 rule "keep one occurrence".
    owner_doc = F.min("doc_id").over(Window.partitionBy("chunk_fp"))
    return (
        chunks.withColumn("__owner", owner_doc)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count(F.when(F.col("doc_id") == F.col("__owner"), 1)).alias("n_kept"),
        )
        .withColumn("n_dropped", F.col("n_chunks") - F.col("n_kept"))
    )


def repetition_metrics(docs: DataFrame, flag_threshold: float = 0.2) -> DataFrame:
    """Gopher-style within-document repetition: the fraction of token
    bigrams that are duplicates of an earlier bigram in the same document.
    Pure per-row expressions (array zip + distinct) — zero shuffle,
    whole-stage-codegen'd; the standard pre-filter before expensive
    cross-document dedup."""
    t = tokens("text")
    big = F.zip_with(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    docs = docs.withColumn("__big", big).filter(F.size("__big") >= 1)
    n = F.size("__big").cast("double")
    dup_frac = F.round((n - F.size(F.array_distinct("__big"))) / n, 6)
    return docs.select(
        "doc_id",
        F.size("__big").alias("n_bigrams"),
        dup_frac.alias("dup_bigram_frac"),
        (dup_frac > flag_threshold).alias("flagged"),
    )


def contamination_overlap(
    corpus: DataFrame, testset: DataFrame, n: int = 3, top: int = 25
) -> DataFrame:
    """Benchmark decontamination: count distinct token ``n``-grams each
    corpus document shares with a held-out test set (the n-gram-overlap
    rule used to scrub eval sets from pretraining data). Scale shape: both
    sides explode to distinct (gram, doc) pairs and equi-join on the gram —
    an inverted-index join on a uniform key, never doc x doc."""
    from unified_firmographic_data_pipeline_spark.functions.text import shingles

    test_grams = (
        testset.select(F.explode(shingles("text", n)).alias("gram")).distinct()
    )
    corpus_grams = corpus.select(
        "doc_id", F.explode(shingles("text", n)).alias("gram")
    ).distinct()
    w = Window.orderBy(F.col("n_overlap").desc(), F.col("doc_id"))
    return (
        corpus_grams.join(test_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top)
        .drop("rn")
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int = 256,
    group_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Contiguous sequence packing: assign documents (in deterministic
    ``order_col`` order, independently per ``group_col``) to training
    sequences of at most ``capacity`` tokens — the streaming-pack rule
    ``pack_id = floor(preceding_tokens / capacity)``. One shuffle on the
    group key; each group packs in parallel, which is how a 100 TB corpus
    packs without any global coordination. Documents longer than
    ``capacity`` occupy their own pack(s)."""
    n_tok = token_count("text")
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    preceding = F.coalesce(F.sum("__n_tok").over(w), F.lit(0))
    return (
        docs.withColumn("__n_tok", n_tok)
        .select(
            F.col(group_col),
            F.col(order_col),
            F.col("__n_tok").alias("n_tokens"),
            F.floor(preceding / capacity).cast("long").alias("pack_id"),
        )
    )


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """CCNet-style LM quality proxy: score each document by the mean log
    probability of its tokens under the corpus's own unigram distribution
    (gibberish and boilerplate score low). Two shuffles: token-count
    aggregation (vocabulary-sized output) and the per-document sum. The
    vocabulary joins back broadcast; the corpus total stays in-plan as a
    1-row cross join. Log values are micro-rounded per token and summed as
    BIGINT for cross-engine bit-exactness."""
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("n_tok"))
    total = vocab.agg(F.sum("n_tok").alias("n_total"))
    lnp_micro = F.round(
        F.log(F.col("n_tok").cast("double") / F.col("n_total").cast("double")) * 1e6
    ).cast("long")
    scored = vocab.crossJoin(F.broadcast(total)).select(
        "tok", lnp_micro.alias("lnp_micro")
    )
    return (
        toks.join(F.broadcast(scored), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("lnp_micro").alias("__sum_micro"),
        )
        .select(
            "doc_id",
            "n_tokens",
            ((F.col("__sum_micro").cast("double") / F.lit(1e6)) / F.col("n_tokens"))
            .alias("avg_logprob"),
        )
    )


def bm25_scores(
    docs: DataFrame, query_terms: list[str], k1: float = 1.2, b: float = 0.75
) -> DataFrame:
    """Okapi BM25 relevance of every document to a fixed term set — the
    standard retrieval scorer (Robertson & Walker, TREC-3; the Lucene
    ``(N - df + 0.5)/(df + 0.5) + 1`` idf variant, always positive).

    Shape mirrors ``tfidf_top_terms``: one (doc, term) shuffle for tf, a
    term-keyed df aggregation whose output is bounded by |query_terms| and
    broadcasts back, and the corpus scalars (N, avgdl) ride a 1-row
    broadcast. Per-term scores are micro-rounded and summed as BIGINT so
    the total is order-independent and bit-exact cross-engine. Documents
    matching no term are kept with score 0 (left join) — the filter
    decision belongs to the caller.
    """
    terms = [t.lower() for t in query_terms]
    docs_n = docs.select("doc_id", token_count("text").alias("dl"))
    corpus = docs_n.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .filter(F.col("tok").isin(terms))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("tok").agg(F.count("*").alias("df"))
    # idf in micro units, fixed expression order (ln after the division)
    idf = df_.crossJoin(F.broadcast(corpus)).select(
        "tok",
        F.round(
            F.log(
                (F.col("n_docs").cast("double") - F.col("df") + 0.5)
                / (F.col("df").cast("double") + 0.5)
                + 1.0
            )
            * 1e6
        )
        .cast("long")
        .alias("idf_micro"),
        (F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")).alias(
            "avgdl"
        ),
    )
    term_score_micro = F.round(
        F.col("idf_micro").cast("double")
        * (F.col("tf") * (k1 + 1.0))
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl").cast("double") / F.col("avgdl"))
        )
    ).cast("long")
    per_doc = (
        tf.join(F.broadcast(idf), "tok")
        .join(docs_n, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_matched"),
            F.sum(term_score_micro).alias("__s_micro"),
        )
    )
    return (
        docs_n.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_terms_matched", F.lit(0)).cast("int").alias("n_terms_matched"),
            F.round(
                F.coalesce(F.col("__s_micro"), F.lit(0)).cast("double") / 1e6, 6
            ).alias("bm25"),
        )
    )


def tfidf_top_terms(docs: DataFrame) -> DataFrame:
    """Per-document top TF-IDF term (classic content-keyword extraction):
    tf = in-doc count, idf = ln(N/df) over distinct-document frequency,
    deterministic argmax via a rank window with a term tiebreak. Shuffles
    on (doc, term) then term — both uniform; N stays in-plan as a 1-row
    broadcast. idf is micro-rounded before the tf multiply so scores are
    bit-exact cross-engine."""
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    idf = df_.crossJoin(F.broadcast(n_docs)).select(
        "tok",
        F.round(F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")), 6)
        .alias("idf"),
    )
    scored = tf.join(F.broadcast(idf), "tok").select(
        "doc_id", "tok", (F.col("tf").cast("double") * F.col("idf")).alias("score")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("tok").alias("top_term"), F.round("score", 6).alias("score"))
    )


def repeated_ngram_spans(
    docs: DataFrame, *, n: int = 8, min_docs: int = 2
) -> DataFrame:
    """Exact-substring duplication coverage (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — the
    suffix-array pass re-expressed as a bounded n-gram join, which is the
    shuffle-friendly equivalent for a fixed match length).

    Every token ``n``-gram is hashed (md5 of the joined window — a pure
    expression, built map-side from the token array, no self-join); grams
    appearing in >= ``min_docs`` DISTINCT documents mark their token span
    ``[pos, pos+n-1]`` as duplicated; per-document spans then merge via
    one gaps-and-islands window (overlapping OR adjacent spans coalesce)
    into maximal duplicated regions.

    Returns one row per document: ``total_tokens``, ``n_dup_grams``
    (shared-gram occurrences), ``n_spans`` (merged regions),
    ``dup_tokens`` (tokens covered by any region), and ``dup_pct``.
    Documents with no shared gram survive with zeros.

    Scale: only (doc_id, position, 16-byte gram hash) rows shuffle —
    raw text never moves; the gram-frequency pass is one uniform-key
    aggregation; span merging is a per-doc sort window. Linear in corpus
    tokens end-to-end.
    """
    toks = docs.select("doc_id", tokens("text").alias("t"))
    grams = toks.select(
        "doc_id",
        F.size("t").alias("total_tokens"),
        # guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) instead of being
        # empty, so docs shorter than n need an explicit empty-array branch
        F.posexplode(
            F.expr(
                f"CASE WHEN size(t) >= {n} THEN "
                f"transform(sequence(1, size(t) - {n - 1}), "
                f"i -> md5(array_join(slice(t, i, {n}), ' '))) "
                "ELSE array() END"
            )
        ).alias("gpos", "g"),
    )
    shared = (
        grams.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("g")
    )
    dup = grams.join(shared, "g").select(
        "doc_id", F.col("gpos").alias("s"), (F.col("gpos") + n - 1).alias("e")
    )
    prevw = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    runw = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = dup.withColumn(
        "brk",
        F.when(
            F.max("e").over(prevw).isNull() | (F.col("s") > F.max("e").over(prevw) + 1),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("island", F.sum("brk").over(runw))
    merged = marked.groupBy("doc_id", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me"), F.count("*").alias("n_grams")
    )
    per = merged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum("n_grams").cast("long").alias("n_dup_grams"),
        F.sum(F.col("me") - F.col("ms") + 1).cast("long").alias("dup_tokens"),
    )
    base = toks.select("doc_id", F.size("t").cast("long").alias("total_tokens"))
    return base.join(per, "doc_id", "left").select(
        "doc_id",
        "total_tokens",
        F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0)).cast("double")
            / F.col("total_tokens").cast("double"),
            6,
        ).alias("dup_pct"),
    )


def curriculum_interleave(
    docs: DataFrame,
    order_col,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Curriculum ordering for training-data serving: rank documents
    WITHIN each domain by ``order_col`` descending (best examples first,
    ``id_col`` tiebreak), so that sorting the result by ``(domain_rank,
    domain)`` yields a round-robin interleave across domains — every
    consecutive window of the training stream mixes all domains while
    each domain contributes its highest-ranked remaining example
    (curriculum-learning serving order, Bengio et al. ICML'09, as used
    for pretraining-mixture scheduling).

    The operator adds the ``domain_rank`` column only — one shuffle,
    partitioned BY DOMAIN, never a global window. The total order is the
    caller's range-partitioned sort on ``(domain_rank, domain)`` (Spark's
    ``orderBy`` samples range bounds and sorts in parallel), or simply a
    write partitioned by ``domain_rank`` bands: at 100 TB there is no
    single-reducer global row-number anywhere, and a bounded "first N
    positions" view is a TakeOrdered, not a full sort.

    ``order_col`` may be any expression (e.g. ``quality_score("text")``);
    it is evaluated once. Returns the input columns plus ``domain_rank``.
    """
    w = Window.partitionBy(domain_col).orderBy(
        F.col("__curriculum_order").desc(), F.col(id_col).asc()
    )
    return (
        docs.withColumn("__curriculum_order", order_col)
        .withColumn("domain_rank", F.row_number().over(w))
        .drop("__curriculum_order")
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train_frac: float = 0.8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Cluster-aware train/eval split: assign splits to near-dup CLUSTERS,
    not documents, so two near-duplicates can never straddle train and
    eval — the train/test-contamination mode a plain per-doc hash split
    (``train_eval_split_counts``) cannot rule out (Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" measure
    exactly this leak; GPT-3's contamination analysis is the post-hoc
    version of the same guarantee).

    ``pairs`` is any near-dup pair frame (chunk-fp / LSH / simhash
    candidates); documents are resolved to connected components
    (operators/components.py — min-label propagation, isolated docs are
    their own singleton cluster), then each COMPONENT hashes to a split
    via the engine-exact md5 uniform (operators/sampling.py:hash_uniform)
    compared against ``train_frac``. Split membership is therefore a
    pure function of cluster identity: deterministic across reruns,
    engines, and cluster sizes, and leakage-free by construction.

    Returns ``(id_col, component, split)`` with split in
    {'train', 'eval'}.

    Scale shape: component resolution is the pair graph's iterative
    equi-join (bounded by candidate pairs, never doc×doc); the split is
    one narrow expression on the component label; the join back to docs
    is a keyed equi-join. Nothing here is data-squared."""
    from unified_firmographic_data_pipeline_spark.operators.components import (
        connected_components,
    )
    from unified_firmographic_data_pipeline_spark.operators.sampling import (
        hash_uniform,
    )

    comp = connected_components(
        docs.select(F.col(id_col).alias("node")), pairs, src_col=src_col, dst_col=dst_col
    )
    split = F.when(
        hash_uniform(F.col("component")) < F.lit(train_frac), F.lit("train")
    ).otherwise(F.lit("eval"))
    return comp.select(
        F.col("node").alias(id_col), "component", split.alias("split")
    )
