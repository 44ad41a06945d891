"""Text analysis over the ``documents`` corpus: quality scoring,
language identification, token counting, fingerprinting.

Everything is a narrow per-document projection built from JVM-side
string/array expressions — zero shuffles, scans stream through
whole-stage codegen, which is exactly what a 100 TB corpus filter
stage needs. Aggregation variants (per-language stats) add the one
shuffle their grouping requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pac_spark import catalog
from pac_spark.functions.exact import exact_avg
from pac_spark.functions.prefix import global_running_sums
from pac_spark.operators.text_core import tokens

__all__ = [
    "text_stats",
    "language_id",
    "token_counts",
    "doc_fingerprints",
    "doc_chunks",
    "corpus_quality_by_lang",
    "lang_quality_quantiles",
    "vocab_top_terms",
    "doc_top_terms",
    "unigram_prob_score",
    "doc_repetition_signals",
    "corr_quality_tokens_by_lang",
    "spearman_quality_tokens_by_lang",
    "SPEARMAN_SQL_TAIL",
    "chi2_terms_by_source",
    "CHI2_SQL",
    "bm25_topk_docs",
    "phrase_match_docs",
    "PHRASE_MATCH_SQL",
    "PHRASE_QUERY",
    "BM25_SQL",
    "token_gini_by_source",
    "TOKEN_GINI_SQL",
    "bpe_learn_merges",
    "BPE_SQL",
    "BPE_MERGES",
    "quantile_normalized_quality",
    "vocab_frequency_octaves",
    "OCTAVES_SQL",
    "heaps_vocab_growth",
    "HEAPS_SQL",
    "oov_rate_docs",
    "OOV_SQL",
    "source_vocab_tv_matrix",
    "TV_MATRIX_SQL",
    "bigram_fluency_score",
    "BIGRAM_SQL",
    "doc_surprisal_octaves",
    "SURPRISAL_SQL",
    "langid_confusion_matrix",
    "LANGID_CONFUSION_SQL",
    "collocations_top_lift",
    "COLLOCATIONS_SQL",
    "COLLOC_MIN_SUPPORT",
    "COLLOC_TOP",
]

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

# marker tokens per language for the n-gram-frequency heuristic: in a
# real corpus these come from per-language frequency profiles; the
# deterministic marker sets keep the operator oracle-checkable
LANG_MARKERS = {
    "de": ("der", "und", "nicht", "das"),
    "en": ("the", "and", "not", "this"),
    "es": ("el", "y", "no", "que"),
    "fr": ("le", "et", "pas", "que"),
    "zh": ("de", "le", "bu", "shi"),
}


def _stopword_count(toks: Column) -> Column:
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))


def stats_frame(docs: DataFrame, extra: tuple[str, ...] = ()) -> DataFrame:
    """Quality-stat projection over any frame carrying
    (doc_id, lang, source, n_chars, text); ``extra`` columns pass
    through untouched so callers can fuse their own per-doc
    derivations (e.g. a content hash) into the same single scan.

    quality = 0.4*min(1, tokens/100) + 0.3*unique_ratio
            + 0.3*(1 - stopword_ratio)  — a deterministic stand-in for
    the usual trained quality classifiers, same plan shape.
    """
    projected = docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.length("text").alias("n_chars_computed"),
        tokens(F.col("text")).alias("__toks"),
        *extra,
    )
    toks = F.col("__toks")  # bound once — no per-expression re-split
    n_tokens = F.size(toks)
    n_unique = F.size(F.array_distinct(toks))
    stop_cnt = _stopword_count(toks)
    stop_ratio = stop_cnt / n_tokens
    unique_ratio = n_unique / n_tokens
    quality = (
        0.4 * F.least(F.lit(1.0), n_tokens / F.lit(100.0))
        + 0.3 * unique_ratio
        + 0.3 * (1.0 - stop_ratio)
    )
    return projected.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        "n_chars_computed",
        n_tokens.alias("n_tokens"),
        n_unique.alias("n_unique_tokens"),
        stop_cnt.alias("n_stopwords"),
        F.round(stop_ratio, 8).alias("stopword_ratio"),
        F.round(unique_ratio, 8).alias("unique_ratio"),
        F.round(quality, 8).alias("quality_score"),
        (n_tokens < SHORT_DOC_TOKENS).alias("is_short"),
        *extra,
    )


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document structural stats + a composite quality score."""
    return stats_frame(catalog.load(spark, sf_dir, "documents")).orderBy("doc_id")


def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language guess with a fixed tie-break chain
    (alphabetical by language), compared against the labeled ``lang``."""
    return _langid_scored(
        catalog.load(spark, sf_dir, "documents")
    ).orderBy("doc_id")


def _langid_scored(docs: DataFrame) -> DataFrame:
    """The classifier as a frame-level transform (doc_id/lang/text in)
    — shared by :func:`language_id` (batch, sorted read-off) and the
    streaming confusion-matrix twin, so the stream can never drift
    from the registered classifier (the neardup-admission shared-
    shingling rule). Plan-identical extraction of the r2 body."""
    docs = docs.select(
        "doc_id", "lang", tokens(F.col("text")).alias("__toks")
    )
    toks = F.col("__toks")
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    langs = sorted(LANG_MARKERS)  # tie-break: alphabetical wins
    guess = None
    for lang in reversed(langs):
        if guess is None:
            guess = F.lit(lang)
        else:
            cond = None
            for other in langs:
                if other == lang:
                    continue
                c = (
                    scores[lang] > scores[other]
                    if other < lang
                    else scores[lang] >= scores[other]
                )
                cond = c if cond is None else (cond & c)
            guess = F.when(cond, F.lit(lang)).otherwise(guess)
    return docs.select(
        "doc_id",
        "lang",
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        guess.alias("lang_guess"),
        (F.col("lang") == guess).alias("guess_matches_label"),
    )


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, BPE-ish regex
    pieces (letter runs / digit runs / single other), chars/4
    heuristic."""
    docs = catalog.load(spark, sf_dir, "documents")
    ws = F.size(tokens(F.col("text")))
    # explicit class, not \s: Java's \s includes \x0B, RE2's does not
    # — same cross-engine divergence as name_slug (code-review r8)
    bpe_ish = F.size(
        F.regexp_extract_all(
            "text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]"), 0
        )
    )
    return docs.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        bpe_ish.alias("n_bpe_ish_tokens"),
        F.ceil(F.col("n_chars") / 4).alias("est_tokens_char4"),
    ).orderBy("doc_id")


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: full md5, 64-bit hex prefix, and the
    1-hash minhash over 3-gram shingles (the single-seed version of the
    dedup signature)."""
    from pac_spark.operators.text_core import distinct_shingled

    docs = catalog.load(spark, sf_dir, "documents")
    md5 = F.md5(F.encode("text", "UTF-8"))
    shingled = distinct_shingled(
        docs.select("doc_id", "source", md5.alias("md5_fp"), "text")
    )
    minhash1 = F.array_min(
        F.transform(F.col("sh"), lambda s: F.md5(F.encode(s, "UTF-8")))
    )
    return shingled.select(
        "doc_id",
        "source",
        "md5_fp",
        F.substring("md5_fp", 1, 16).alias("md5_prefix64"),
        minhash1.alias("minhash1"),
    ).orderBy("doc_id")


CHUNK_SIZE = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token-window chunking with overlap — the document →
    training-sample (or RAG-passage) fan-out stage.

    Chunk i covers tokens [i*stride, i*stride + size); the final chunk
    may be short; a doc shorter than one window yields exactly one
    chunk. Pure JVM array expressions (sequence → explode → slice):
    a narrow per-row fan-out that streams through whole-stage codegen —
    no shuffle, no Python.
    """
    docs = catalog.load(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    n = F.size("toks")
    last_idx = F.when(n <= CHUNK_SIZE, F.lit(0)).otherwise(
        F.ceil((n - CHUNK_SIZE) / F.lit(float(CHUNK_STRIDE))).cast("int")
    )
    chunked = docs.filter(n > 0).select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), last_idx)).alias("chunk_idx"),
    )
    chunk = F.slice(F.col("toks"), F.col("chunk_idx") * CHUNK_STRIDE + 1, CHUNK_SIZE)
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    ).orderBy("doc_id", "chunk_idx")


def lang_quality_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality-score quartiles via a two-level histogram —
    the scale-safe restatement of "sort each language and pick
    elements" (VERDICT r3 #2: the previous ``groupBy(lang).
    applyInPandas`` put one language's entire per-document frame in a
    single task, which cannot survive a 40%-one-language 100 TB
    corpus).

    Quantiles are numpy's type-1 "lower" definition
    (``arr[floor(p*(n-1))]`` — NOT SQL ``percentile_disc``, which takes
    the ``ceil(p*n)``-th smallest and differs at q75 when n % 4 == 2):
    pure element selection, so Spark and the oracle (which states the
    naive sorted-array spec) agree bit-for-bit.

    Plan, from the bottom:

    1. the ONLY pass over documents is ``groupBy(lang, quality_score).
       count()`` — map-side combined, one ordinary shuffle; no window,
       sort, or Python task ever sees per-document rows;
    2. a coarse histogram (``floor(score*100)`` bins) is aggregated
       from the score counts — ≤ ~100 rows per language — and a
       running sum over THAT locates, for each target rank
       ``k = floor(p*(n-1))``, the single boundary bin holding it;
    3. the exact quantile value is selected from the score-count rows
       of boundary bins only: a second bounded window (rows = distinct
       scores inside one 0.01-wide quality band) walks to the bin-local
       offset. The selected element is identical to the naive sort —
       bins are monotone in score — so the driver hash check proves
       the histogram plan implements the sorted-array spec exactly.

    Every window partition is bounded by construction (coarse bins per
    language; distinct scores per bin), never by corpus statistics.
    """
    from pac_spark.cache import pin

    # contract (stated in the oracle too): quartiles AND n_docs cover
    # SCORED docs of a KNOWN language — NULL lang cannot attribute,
    # NULL quality (NULL text) cannot rank, and the engines disagree
    # on where NULL sorts
    stats = (
        stats_frame(catalog.load(spark, sf_dir, "documents"))
        .select("lang", "quality_score")
        .filter(F.col("lang").isNotNull() & F.col("quality_score").isNotNull())
    )
    # (1) doc pass: counts per exact score value — pinned, because two
    # branches consume it (coarse histogram + bin-local selection) and
    # recomputation would scan and shuffle the corpus twice
    score_counts = pin(
        stats.groupBy("lang", "quality_score").agg(F.count("*").alias("cnt"))
    )
    binned = score_counts.withColumn(
        "qbin", F.floor(F.col("quality_score") * 100).cast("int")
    )
    # (2) coarse histogram + per-language totals and target ranks
    bin_agg = binned.groupBy("lang", "qbin").agg(F.sum("cnt").alias("bin_cnt"))
    wb = W.partitionBy("lang").orderBy("qbin")
    bin_cum = bin_agg.withColumn(
        "cum_before", F.sum("bin_cnt").over(wb) - F.col("bin_cnt")
    )
    totals = bin_agg.groupBy("lang").agg(F.sum("bin_cnt").alias("n_docs"))
    ps = spark.createDataFrame(
        [(0.25, "q25"), (0.50, "median"), (0.75, "q75")], "p double, stat string"
    )
    # p is dyadic (k/4), so p*(n-1) is float-exact and floor is
    # deterministic on every engine
    targets = totals.crossJoin(F.broadcast(ps)).select(
        "lang", "stat", F.floor(F.col("p") * (F.col("n_docs") - 1)).alias("k")
    )
    boundary = (
        bin_cum.join(F.broadcast(targets), "lang")
        .filter(
            (F.col("cum_before") <= F.col("k"))
            & (F.col("k") < F.col("cum_before") + F.col("bin_cnt"))
        )
        .select(
            "lang", "qbin", "stat", (F.col("k") - F.col("cum_before")).alias("offset")
        )
    )
    # (3) bin-local element selection over score-count rows
    wd = W.partitionBy("lang", "qbin", "stat").orderBy("quality_score")
    vals = (
        binned.join(F.broadcast(boundary), ["lang", "qbin"])
        .withColumn("cum", F.sum("cnt").over(wd))
        .filter(
            (F.col("cum") - F.col("cnt") <= F.col("offset"))
            & (F.col("offset") < F.col("cum"))
        )
        .groupBy("lang")
        .agg(
            *[
                F.max(
                    F.when(F.col("stat") == s, F.col("quality_score"))
                ).alias(s)
                for s in ("q25", "median", "q75")
            ]
        )
    )
    return (
        totals.join(vals, "lang")
        .select("lang", "n_docs", "q25", "median", "q75")
        .orderBy("lang")
    )


VOCAB_TOP_N = 100


def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary induction: total occurrences + document
    frequency per term, top ``VOCAB_TOP_N`` by count — the frequency
    table a tokenizer-training (BPE/unigram) or stopword-mining stage
    starts from.

    The classic wordcount shape, which is exactly why it belongs in
    the engine: explode → groupBy(term) is one map-side-combined
    shuffle; doc frequency rides the same aggregate as a distinct
    count; the top-N is TakeOrderedAndProject (per-partition heaps,
    no global sort). Ordering is total (count desc, term asc — terms
    unique), so the result is deterministic at any partitioning.
    """
    docs = catalog.load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    return (
        docs.groupBy("term")
        .agg(
            F.count("*").alias("term_count"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("term_count"), F.asc("term"))
        .limit(VOCAB_TOP_N)
    )


def vocab_frequency_octaves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf heavy-tail diagnostic: the corpus term-frequency
    distribution bucketed by frequency OCTAVE (floor(log2(tf))) — per
    octave the number of vocabulary types and their total token mass.
    Under a Zipf(1) corpus the type count roughly halves per octave
    and octave 0 is the hapax band; a corpus whose octave histogram
    deviates hard (e.g. a fat duplicate band at high octaves) is the
    first thing dedup/curation should look at, and the histogram is
    what sizes a tokenizer's vocabulary cut.

    Exactness: the octave is ``length(bin(tf)) - 1`` — an INTEGER
    floor-log2 via the binary rendering, identical in both engines
    for any positive BIGINT (no float log anywhere, the
    assortativity ln-avoidance rule). Scale shape: the one wordcount
    shuffle (map-side combined), then a map-side octave aggregate
    over the vocabulary-sized frame — Heaps'-law bounded, the
    ``bpe_learn_merges`` argument.
    """
    docs = catalog.load(spark, sf_dir, "documents").select(
        F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = docs.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    return (
        tf.select(
            (F.length(F.bin(F.col("tf"))) - 1).cast("long").alias("octave"),
            "tf",
        )
        .groupBy("octave")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum("tf").cast("long").alias("n_tokens"),
        )
        .orderBy("octave")
    )


OCTAVES_SQL = """
WITH t AS (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT term, COUNT(*) AS tf FROM t GROUP BY term)
SELECT CAST(length(bin(tf)) - 1 AS BIGINT) AS octave,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(tf) AS BIGINT) AS n_tokens
FROM tf GROUP BY 1 ORDER BY octave
"""


def corpus_quality_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level rollup of the quality stats: one shuffle, exact
    averages (order-independent) per language."""
    stats = text_stats(spark, sf_dir)
    return (
        stats.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            exact_avg(F.col("quality_score"), scale=8).alias("avg_quality"),
            F.sum(F.col("is_short").cast("long")).alias("n_short_docs"),
        )
        .orderBy("lang")
    )


TOP_TERMS_PER_DOC = 3


def doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: the ``TOP_TERMS_PER_DOC``
    terms with the highest tf-idf-style relevance, idf in rational
    form ``N / df`` (not ``ln(N/df)``) so every intermediate is exact
    integer arithmetic and the one double division is bit-identical
    across engines — the log is a monotone transform of the same
    per-term quantity and would add nothing but float noise here.

    Shape: tokenize → per-(doc, term) counts (one map-side-combined
    shuffle) → document frequency per term (same exchange reused by
    AQE where possible) → score join → per-doc top-k window. The
    window partitions by doc_id, so a task holds one document's
    distinct terms — bounded by document length, safe at any corpus
    size. Ordering (score desc, term asc) is total within a doc;
    results are deterministic at any partition count.
    """
    docs = catalog.load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    doc_term = docs.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_tbl = doc_term.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = catalog.load(spark, sf_dir, "documents").agg(
        F.count("*").alias("_n_docs")
    )
    scored = (
        doc_term.join(df_tbl, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf") * F.col("_n_docs")).cast("double")
            / F.col("df").cast("double"),
        )
    )
    top = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(top).cast("int"))
        .filter(F.col("term_rank") <= TOP_TERMS_PER_DOC)
        .select("doc_id", "term_rank", "term", "tf", "df", "score")
        .orderBy("doc_id", "term_rank")
    )


def unigram_prob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model fluency score per document (the CCNet-
    style corpus-LM quality gate): the mean corpus probability of the
    document's tokens. Junk documents full of rare tokens score low;
    fluent documents built from common words score high.

    The classical form averages ``-ln p(tok)``; this uses the linear
    mean of ``p(tok)`` instead, for the same reason as
    :func:`doc_top_terms` — the token-mass numerator stays an exact
    BIGINT sum (order-independent at any partition count, no
    transcendental whose last ulp differs between engines), and the
    scoring stays a meaningful fluency signal.

    Shape: tokenize → corpus term counts (one wordcount shuffle) →
    re-join tokens to counts on term → per-doc integer mass sum →
    one double division against the 1-row broadcast total. The
    tokenized frame is pinned (it feeds the wordcount AND the re-join)
    and the corpus token total is a SUM over the vocab-sized tf frame,
    not a second tokenize-explode pass of the corpus (code-review r7).
    """
    from pac_spark.cache import pin

    toks = pin(
        catalog.load(spark, sf_dir, "documents").select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("term")
        )
    )
    tf = pin(toks.groupBy("term").agg(F.count("*").alias("cnt")))
    total = tf.agg(F.sum("cnt").alias("_total_tokens"))
    return (
        toks.join(tf, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("_mass"),
            F.count("*").alias("n_tokens"),
        )
        .join(F.broadcast(total))
        .select(
            "doc_id",
            "n_tokens",
            (
                F.col("_mass").cast("double")
                / (
                    F.col("n_tokens").cast("double")
                    * F.col("_total_tokens").cast("double")
                )
            ).alias("avg_token_prob"),
        )
        .orderBy("doc_id")
    )


# Gopher-style repetition thresholds: a document whose single most
# frequent bigram exceeds this share of all bigrams, or whose
# duplicated-token mass exceeds this share of all tokens, is flagged
REP_TOP_BIGRAM_MAX = 0.18
REP_DUP_TOKEN_MAX = 0.60


def _max_run(col: str) -> Column:
    """Most frequent element of an already-SORTED array column + its
    count, as ``struct(val, cnt)`` — one linear scan over the array,
    ties broken toward the lexicographically smallest element (the
    sorted order plus a strictly-greater update rule guarantees it).

    This is the zero-shuffle mode computation: sorting each document's
    own array is O(len log len) per row inside whole-stage codegen,
    vs the explode → groupBy(doc, elem) → window alternative that
    shuffles every token occurrence in the corpus twice. Per-row work
    is bounded by document length, which the chunking stage bounds
    upstream — the right trade at 100 TB where shuffle bytes, not
    per-core arithmetic, are the scarce resource.
    """
    return F.expr(
        f"""CASE WHEN size({col}) = 0
          THEN named_struct('val', CAST(NULL AS STRING), 'cnt', 0)
          ELSE aggregate(
            slice({col}, 2, size({col}) - 1),
            named_struct('cur', {col}[0], 'run', 1, 'val', {col}[0], 'cnt', 1),
            (acc, x) -> IF(x = acc.cur,
              named_struct('cur', x, 'run', acc.run + 1,
                           'val', IF(acc.run + 1 > acc.cnt, x, acc.val),
                           'cnt', greatest(acc.run + 1, acc.cnt)),
              named_struct('cur', x, 'run', 1, 'val', acc.val, 'cnt', acc.cnt)),
            acc -> named_struct('val', acc.val, 'cnt', acc.cnt))
          END"""
    )


def doc_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals (the Gopher repetition-filter
    family): most-frequent token and bigram with their corpus-share
    fractions, duplicated-token mass, and the composite flag.

    Everything is computed from each document's own token array —
    sort + linear scan per row, no explode, no shuffle; the whole
    operator is one narrow codegen projection over the scan, like
    every other per-doc stage in this module.
    """
    from pac_spark.operators.text_core import shingles_of_tokens

    # NULL-text docs are dropped on BOTH sides: the oracle's unnest
    # CTE never emits them, and a row of NULL metrics would diverge
    # (code-review r7 — the one registered text spec whose NULL paths
    # disagreed)
    docs = (
        catalog.load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", tokens(F.col("text")).alias("__toks"))
    )
    arrays = docs.select(
        "doc_id",
        F.size("__toks").alias("n_tokens"),
        F.size(F.array_distinct("__toks")).alias("n_unique_tokens"),
        F.array_sort("__toks").alias("__stoks"),
        F.array_sort(shingles_of_tokens("__toks", 2)).alias("__sbigs"),
    )
    picked = arrays.select(
        "doc_id",
        "n_tokens",
        "n_unique_tokens",
        _max_run("__stoks").alias("__mt"),
        _max_run("__sbigs").alias("__mb"),
    )
    n = F.col("n_tokens")
    top_tok_frac = F.round(F.col("__mt.cnt") / n, 8)
    top_big_frac = F.when(
        n >= 2, F.round(F.col("__mb.cnt") / (n - F.lit(1)), 8)
    ).otherwise(F.lit(0.0))
    dup_frac = F.round((n - F.col("n_unique_tokens")) / n, 8)
    return picked.select(
        "doc_id",
        "n_tokens",
        F.col("__mt.val").alias("top_token"),
        F.col("__mt.cnt").cast("int").alias("top_token_cnt"),
        top_tok_frac.alias("top_token_frac"),
        F.col("__mb.val").alias("top_bigram"),
        F.col("__mb.cnt").cast("int").alias("top_bigram_cnt"),
        top_big_frac.alias("top_bigram_frac"),
        dup_frac.alias("dup_token_frac"),
        (
            (top_big_frac > F.lit(REP_TOP_BIGRAM_MAX))
            | (dup_frac > F.lit(REP_DUP_TOKEN_MAX))
        ).alias("is_repetitive"),
    ).orderBy("doc_id")


QUALITY_SCALE = 10**8  # quality_score carries 8 rounded decimals

# docs under this token count are flagged is_short (and gated out of
# curation); oracles interpolate it rather than re-hardcoding 20
SHORT_DOC_TOKENS = 20


def corr_quality_tokens_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Pearson correlation between quality score and
    document length — the curation diagnostic that tells you whether a
    quality gate is secretly a length gate.

    Native ``corr()`` is NOT engine-portable: its streaming covariance
    accumulates doubles in partition order, so Spark's aggregation tree
    and a serial oracle disagree in the last ulps. Here every moment
    (Σx, Σy, Σxy, Σx², Σy²) is an exact BIGINT sum of integers
    (quality at its 8-decimal scale), associative at any partition
    count, and the one double formula runs identically on both engines
    — bit-identical correlation, hash-checkable like any other query.
    Moment sums accumulate in decimal(38,0): per-row products fit
    BIGINT (x² ≤ 10¹⁶), but Σx² outgrows 2⁶³ at ~922 rows/group of
    top quality — the r4 BIGINT version guarded that bound with an
    assert and refused larger groups (it fired at sf0.1). 38-digit
    exact sums push the bound to ~10²² rows per group, far past any
    real corpus, with the identical value semantics: DuckDB's
    SUM(BIGINT) already runs in HUGEINT (int128), and both engines'
    exact-integer → double casts round to the same IEEE nearest.
    """
    stats = stats_frame(catalog.load(spark, sf_dir, "documents"))
    x = F.round(F.col("quality_score") * QUALITY_SCALE).cast("long")
    y = F.col("n_tokens").cast("long")
    dec = "decimal(38,0)"
    agg = (
        stats.select("lang", x.alias("x"), y.alias("y"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("x").cast(dec)).alias("sx"),
            F.sum(F.col("y").cast(dec)).alias("sy"),
            F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
            F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"),
            F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        )
    )
    n, sx, sy = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxx, syy, sxy = (F.col(c).cast("double") for c in ("sxx", "syy", "sxy"))
    num = n * sxy - sx * sy
    den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    # zero-variance groups (all values tied) and singleton groups:
    # ANSI Spark throws DIVIDE_BY_ZERO where DuckDB's division yields
    # NULL — guard explicitly so both engines state NULL (caught by
    # the spearman crafted corpus's all-tied group, r6)
    null_d = F.lit(None).cast("double")
    return agg.select(
        "lang",
        F.col("n").alias("n_docs"),
        F.when(den == 0, null_d).otherwise(num / den).alias(
            "corr_quality_tokens"
        ),
        F.when(n == 1, null_d)
        .otherwise(num / (n * (n - F.lit(1.0)) * F.lit(float(QUALITY_SCALE))))
        .alias("cov_quality_tokens"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# Discriminative terms (chi-square feature selection)

CHI2_TOP_TERMS = 50  # candidate vocabulary (by document frequency)
CHI2_PER_SOURCE = 10  # reported terms per source


def chi2_terms_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square discriminative terms per source: for each of the
    top-``CHI2_TOP_TERMS`` document-frequency terms, the 2×2
    presence/source contingency statistic, top ``CHI2_PER_SOURCE``
    per source — the classic feature-selection readout ("which terms
    characterize this slice of the corpus"), and the drift diagnostic
    between ingestion sources.

    Every cell of the contingency table is an exact integer from TWO
    shuffles (distinct (doc, term) presence rows; then term and
    term×source counts — the per-source totals and the corpus total
    are broadcast frames). The candidate cut is
    TakeOrderedAndProject with a total ordering (df desc, term). The
    chi-square value is one double expression over the four exact
    cells, written identically in the oracle — factors are cast to
    double BEFORE multiplying, so nothing overflows at any corpus
    size (the statistic, not the intermediate, is the contract).
    Per-source ranking uses (chi2 desc, term) — bit-identical doubles
    on both engines, so the cut is deterministic.
    """
    docs = catalog.load(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    from pac_spark.cache import pin

    presence = pin(
        docs.select(
            "doc_id", "source", F.explode(tokens(F.col("text"))).alias("term")
        ).distinct()
    )
    top_terms = (
        presence.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_t"))
        .orderBy(F.desc("df_t"), "term")
        .limit(CHI2_TOP_TERMS)
    )
    doc_sources = presence.select("doc_id", "source").distinct()
    n_by_source = doc_sources.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_s")
    )
    n_total = doc_sources.agg(F.count(F.lit(1)).alias("n"))
    df_ts = (
        presence.join(F.broadcast(top_terms), "term")
        .groupBy("term", "source", "df_t")
        .agg(F.count(F.lit(1)).alias("a"))
    )
    cells = (
        df_ts.join(F.broadcast(n_by_source), "source")
        .crossJoin(F.broadcast(n_total))
        .select(
            "source",
            "term",
            "a",
            (F.col("df_t") - F.col("a")).alias("b"),
            (F.col("n_s") - F.col("a")).alias("c"),
            (F.col("n") - F.col("df_t") - F.col("n_s") + F.col("a")).alias("d"),
            "n",
        )
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    det = dbl("a") * dbl("d") - dbl("b") * dbl("c")
    den = (
        (dbl("a") + dbl("b"))
        * (dbl("c") + dbl("d"))
        * (dbl("a") + dbl("c"))
        * (dbl("b") + dbl("d"))
    )
    # a zero marginal (term in EVERY doc, or a source covering the
    # whole corpus) makes the table degenerate: chi2 is defined 0 —
    # no measurable association — rather than thrown (Spark 4 ANSI
    # mode raises on double division by zero) or NULL (DuckDB)
    chi2 = F.when(den > 0, (dbl("n") * det * det) / den).otherwise(F.lit(0.0))
    w = W.partitionBy("source").orderBy(F.desc("chi2"), "term")
    return (
        cells.select("source", "term", F.col("a").alias("docs_with_term"), chi2.alias("chi2"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= CHI2_PER_SOURCE)
        .select("source", F.col("rnk").alias("rank"), "term", "docs_with_term", "chi2")
        .orderBy("source", "rank")
    )


def CHI2_SQL() -> str:
    """Registered in the r7 rotation (gate: tests/test_staged_specs.py)."""
    return f"""
WITH presence AS (
    SELECT DISTINCT doc_id, source, term
    FROM (SELECT doc_id, source, UNNEST(string_split(text, ' ')) AS term
          FROM documents)
),
top_terms AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df_t
    FROM presence GROUP BY term
    ORDER BY df_t DESC, term LIMIT {CHI2_TOP_TERMS}
),
doc_sources AS (SELECT DISTINCT doc_id, source FROM presence),
n_by_source AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s FROM doc_sources GROUP BY source
),
n_total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM doc_sources),
df_ts AS (
    SELECT p.term, p.source, t.df_t, CAST(COUNT(*) AS BIGINT) AS a
    FROM presence p JOIN top_terms t USING (term)
    GROUP BY p.term, p.source, t.df_t
),
cells AS (
    SELECT d.source, d.term, d.a,
           d.df_t - d.a AS b,
           s.n_s - d.a AS c,
           t.n - d.df_t - s.n_s + d.a AS d,
           t.n
    FROM df_ts d
    JOIN n_by_source s USING (source)
    CROSS JOIN n_total t
),
scored AS (
    SELECT source, term, a AS docs_with_term,
           CASE WHEN (CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
                     * (CAST(c AS DOUBLE) + CAST(d AS DOUBLE))
                     * (CAST(a AS DOUBLE) + CAST(c AS DOUBLE))
                     * (CAST(b AS DOUBLE) + CAST(d AS DOUBLE)) > 0
                THEN (CAST(n AS DOUBLE)
                          * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                                 - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
                          * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                                 - CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
                     / ((CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
                        * (CAST(c AS DOUBLE) + CAST(d AS DOUBLE))
                        * (CAST(a AS DOUBLE) + CAST(c AS DOUBLE))
                        * (CAST(b AS DOUBLE) + CAST(d AS DOUBLE)))
                ELSE 0.0 END AS chi2
    FROM cells
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY chi2 DESC, term) AS rank
    FROM scored
)
SELECT source, CAST(rank AS INT) AS rank, term, docs_with_term, chi2
FROM ranked WHERE rank <= {CHI2_PER_SOURCE}
ORDER BY source, rank
"""


# ---------------------------------------------------------------------------
# BM25 retrieval


# a standing keyword query a curation pipeline would run against the
# corpus; fixed here so Spark and the oracle share one definition
BM25_QUERY_TERMS = ("merge", "window", "stream", "hash")
BM25_TOP_K = 20
# k1 = 1.2, b = 0.75 — the standard defaults, carried through the
# arithmetic below as the integer ratios 220/100 (k1+1), 30/100
# (k1*(1-b)) and 90/100 (k1*b)
_FP_SCALE = 1_000_000_000


def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``BM25_TOP_K`` documents for a standing keyword query under
    BM25 ranking (k1=1.2, b=0.75) — the retrieval scorer a corpus
    search / dedup-adjacent curation stage runs at scale.

    Determinism over float folklore: BM25's tf saturation
    ``tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` is computed as ONE
    division of two exact integers (clear denominators: with S = total
    corpus tokens and N = docs, the term equals
    ``220*tf*S / (100*tf*S + 30*S + 90*dl*N)``), and the idf factor is
    the rational Robertson form ``(2N - 2*df + 1) / (2*df + 1)``
    WITHOUT the customary log wrap: a log's last-ulp is libm-dependent
    and this engine's results must hash-match a foreign oracle
    bit-for-bit. Rankings keep BM25's structure (saturating in tf,
    decreasing in df, length-normalized); only the idf tail weighting
    differs from Lucene's ``ln`` flavor, which a deployment can restore
    where cross-engine hashing isn't a contract.

    Per-term contributions are floored to integer 1e-9 fixed point
    BEFORE summing, so the per-doc score is an order-free integer sum
    — no float-accumulation nondeterminism — and the top-k cut orders
    by (score_fp desc, doc_id) — total, partition-invariant.

    Scale shape: the token array is filtered to query terms BEFORE the
    explode (fan-out bounded by query size, not document length); df
    and corpus totals are term-count/1-row broadcasts; the cut is
    TakeOrderedAndProject. One data shuffle (per-doc regroup).
    """
    docs = catalog.load(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    q = F.array(*[F.lit(t) for t in BM25_QUERY_TERMS])
    hits = docs.select(
        "doc_id",
        F.size("toks").alias("dl"),
        F.explode(F.filter("toks", lambda t: F.array_contains(q, t))).alias("term"),
    )
    doc_term = hits.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))
    dfreq = doc_term.groupBy("term").agg(F.count("*").alias("df"))
    corpus = docs.agg(
        F.count("*").alias("n_docs"), F.sum(F.size("toks")).alias("s_tokens")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = (
        dec(F.lit(220))
        * dec(F.col("tf"))
        * dec(F.col("s_tokens"))
        * dec(F.lit(2) * F.col("n_docs") - F.lit(2) * F.col("df") + F.lit(1))
    )
    den = (
        dec(F.lit(100)) * dec(F.col("tf")) * dec(F.col("s_tokens"))
        + dec(F.lit(30)) * dec(F.col("s_tokens"))
        + dec(F.lit(90)) * dec(F.col("dl")) * dec(F.col("n_docs"))
    ) * dec(F.lit(2) * F.col("df") + F.lit(1))
    contrib = doc_term.join(F.broadcast(dfreq), "term").crossJoin(
        F.broadcast(corpus)
    ).select(
        "doc_id",
        F.floor(
            num.cast("double") / den.cast("double") * F.lit(float(_FP_SCALE))
        ).alias("c_fp"),
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_terms_matched"),
            F.sum("c_fp").alias("score_fp"),
        )
        .orderBy(F.desc("score_fp"), F.asc("doc_id"))
        .limit(BM25_TOP_K)
        .select(
            "doc_id",
            "n_terms_matched",
            (F.col("score_fp").cast("double") / _FP_SCALE).alias("score"),
        )
    )


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)

# STAGED for the r7 rotation (gate: tests/test_staged_specs.py). A plain
# module string like the other staged oracles so QuerySpec registration
# cannot accidentally pass a callable (code-review r6).
BM25_SQL = f"""
WITH docs AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), hits AS (
    SELECT doc_id, len(toks) AS dl, u.term
    FROM docs, UNNEST(toks) AS u(term)
    WHERE u.term IN ({_BM25_TERMS_SQL})
), doc_term AS (
    SELECT doc_id, dl, term, COUNT(*) AS tf FROM hits GROUP BY 1, 2, 3
), dfreq AS (
    SELECT term, COUNT(*) AS df FROM doc_term GROUP BY term
), corpus AS (
    SELECT COUNT(*) AS n_docs, SUM(len(toks)) AS s_tokens FROM docs
), contrib AS (
    SELECT doc_id,
           FLOOR(
             CAST(CAST(220 AS DECIMAL(38,0)) * tf * s_tokens
                  * (2 * n_docs - 2 * df + 1) AS DOUBLE)
             / CAST((CAST(100 AS DECIMAL(38,0)) * tf * s_tokens
                     + CAST(30 AS DECIMAL(38,0)) * s_tokens
                     + CAST(90 AS DECIMAL(38,0)) * dl * n_docs)
                    * (2 * df + 1) AS DOUBLE)
             * {float(_FP_SCALE)}) AS c_fp
    FROM doc_term JOIN dfreq USING (term), corpus
)
SELECT doc_id,
       CAST(COUNT(*) AS INT) AS n_terms_matched,
       CAST(SUM(c_fp) AS DOUBLE) / {_FP_SCALE} AS score
FROM contrib
GROUP BY doc_id
ORDER BY SUM(c_fp) DESC, doc_id
LIMIT {BM25_TOP_K}
"""


# ---------------------------------------------------------------------------
# Token diversity (Gini impurity)


def token_gini_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token diversity: Gini impurity ``1 - sum(p_i^2)`` of
    the unigram distribution, plus the top-term share — the "is this
    source templated boilerplate?" screen a corpus mix runs next to
    the per-document repetition signals.

    Gini is chosen over Shannon entropy deliberately: it is the same
    monotone "diversity" readout but entirely RATIONAL — ``(n^2 -
    sum(c_i^2)) / n^2`` — so the whole statistic is exact integer
    arithmetic (decimal(38,0) squares) until one final double
    division, where entropy's ``ln`` would tie the hash to libm
    rounding (the repo-wide determinism rule; see ``bm25_topk_docs``).

    Scale shape: wordcount regroup (map-side combined) then a
    source-sized aggregate; nothing else. Squares are summed in
    decimal(38,0), exact to ~1e19 tokens per term.
    """
    docs = catalog.load(spark, sf_dir, "documents").select(
        "source", F.explode(tokens(F.col("text"))).alias("term")
    )
    counts = docs.groupBy("source", "term").agg(F.count("*").alias("c"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    per_source = counts.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_terms"),
        F.max("c").alias("c_max"),
        F.sum(dec("c") * dec("c")).alias("sumsq"),
    )
    n2 = dec("n_tokens") * dec("n_tokens")
    return per_source.select(
        "source",
        "n_tokens",
        "n_terms",
        (F.col("c_max").cast("double") / F.col("n_tokens").cast("double")).alias(
            "top_share"
        ),
        ((n2 - F.col("sumsq")).cast("double") / n2.cast("double")).alias("gini"),
    ).orderBy("source")


TOKEN_GINI_SQL = """
WITH counts AS (
    SELECT source, u.term, COUNT(*) AS c
    FROM documents, UNNEST(string_split(text, ' ')) AS u(term)
    GROUP BY source, u.term
), per_source AS (
    SELECT source,
           SUM(c) AS n_tokens,
           COUNT(*) AS n_terms,
           MAX(c) AS c_max,
           SUM(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))) AS sumsq
    FROM counts GROUP BY source
)
SELECT source,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_terms AS BIGINT) AS n_terms,
       CAST(c_max AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_share,
       CAST(CAST(n_tokens AS DECIMAL(38,0)) * CAST(n_tokens AS DECIMAL(38,0))
            - sumsq AS DOUBLE)
           / CAST(CAST(n_tokens AS DECIMAL(38,0))
                  * CAST(n_tokens AS DECIMAL(38,0)) AS DOUBLE) AS gini
FROM per_source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# BPE merge induction (tokenizer training)


BPE_MERGES = 8  # merge-table prefix learned by the demo query
BPE_WORD_RE = "^[a-z]+$"  # vocab admission: ascii-letter word types
BPE_WORD_MAXLEN = 20


def _bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq, syms) — the word-type frequency table BPE trains
    on, symbols initialized to single characters. Bounded by VOCAB
    SIZE (Heaps' law: ~10^6-10^7 types even at 100 TB), not corpus
    size — the one wordcount shuffle is the only pass over raw text.
    The admission regex also guarantees symbols are plain lowercase
    letters, so merge literals can be inlined into expressions
    without escaping on either engine."""
    docs = catalog.load(spark, sf_dir, "documents").select(
        F.explode(tokens(F.col("text"))).alias("word")
    )
    return (
        docs.filter(
            F.col("word").rlike(BPE_WORD_RE)
            & (F.length("word") >= 2)
            & (F.length("word") <= BPE_WORD_MAXLEN)
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .select("word", "freq", F.expr("filter(split(word, ''), s -> s <> '')").alias("syms"))
    )


def _bpe_apply(x: str, y: str) -> str:
    """SQL expression rebuilding ``syms`` with pair (x, y) merged —
    the standard greedy LEFT-TO-RIGHT non-overlapping replacement as
    a row-local array fold (``aggregate``): the accumulator's last
    element merges with the current symbol when they spell the pair.
    After a merge the new last element is ``x||y``, which can never
    equal ``x`` (y nonempty), so merged tokens never chain — exactly
    the non-overlap rule. Runs entirely in codegen: applying a merge
    to the whole vocabulary is a zero-shuffle projection."""
    m = x + y
    return f"""
    aggregate(syms, cast(array() as array<string>), (acc, s) ->
        if(size(acc) = 0, array(s),
           if(element_at(acc, -1) = '{x}' AND s = '{y}',
              concat(slice(acc, 1, size(acc) - 1), array('{m}')),
              concat(acc, array(s)))))
    """


def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first ``BPE_MERGES`` byte-pair-encoding merges over
    the corpus — the tokenizer-training step downstream of
    :func:`vocab_top_terms`'s frequency table (Sennrich et al. 2016,
    the algorithm behind GPT-2/LLaMA-style tokenizers).

    Per round: count all adjacent symbol pairs weighted by word
    frequency (one map-side-combined aggregate over the VOCAB, never
    the corpus), pick the most frequent (count desc, then
    lexicographic — a total order, so the argmax is deterministic),
    and apply it with the row-local greedy fold. The per-round driver
    value is ONE scalar row — the same legitimate iterative pattern
    as PageRank's convergence checksum; everything heavy stays
    distributed. Pair counting includes overlapping occurrences
    (``get_stats`` in the reference implementation does too); the
    APPLY step is strictly non-overlapping — both engines implement
    identical semantics, by different formulations (fold here, match-
    island parity windows in the oracle), so agreement is evidence.

    Output: the learned merge table (rank, lhs, rhs, merged,
    pair_count at selection time).
    """
    from pac_spark.cache import pin

    v = pin(_bpe_vocab(spark, sf_dir))
    merges: list[tuple] = []
    for rank in range(1, BPE_MERGES + 1):
        pairs = (
            v.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1),"
                        " (s, i) -> struct(s AS l, element_at(syms, i + 2) AS r))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
        )
        best = pairs.collect()
        if not best:
            break
        x, y, cnt = best[0]["l"], best[0]["r"], best[0]["cnt"]
        merges.append((rank, x, y, x + y, cnt))
        v = pin(v.select("word", "freq", F.expr(_bpe_apply(x, y)).alias("syms")))
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, merged string, pair_count bigint"
    ).orderBy("rank")


def _bpe_iter_sql(i: int) -> str:
    """One unrolled oracle round: pair counts from v{i-1}, the argmax,
    and the rebuilt v{i}. The APPLY here is the formulation-diverse
    window form: mark matching positions, group CONSECUTIVE matches
    into islands (only possible when lhs = rhs), take even offsets
    within each island (greedy parity), drop consumed successors, and
    re-list. MATERIALIZED: v{i} feeds both round i+1 CTEs."""
    return f"""
p{i} AS (
    SELECT syms[u.pos] AS l, syms[u.pos + 1] AS r, SUM(freq) AS cnt
    FROM v{i - 1}, UNNEST(range(1, len(syms))) AS u(pos)
    GROUP BY 1, 2
),
best{i} AS (SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1),
m{i} AS (
    SELECT word, freq, u.pos, syms[u.pos] AS s,
           COALESCE(syms[u.pos] = (SELECT l FROM best{i})
                    AND syms[u.pos + 1] = (SELECT r FROM best{i}),
                    FALSE) AS match
    FROM v{i - 1}, UNNEST(range(1, len(syms) + 1)) AS u(pos)
),
g{i} AS (
    SELECT *,
           match AND (pos - MIN(pos) OVER (PARTITION BY word, match, isl)) % 2 = 0
               AS merge_start
    FROM (
        SELECT *,
               pos - ROW_NUMBER() OVER (PARTITION BY word, match ORDER BY pos)
                   AS isl
        FROM m{i}
    )
),
v{i} AS MATERIALIZED (
    SELECT word, freq,
           list(CASE WHEN merge_start THEN s || (SELECT r FROM best{i})
                     ELSE s END ORDER BY pos) AS syms
    FROM (
        SELECT *, COALESCE(LAG(merge_start) OVER (PARTITION BY word ORDER BY pos),
                           FALSE) AS consumed
        FROM g{i}
    )
    WHERE NOT consumed
    GROUP BY word, freq
)"""


def _bpe_sql() -> str:
    iters = ",".join(_bpe_iter_sql(i) for i in range(1, BPE_MERGES + 1))
    finals = " UNION ALL ".join(
        f"SELECT {i} AS rank, l AS lhs, r AS rhs, l || r AS merged,"
        f" CAST(cnt AS BIGINT) AS pair_count FROM best{i}"
        for i in range(1, BPE_MERGES + 1)
    )
    return f"""
WITH words AS (
    SELECT w.word, COUNT(*) AS freq
    FROM documents, UNNEST({TOKENS_SQL_}) AS w(word)
    WHERE regexp_matches(w.word, '{BPE_WORD_RE}')
      AND len(w.word) BETWEEN 2 AND {BPE_WORD_MAXLEN}
    GROUP BY w.word
),
v0 AS MATERIALIZED (
    SELECT word, freq,
           list(substring(word, u.pos, 1) ORDER BY u.pos) AS syms
    FROM words, UNNEST(range(1, len(word) + 1)) AS u(pos)
    GROUP BY word, freq
),
{iters}
SELECT * FROM ({finals}) ORDER BY rank
"""


from pac_spark.operators.text_core import TOKENS_SQL as TOKENS_SQL_  # noqa: E402

BPE_SQL = _bpe_sql()


# ---------------------------------------------------------------------------
# Quantile normalization of quality scores across sources


def _quantile_normalize(d: DataFrame) -> DataFrame:
    """Core rank→reference-value mapping over a (doc_id, source, q_fp)
    frame: doc with within-source rank r (of n_s) maps to the GLOBAL
    order statistic at position ceil(r·N / n_s) — classic quantile
    normalization, so every source's scores become comparable on the
    pooled distribution (a web-crawl source whose classifier runs hot
    stops dominating a books source in downstream threshold gates).

    Scale shape: BOTH rank phases are two-phase prefix scans — the
    global order statistics via ``functions/prefix.py`` over the
    composite key ``q_fp·2³⁴ + doc_id``, and the within-source ranks
    via the same decomposition partitioned by (source, bucket) with
    per-source bucket offsets (code-review r7: a plain
    ``row_number() OVER (PARTITION BY source)`` put each source's
    ENTIRE document set in one sort task — a web-crawl source is most
    of the corpus, so that was the single-hot-task shape moved from 1
    partition to n_sources partitions, not removed). Source sizes
    come from a groupBy broadcast, not a full-frame count window. The
    read-off is one hash join on the target position. Target
    positions use Spark's integral ``div`` (exact at any magnitude;
    r·N fits a long up to ~3·10⁹ docs). The composite key packs
    doc_id into 34 bits — ENFORCED with a runtime assert (the
    ghost-range-guard pattern), not trusted: a doc_id past 2³⁴ would
    bleed into the next q_fp's key range and silently shift ranks.
    """
    from pac_spark.cache import pin

    bound = d.agg(F.max("doc_id").alias("_max_id"))
    d = pin(
        d.join(F.broadcast(bound))
        .filter(
            F.assert_true(
                # NULL max = empty frame, trivially inside the bound
                # (the predicate is broadcast-side-only, so Catalyst
                # pushes it into the 1-row frame — the scd lesson)
                F.coalesce(F.col("_max_id") < F.lit(2**34), F.lit(True)),
                F.lit("doc_id reached 2^34; widen the composite key"),
            ).isNull()
        )
        .drop("_max_id")
    )
    qb = F.shiftright("q_fp", 17)
    n_s = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_s"))
    b = d.withColumn("_qb", qb)
    in_w = W.partitionBy("source", "_qb").orderBy("q_fp", "doc_id")
    rn_in = b.select(
        "doc_id",
        "source",
        "q_fp",
        "_qb",
        F.row_number().over(in_w).cast("long").alias("_r_in"),
    )
    btot = b.groupBy("source", "_qb").agg(
        F.count(F.lit(1)).cast("long").alias("_bt")
    )
    # sources × buckets rows: the running offset window is over a
    # domain-bounded frame, never the documents
    off_w = (
        W.partitionBy("source")
        .orderBy("_qb")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offs = btot.select(
        "source", "_qb", (F.sum("_bt").over(off_w) - F.col("_bt")).alias("_off")
    )
    ranked = (
        rn_in.join(F.broadcast(offs), ["source", "_qb"])
        .join(F.broadcast(n_s), "source")
        .select(
            "doc_id",
            "source",
            "q_fp",
            (F.col("_r_in") + F.col("_off")).alias("r"),
            "n_s",
        )
    )
    g = d.select(
        "q_fp",
        "doc_id",
        (F.col("q_fp") * F.lit(2**34) + F.col("doc_id")).alias("ok"),
        F.lit(1).cast("long").alias("one"),
    )
    pos = global_running_sums(
        g, "ok", ["one"], bucket=F.shiftright("q_fp", 17), prefix="p_"
    )
    n_tot = d.agg(F.count(F.lit(1)).cast("long").alias("N"))
    tgt = (
        ranked.crossJoin(F.broadcast(n_tot))
        .withColumn("g", F.expr("(r * N + n_s - 1) div n_s"))
    )
    return (
        tgt.join(
            pos.select(F.col("p_one").alias("g"), F.col("q_fp").alias("q_norm_fp")),
            "g",
        )
        .select("doc_id", "source", "q_fp", "q_norm_fp")
        .orderBy("doc_id")
    )


def quantile_normalized_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality score quantile-normalized across sources,
    in exact fixed-point units (quality · 10⁸ as BIGINT, the
    ``corr_quality_tokens_by_lang`` idiom — float quality is rounded
    to 8 decimals upstream, so the fixed-point image is exact and
    engine-portable).

    NULL semantics (stated in BOTH engines): docs with a NULL quality
    score (NULL text) are excluded — an unscored doc has no rank, and
    the engines disagree on where NULL sorts (Spark window NULLS
    FIRST vs DuckDB NULLS LAST), so any other treatment shifts every
    other doc's rank differently per engine."""
    d = (
        stats_frame(catalog.load(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            "source",
            F.round(F.col("quality_score") * QUALITY_SCALE)
            .cast("long")
            .alias("q_fp"),
        )
        # NULL quality cannot rank; NULL source has no within-source
        # rank lane (the offsets join drops the NULL key anyway) —
        # both exclusions stated in the oracle
        .filter(F.col("q_fp").isNotNull() & F.col("source").isNotNull())
    )
    return _quantile_normalize(d)


# registered phrase: two words so every test SF has matches, with a
# repeated word so OVERLAPPING occurrences are exercised ("batch batch
# batch" contains the phrase twice); longer chains covered in tests
PHRASE_QUERY = "batch batch"


def phrase_match_docs(
    spark: SparkSession, sf_dir: str, phrase: str = PHRASE_QUERY
) -> DataFrame:
    """Exact phrase retrieval via a POSITIONAL inverted index: docs
    containing the query words as a consecutive token run, with the
    OVERLAPPING occurrence count and the first match position —
    `LIKE '%...%'` pushed into index shape. Each query word selects
    its posting rows (doc_id, pos); word i joins word 0's postings on
    ``(doc_id, pos + i)``, so a match row survives exactly per start
    position.

    Scale shape: the posting scan filters to the query's words BEFORE
    any shuffle (a real deployment serves it from a stored (token,
    doc, pos) index — here the index build is the explode), and every
    join is an equi-join on (doc_id, expected_pos) of already-selective
    frames; no window, no per-doc buffering. The oracle is the
    formulation-diverse per-row array slide (``tk[i:i+m-1]`` equality
    over an unnested position range) — it never builds an index, so
    index bugs (off-by-one positions, dropped duplicates) cannot
    cancel out.
    """
    from pac_spark.cache import pin

    words = phrase.split(" ")
    # pinned (r12, guide §2.4 / VERDICT r11 next-#8 sweep): the posting
    # frame feeds word 0's starts PLUS one join branch per further
    # query word — unpinned, EACH branch re-scanned documents and
    # re-ran the corpus explode (plan showed one parquet scan per
    # word). One tokenize pass now builds the index; the per-word
    # branches read the cached, already-word-filtered posting rows.
    posting = pin(
        catalog.load(spark, sf_dir, "documents")
        .select("doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok"))
        .filter(F.col("tok").isin(words))
    )
    starts = posting.filter(F.col("tok") == words[0]).select("doc_id", "pos")
    for i, wd in enumerate(words[1:], start=1):
        nxt = posting.filter(F.col("tok") == wd).select(
            "doc_id", (F.col("pos") - i).alias("pos")
        )
        starts = starts.join(nxt, ["doc_id", "pos"])
    return (
        starts.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.min("pos").cast("long").alias("first_pos"),
        )
        .orderBy("doc_id")
    )


def PHRASE_MATCH_SQL(phrase: str = PHRASE_QUERY) -> str:
    """INDEPENDENT oracle: per-row token-array slide, no index."""
    m = len(phrase.split(" "))
    return f"""
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
hits AS (
    SELECT doc_id, u.i
    FROM tk, UNNEST(range(1, len(tk) - {m} + 2)) AS u(i)
    WHERE array_to_string(tk[i:i+{m - 1}], ' ') = '{phrase}'
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(MIN(i) - 1 AS BIGINT) AS first_pos
FROM hits GROUP BY doc_id ORDER BY doc_id
"""


def spearman_quality_tokens_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language SPEARMAN rank correlation between quality score
    and token count — the robust companion to
    :func:`corr_quality_tokens_by_lang`: monotone-but-nonlinear
    dependence reads as ±1 here while Pearson under-reports it, and
    outliers move one rank instead of a squared moment.

    Exact by the doubled-average-rank trick: each value's average tie
    rank is ``rank() + (cnt−1)/2``; doubling it (``2·rank + cnt − 1``)
    keeps it an exact integer, and Pearson over the doubled ranks
    equals Pearson over the ranks (correlation is scale-invariant).
    So the whole statistic is integer moments in decimal(38,0) (the
    proven ``corr`` idiom) and one double formula, identical in both
    engines; groups with zero rank variance (all-tied) yield NULL —
    the guard compares the EXACT decimal moments (a double-rounded
    comparison diverges from the oracle's exact HUGEINT test for
    all-tied groups past ~2·10⁵ docs — code-review r7).

    Plan (code-review r7 rewrote the per-row rank windows away): the
    doubled average tie rank of a value is a pure function of its
    HISTOGRAM position — ``2·cum − cnt + 1`` over the per-language
    (value, count) table — so ranks come from two domain-bounded
    histogram windows, never a sort of the documents themselves (the
    lang-partitioned full-frame sort was the exact VERDICT r3 #2
    single-hot-task shape), and the moments are count-weighted sums
    over the joint (xv, yv) histogram with every factor cast to
    decimal BEFORE multiplying (per-row long products overflow once
    doubled ranks pass 2³¹·5). The oracle deliberately keeps the
    RANK()-window formulation — formulation-diverse proof.
    """
    from pac_spark.cache import pin

    stats = stats_frame(catalog.load(spark, sf_dir, "documents"))
    base = stats.select(
        "lang",
        F.round(F.col("quality_score") * QUALITY_SCALE).cast("long").alias("xv"),
        F.col("n_tokens").cast("long").alias("yv"),
    ).filter(
        # stated in the oracle too: a rank pair needs a language AND
        # both measurements — NULL-text docs have no quality, and the
        # engines disagree on where NULLs rank
        F.col("lang").isNotNull()
        & F.col("xv").isNotNull()
        & F.col("yv").isNotNull()
    )
    joint = pin(
        base.groupBy("lang", "xv", "yv").agg(F.count(F.lit(1)).alias("c"))
    )

    def _ranks(val: str, out: str) -> DataFrame:
        h = joint.groupBy("lang", val).agg(F.sum("c").alias("_hc"))
        cum = F.sum("_hc").over(
            W.partitionBy("lang")
            .orderBy(val)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        # doubled average tie rank: 2·rank + cnt − 1 with
        # rank = cum − cnt + 1  ⇒  2·cum − cnt + 1
        return h.select(
            "lang", val, (2 * cum - F.col("_hc") + 1).alias(out)
        )

    dec = "decimal(38,0)"
    j = (
        joint.join(_ranks("xv", "dx"), ["lang", "xv"])
        .join(_ranks("yv", "dy"), ["lang", "yv"])
        .select(
            "lang",
            F.col("c").cast(dec).alias("c"),
            F.col("dx").cast(dec).alias("dx"),
            F.col("dy").cast(dec).alias("dy"),
        )
    )
    m = j.groupBy("lang").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("dx")).alias("sx"),
        F.sum(F.col("c") * F.col("dy")).alias("sy"),
        F.sum(F.col("c") * F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("c") * F.col("dy") * F.col("dy")).alias("syy"),
        F.sum(F.col("c") * F.col("dx") * F.col("dy")).alias("sxy"),
    )
    # exact decimal variance test (matches the oracle's HUGEINT test);
    # the double formula below is the oracle's expression shape
    vx_exact = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy_exact = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    n, sx, sy = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxx, syy, sxy = (F.col(c).cast("double") for c in ("sxx", "syy", "sxy"))
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    num = n * sxy - sx * sy
    rho = F.when(
        (vx_exact == 0) | (vy_exact == 0), F.lit(None).cast("double")
    ).otherwise(num / (F.sqrt(vx) * F.sqrt(vy)))
    return m.select(
        "lang",
        F.col("n").cast("long").alias("n_docs"),
        rho.alias("spearman_rho"),
    ).orderBy("lang")


def SPEARMAN_SQL_TAIL() -> str:
    """Oracle tail: compose as ``WITH stats AS (<_TEXT_STATS>)`` +
    this (the stats CTE lives with the other document oracles in
    ``plans.llm_plans``)."""
    return f""",
xy AS (
    SELECT lang,
           CAST(ROUND(quality_score * {QUALITY_SCALE}) AS BIGINT) AS xv,
           CAST(n_tokens AS BIGINT) AS yv
    FROM stats
    WHERE lang IS NOT NULL AND quality_score IS NOT NULL
      AND n_tokens IS NOT NULL
),
ranked AS (
    SELECT lang,
           2 * RANK() OVER (PARTITION BY lang ORDER BY xv)
             + COUNT(*) OVER (PARTITION BY lang, xv) - 1 AS dx,
           2 * RANK() OVER (PARTITION BY lang ORDER BY yv)
             + COUNT(*) OVER (PARTITION BY lang, yv) - 1 AS dy
    FROM xy
),
m AS (
    SELECT lang, COUNT(*) AS n,
           SUM(dx) AS sx, SUM(dy) AS sy,
           SUM(dx * dx) AS sxx, SUM(dy * dy) AS syy, SUM(dx * dy) AS sxy
    FROM ranked GROUP BY lang
)
SELECT lang, CAST(n AS BIGINT) AS n_docs,
       CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0 THEN NULL
            ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       END AS spearman_rho
FROM m ORDER BY lang
"""


HEAPS_CHECKPOINTS = 10


def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps'-law) curve: cumulative distinct
    vocabulary, token mass, and document count at ``HEAPS_CHECKPOINTS``
    equal-width checkpoints along the ``doc_id`` axis — the corpus-
    construction readout that tells a pipeline whether new data is
    still contributing vocabulary (a flattening curve means incoming
    shards are rehashes of what the corpus already holds, the
    complement of the octave histogram's duplicate tell).

    Checkpoint semantics are STATED as equal-width doc_id cuts
    (``mn + (k·(mx−mn)) div 10``): equal-width needs only the 1-row
    min/max broadcast, where equal-count cuts would need a global
    rank — a full-corpus sort the curve's shape does not justify.

    Exactness: every cumulative count falls out of a ``first_seen ≤
    boundary`` / ``doc_id ≤ boundary`` filter against the 10-row
    broadcast checkpoint frame, so the "cumulative" is by
    construction — no windows, no running sums, integer arithmetic
    only (the boundary division is the shared trunc-div contract).
    Scale shape: ONE tokenize-explode feeding term-first-seen (one
    map-side-combined groupBy(term) over the Heaps'-bounded vocab)
    and per-doc token counts (one groupBy(doc_id)); then three
    tiny broadcast-crossjoin aggregates over checkpoint-filtered
    frames. The token frame is pinned (two consumers).
    """
    from pac_spark.cache import pin
    from pac_spark.functions.exact import int_div

    docs = pin(
        catalog.load(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks = pin(
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    )
    bounds = docs.agg(
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
    )
    cks = F.broadcast(
        spark.range(1, HEAPS_CHECKPOINTS + 1)
        .withColumnRenamed("id", "k")
        .crossJoin(F.broadcast(bounds))
        .select(
            "k",
            (
                F.col("mn")
                + int_div(
                    F.col("k") * (F.col("mx") - F.col("mn")),
                    F.lit(HEAPS_CHECKPOINTS),
                )
            ).alias("ck"),
        )
    )
    first_seen = toks.groupBy("term").agg(F.min("doc_id").alias("fs"))
    vocab_cum = (
        first_seen.crossJoin(cks)
        .filter(F.col("fs") <= F.col("ck"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cum_vocab"))
    )
    doc_tokens = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
    tokens_cum = (
        doc_tokens.crossJoin(cks)
        .filter(F.col("doc_id") <= F.col("ck"))
        .groupBy("k")
        .agg(F.sum("c").cast("long").alias("cum_tokens"))
    )
    docs_cum = (
        docs.select("doc_id")
        .crossJoin(cks)
        .filter(F.col("doc_id") <= F.col("ck"))
        .groupBy("k", "ck")
        .agg(F.count(F.lit(1)).alias("cum_docs"))
    )
    return (
        docs_cum.join(tokens_cum, "k", "left")
        .join(vocab_cum, "k", "left")
        .select(
            (F.col("k") * (100 // HEAPS_CHECKPOINTS)).alias("checkpoint_pct"),
            F.col("ck").alias("boundary_doc_id"),
            "cum_docs",
            F.coalesce("cum_tokens", F.lit(0)).alias("cum_tokens"),
            F.coalesce("cum_vocab", F.lit(0)).alias("cum_vocab"),
        )
        .orderBy("checkpoint_pct")
    )


HEAPS_SQL = """
WITH b AS (SELECT MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM documents),
cks AS (
    SELECT CAST(r.range AS BIGINT) AS k,
           mn + (r.range * (mx - mn)) // 10 AS ck
    FROM b, range(1, 11) r
),
tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
fs AS (SELECT term, MIN(doc_id) AS fs FROM tok GROUP BY term),
v AS (
    SELECT k, COUNT(*) AS cum_vocab FROM fs, cks WHERE fs <= ck GROUP BY k
),
dt AS (SELECT doc_id, COUNT(*) AS c FROM tok GROUP BY doc_id),
tt AS (
    SELECT k, SUM(c) AS cum_tokens FROM dt, cks WHERE doc_id <= ck GROUP BY k
),
dd AS (
    SELECT k, ck, COUNT(*) AS cum_docs
    FROM documents, cks WHERE doc_id <= ck GROUP BY k, ck
)
SELECT CAST(dd.k * 10 AS BIGINT) AS checkpoint_pct,
       CAST(dd.ck AS BIGINT) AS boundary_doc_id,
       CAST(dd.cum_docs AS BIGINT) AS cum_docs,
       CAST(COALESCE(tt.cum_tokens, 0) AS BIGINT) AS cum_tokens,
       CAST(COALESCE(v.cum_vocab, 0) AS BIGINT) AS cum_vocab
FROM dd
LEFT JOIN tt ON dd.k = tt.k
LEFT JOIN v ON dd.k = v.k
ORDER BY checkpoint_pct
"""


OOV_VOCAB_K = 16
OOV_KEEP_MAX_MILLI = 200


def oov_rate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate gate: the fraction of each document's
    tokens falling outside the top-``OOV_VOCAB_K`` corpus vocabulary
    (count desc, term asc — a total order), with the curation keep
    flag at ``oov_milli <= OOV_KEEP_MAX_MILLI``. The classic cheap
    LM-quality screen: a document whose mass is mostly rare terms is
    boilerplate, OCR noise, or a language the vocab was not built
    for — complements ``unigram_prob_score`` (mass-weighted fluency)
    with a coverage-style readout that a threshold can act on.

    Exactness: the rate is ``int_div(oov·1000, n)`` — the shared
    truncating-division contract, no doubles anywhere. Scale shape:
    one tokenize-explode feeding the wordcount (map-side combined,
    Heaps'-bounded vocab), TakeOrderedAndProject top-K, and the K-row
    vocab BROADCAST anti-joined to the token stream — the per-doc
    aggregate is the only shuffle touching corpus-sized data. The
    token frame is pinned (wordcount + rescan consumers).
    """
    from pac_spark.cache import pin
    from pac_spark.functions.exact import int_div

    toks = pin(
        catalog.load(spark, sf_dir, "documents").select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("term")
        )
    )
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(OOV_VOCAB_K)
        .select("term")
    )
    flagged = toks.join(
        F.broadcast(vocab.withColumn("_in_vocab", F.lit(1))), "term", "left"
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(
            F.when(F.col("_in_vocab").isNull(), F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("n_oov"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        int_div(F.col("n_oov") * 1000, F.col("n_tokens")).alias("oov_milli"),
    ).withColumn(
        "kept", F.col("oov_milli") <= F.lit(OOV_KEEP_MAX_MILLI)
    ).orderBy("doc_id")


OOV_SQL = f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
vocab AS (
    SELECT term FROM (
        SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term
        ORDER BY cnt DESC, term LIMIT {OOV_VOCAB_K}
    )
),
per_doc AS (
    SELECT doc_id, COUNT(*) AS n_tokens,
           SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS n_oov
    FROM tok LEFT JOIN vocab v ON tok.term = v.term
    GROUP BY doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_oov AS BIGINT) AS n_oov,
       CAST((n_oov * 1000) // n_tokens AS BIGINT) AS oov_milli,
       (n_oov * 1000) // n_tokens <= {OOV_KEEP_MAX_MILLI} AS kept
FROM per_doc ORDER BY doc_id
"""


def source_vocab_tv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary drift matrix: for every source pair
    (a < b, string order), the total-variation distance between the
    two sources' unigram distributions — the "are these two feeds the
    same kind of text" readout that decides whether sources can share
    a mixing weight or need separate curation. TV chosen over KL/JS
    deliberately (the token-Gini / mix-drift precedent): clearing
    denominators makes ``½·Σ|c_at/N_a − c_bt/N_b|`` fully RATIONAL —
    ``½·Σ|c_at·N_b − c_bt·N_a| / (N_a·N_b)`` with decimal(38,0)
    cross-products, one final double division.

    Terms absent from one source never materialize a row; their mass
    folds in algebraically: ``Σ_only-a c_at = N_a − Σ_shared c_at``,
    so the numerator is ``Σ_sh|c_at·N_b − c_bt·N_a| + N_b·(N_a −
    Σ_sh c_at) + N_a·(N_b − Σ_sh c_bt)`` — the SHARED-term join plus
    per-source totals is the whole computation; a pair sharing no
    terms reads off TV = 1 from the spine alone. NULL sources are
    excluded in both engines (no distribution to compare).

    Scale shape: one tokenize-explode into a map-side-combined
    groupBy(source, term) (vocab×sources-bounded, pinned — it is both
    sides of the self-join), the 1-row-per-source totals broadcast
    onto it, a term-keyed self-join (hot terms fan out K² per term, K
    = source count), one map-side pair aggregate, and a K²-row spine
    left-join. No corpus-sized shuffle after the first groupBy.
    """
    from pac_spark.cache import pin

    DEC = "decimal(38,0)"
    sc = pin(
        catalog.load(spark, sf_dir, "documents")
        .filter(F.col("source").isNotNull())
        .select("source", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast(DEC).alias("cnt"))
    )
    totals = pin(
        sc.groupBy("source").agg(F.sum("cnt").cast(DEC).alias("n_total"))
    )
    with_n = sc.join(F.broadcast(totals), "source")
    a = with_n.select(
        F.col("source").alias("src_a"),
        "term",
        F.col("cnt").alias("ca"),
        F.col("n_total").alias("na"),
    )
    b = with_n.select(
        F.col("source").alias("src_b"),
        "term",
        F.col("cnt").alias("cb"),
        F.col("n_total").alias("nb"),
    )
    shared = (
        a.join(b, "term")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared_terms"),
            F.sum(
                F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
            ).alias("sum_abs"),
            F.sum("ca").alias("sum_ca"),
            F.sum("cb").alias("sum_cb"),
        )
    )
    spine = (
        totals.select(
            F.col("source").alias("src_a"), F.col("n_total").alias("na")
        )
        .crossJoin(
            F.broadcast(
                totals.select(
                    F.col("source").alias("src_b"),
                    F.col("n_total").alias("nb"),
                )
            )
        )
        .filter(F.col("src_a") < F.col("src_b"))
    )
    zero = F.lit(0).cast("decimal(38,0)")
    joined = spine.join(shared, ["src_a", "src_b"], "left").select(
        "src_a",
        "src_b",
        F.coalesce("n_shared_terms", F.lit(0)).cast("long").alias(
            "n_shared_terms"
        ),
        (
            F.coalesce("sum_abs", zero)
            + F.col("nb") * (F.col("na") - F.coalesce("sum_ca", zero))
            + F.col("na") * (F.col("nb") - F.coalesce("sum_cb", zero))
        ).alias("_num"),
        (F.col("na") * F.col("nb")).alias("_den"),
    )
    return joined.select(
        "src_a",
        "src_b",
        "n_shared_terms",
        (
            F.col("_num").cast("double") / 2.0 / F.col("_den").cast("double")
        ).alias("tv_distance"),
    ).orderBy("src_a", "src_b")


TV_MATRIX_SQL = """
WITH sc AS (
    SELECT source, term, CAST(COUNT(*) AS HUGEINT) AS cnt
    FROM (
        SELECT source, unnest(string_split(text, ' ')) AS term
        FROM documents WHERE source IS NOT NULL
    ) GROUP BY source, term
),
totals AS (
    SELECT source, SUM(cnt) AS n_total FROM sc GROUP BY source
),
with_n AS (SELECT sc.*, n_total FROM sc JOIN totals USING (source)),
shared AS (
    SELECT a.source AS src_a, b.source AS src_b,
           COUNT(*) AS n_shared_terms,
           SUM(ABS(a.cnt * b.n_total - b.cnt * a.n_total)) AS sum_abs,
           SUM(a.cnt) AS sum_ca, SUM(b.cnt) AS sum_cb
    FROM with_n a JOIN with_n b ON a.term = b.term AND a.source < b.source
    GROUP BY 1, 2
),
spine AS (
    SELECT a.source AS src_a, a.n_total AS na,
           b.source AS src_b, b.n_total AS nb
    FROM totals a, totals b WHERE a.source < b.source
)
SELECT src_a, src_b,
       CAST(COALESCE(n_shared_terms, 0) AS BIGINT) AS n_shared_terms,
       CAST(COALESCE(sum_abs, 0)
            + nb * (na - COALESCE(sum_ca, 0))
            + na * (nb - COALESCE(sum_cb, 0)) AS DOUBLE)
           / 2.0 / CAST(na * nb AS DOUBLE) AS tv_distance
FROM spine
LEFT JOIN shared USING (src_a, src_b)
ORDER BY src_a, src_b
"""


BIGRAM_SCALE = 1_000_000_000


def bigram_fluency_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model fluency gate: per document, the mean
    corpus conditional probability of its token transitions —
    ``p(w2|w1) = c(w1,w2) / c(w1,·)`` averaged over the document's
    bigrams. The sequence-aware upgrade of ``unigram_prob_score``:
    shuffled boilerplate built from common words sails through a
    unigram gate but scores low here, because its TRANSITIONS are
    rare.

    Exactness (the unigram/no-transcendental discipline): each
    transition's probability is quantized to nano-units by the shared
    truncating division, carried in decimal(38,0) so corpus-scale
    counts cannot overflow (``c·10^9`` passes 2^53 long before a
    100 TB corpus does — the int_div HARD-CONTRACT escape hatch), and
    the per-doc mean is an exact integer division of the nano sum.
    Documents with fewer than two tokens have no transitions and are
    excluded by stated semantics in both engines.

    Scale shape: bigrams are a row-local array transform (zero
    shuffle), ONE map-side-combined groupBy(w1, w2) builds the model
    (vocab²-bounded, Heaps' argument squared), the first-token
    totals are a rollup OF that frame (never a second corpus pass),
    and the rescore is two vocab-bounded joins against the pinned
    bigram stream — AQE broadcasts them when small.
    """
    from pac_spark.cache import pin
    from pac_spark.functions.exact import int_div

    DEC = "decimal(38,0)"
    docs = catalog.load(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("tk")
    )
    bg = pin(
        docs.select(
            "doc_id",
            F.explode(
                F.when(
                    F.col("tk").isNull() | (F.size("tk") < 2),
                    F.array().cast("array<struct<w1:string,w2:string>>"),
                ).otherwise(
                    F.expr(
                        "transform(sequence(0, size(tk) - 2),"
                        " i -> struct(tk[i] AS w1, tk[i + 1] AS w2))"
                    )
                )
            ).alias("p"),
        ).select("doc_id", "p.w1", "p.w2")
    )
    c2 = pin(
        bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast(DEC).alias("c2"))
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast(DEC).alias("c1"))
    num = (F.col("c2") * F.lit(BIGRAM_SCALE)).cast(DEC)
    scored = (
        bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .select(
            "doc_id",
            ((num - num % F.col("c1")) / F.col("c1"))
            .cast("long")
            .alias("score_nano"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("score_nano").alias("_s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            int_div(F.col("_s"), F.col("n_bigrams")).alias("mean_score_nano"),
        )
        .orderBy("doc_id")
    )


BIGRAM_SQL = f"""
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
bg AS (
    SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
    FROM tk, UNNEST(range(1, len(tk))) AS u(i)
    WHERE len(tk) >= 2
),
c2 AS (
    SELECT w1, w2, CAST(COUNT(*) AS HUGEINT) AS c2
    FROM bg GROUP BY w1, w2
),
c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1),
scored AS (
    SELECT doc_id,
           (c2.c2 * {BIGRAM_SCALE}) // c1.c1 AS score_nano
    FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(score_nano) // COUNT(*) AS BIGINT) AS mean_score_nano
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


def doc_surprisal_octaves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document surprisal under the corpus unigram LM, in INTEGER
    octaves — the log-domain twin of :func:`unigram_prob_score`. That
    operator keeps exactness by scoring linear mean-p, which the most
    common tokens dominate; the classical CCNet-style gate wants the
    mean of ``-log p(tok)``, and this recovers it exactly: a token's
    surprisal octave is ``floor(log2(N / tf))``, computed with no
    float log anywhere as ``length(bin(N div tf)) - 1``, which equals
    ``floor(log2(N / tf))`` for every positive pair (``floor(x) >= m``
    iff ``x >= m`` for integer m — the vocab_frequency_octaves
    identity, applied to the RATIO). High mean octave = rare-token
    junk; low = fluent common-word text; max octave flags the single
    rarest token (the hapax tripwire).

    Documents with no tokens (NULL text) carry no exploded rows and
    are absent from the output — stated in both engines.

    Scale shape: one tokenize scan; per-(doc, term) counts first (one
    map-side-combined shuffle, TYPE rows not occurrence rows from
    there on), the Heaps'-bounded tf frame derived FROM that pinned
    frame (no second corpus pass, the unigram_prob_score discipline),
    the 1-row corpus total broadcast onto the vocab frame, and the
    octave map equi-joined back on term. The one double division
    (mean = sum_octave / n_tokens) happens at the read-off.
    """
    from pac_spark.cache import pin

    dtc = pin(
        catalog.load(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "lang", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tf = dtc.groupBy("term").agg(F.sum("c").alias("tf"))
    total = tf.agg(F.sum("tf").alias("n"))
    octs = tf.crossJoin(F.broadcast(total)).select(
        "term",
        (F.length(F.bin(F.expr("n div tf"))) - 1).cast("long").alias("oct"),
    )
    return (
        dtc.join(octs, "term")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.col("oct")).alias("sum_octave"),
            F.max("oct").alias("max_octave"),
        )
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "sum_octave",
            "max_octave",
            (
                F.col("sum_octave").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("mean_surprisal"),
        )
        .orderBy("doc_id")
    )


SURPRISAL_SQL = """
WITH dt AS (
    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
    FROM documents
),
dtc AS (
    SELECT doc_id, lang, term, COUNT(*) AS c FROM dt GROUP BY 1, 2, 3
),
tf AS (SELECT term, SUM(c) AS tf FROM dtc GROUP BY term),
n AS (SELECT SUM(tf) AS n FROM tf),
octs AS (
    SELECT term, CAST(length(bin(n // tf)) - 1 AS BIGINT) AS oct
    FROM tf, n
)
SELECT CAST(dtc.doc_id AS BIGINT) AS doc_id, dtc.lang,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(SUM(c * oct) AS BIGINT) AS sum_octave,
       CAST(MAX(oct) AS BIGINT) AS max_octave,
       CAST(SUM(c * oct) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
           AS mean_surprisal
FROM dtc JOIN octs USING (term)
GROUP BY 1, 2 ORDER BY doc_id
"""


def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-token language classifier
    against the labeled ``lang`` — the categorical-classifier eval
    primitive the engine's AUC/decile-lift rows don't cover: one row
    per (true, predicted) pair with the row-share read-off (the
    per-true-label recall diagonal). Reference parity: the reference
    ships no classifier evaluation at all; this is the eval row a
    production language-ID filter ships with (the ann_recall_audit
    argument applied to categorical prediction).

    Exactness: counts are exact; the share is the shared truncating
    division over a SUM window partitioned by the true label — NULL
    labels (laced docs) form their own partition identically in both
    engines. Scale shape: the classifier scan is
    :func:`language_id`'s (row-local marker scoring); the matrix is
    one map-side-combined groupBy onto the (langs+1)² key space and
    the window runs over that K²-row frame — nothing data-sized past
    the first aggregate.
    """
    cm = (
        language_id(spark, sf_dir)
        .groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return cm.select(
        "lang",
        "lang_guess",
        "n_docs",
        F.expr(
            "CAST((n_docs * 1000)"
            " div (SUM(n_docs) OVER (PARTITION BY lang)) AS BIGINT)"
        ).alias("row_share_milli"),
    ).orderBy("lang", "lang_guess")


def LANGID_CONFUSION_SQL() -> str:
    """DuckDB oracle: the registered language_id oracle text verbatim
    as a subquery (the ann_recall_audit composition rule — the matrix
    can never drift from the classifier's own oracle), then the same
    grouped counts + partitioned-share window."""
    from pac_spark.plans.llm_plans import _LANGID

    return f"""
WITH pred AS ({_LANGID}),
cm AS (
    SELECT lang, lang_guess, COUNT(*) AS n_docs FROM pred GROUP BY 1, 2
)
SELECT lang, lang_guess, CAST(n_docs AS BIGINT) AS n_docs,
       CAST((n_docs * 1000)
            // (SUM(n_docs) OVER (PARTITION BY lang)) AS BIGINT)
           AS row_share_milli
FROM cm ORDER BY lang, lang_guess
"""


COLLOC_MIN_SUPPORT = 5
COLLOC_TOP = 50


def collocations_top_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top corpus collocations by unigram-independence LIFT —
    p(w1 w2) / (p(w1)·p(w2)), the phrase-vocabulary candidate list a
    tokenizer/phrase-mining pass reads (the corpus-level complement of
    ``bigram_fluency_score``'s per-document gate): a high-lift pair is
    a phrase, not a chance adjacency. Min support {COLLOC_MIN_SUPPORT}
    occurrences; top {COLLOC_TOP} under the total order
    (lift desc, w1, w2).

    Exactness: all counts exact BIGINT; lift is a FIXED-SHAPE scalar
    expression ``((c₂·Nᵤ)·Nᵤ) / ((N₁·c₁ᵃ)·c₁ᵇ)`` — per-row
    multiplications/division in one stated association order, each
    IEEE-correctly-rounded, no float ever aggregated — bit-identical
    across engines (the covariance read-off argument; PMI's log is
    monotone in lift, so ranking by lift IS ranking by PMI with no
    libm ln).

    Scale shape: the tokenized frame is pinned (bigram + unigram
    consumers, one scan); ONE vocab²-bounded groupBy builds the pair
    counts and one vocab-bounded groupBy the unigram counts; the two
    re-joins hit the Heaps'-bounded unigram frame, corpus totals ride
    1-row broadcasts, and the cut is TakeOrderedAndProject.
    """
    from pac_spark.cache import pin

    docs = pin(
        catalog.load(spark, sf_dir, "documents").select(
            tokens(F.col("text")).alias("tk")
        )
    )
    bg = docs.select(
        F.explode(
            F.when(
                F.col("tk").isNull() | (F.size("tk") < 2),
                F.array().cast("array<struct<w1:string,w2:string>>"),
            ).otherwise(
                F.expr(
                    "transform(sequence(0, size(tk) - 2),"
                    " i -> struct(tk[i] AS w1, tk[i + 1] AS w2))"
                )
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    uni = pin(
        docs.select(F.explode("tk").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    n1 = c2.agg(F.sum("c2").alias("n1"))
    nu = uni.agg(F.sum("cu").alias("nu"))
    u1 = uni.select(F.col("term").alias("w1"), F.col("cu").alias("cu1"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("cu").alias("cu2"))
    return (
        c2.where(F.col("c2") >= COLLOC_MIN_SUPPORT)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(nu))
        .select(
            "w1",
            "w2",
            F.col("c2").cast("long").alias("n_pair"),
            (
                (F.col("c2").cast("double") * F.col("nu") * F.col("nu"))
                / (
                    F.col("n1").cast("double")
                    * F.col("cu1")
                    * F.col("cu2")
                )
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "w1", "w2")
        .limit(COLLOC_TOP)
    )


COLLOCATIONS_SQL = f"""
WITH d AS (SELECT string_split(text, ' ') AS tk FROM documents),
bg AS (
    SELECT tk[u.i] AS w1, tk[u.i + 1] AS w2
    FROM d, UNNEST(range(1, len(tk))) u(i)
),
c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
uni AS (SELECT u.t AS term, COUNT(*) AS cu FROM d, UNNEST(tk) u(t) GROUP BY 1),
n1 AS (SELECT SUM(c2) AS n1 FROM c2),
nu AS (SELECT SUM(cu) AS nu FROM uni)
SELECT c2.w1, c2.w2, CAST(c2.c2 AS BIGINT) AS n_pair,
       ((CAST(c2.c2 AS DOUBLE) * nu.nu) * nu.nu)
       / ((CAST(n1.n1 AS DOUBLE) * u1.cu) * u2.cu) AS lift
FROM c2
JOIN uni u1 ON u1.term = c2.w1
JOIN uni u2 ON u2.term = c2.w2
CROSS JOIN n1 CROSS JOIN nu
WHERE c2.c2 >= {COLLOC_MIN_SUPPORT}
ORDER BY lift DESC, w1, w2
LIMIT {COLLOC_TOP}
"""
