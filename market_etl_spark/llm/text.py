"""Text analysis: tokenization, shingling, language ID, quality scoring,
token counting, document fingerprinting.

Each operator has two renderings kept in lockstep: a Spark Column
builder (built-in expressions only — JVM-side, codegen-friendly) and an
ANSI-SQL fragment the DuckDB oracle runs; unit + oracle checks pin them
together. All per-document work is embarrassingly parallel — no
shuffle, scales linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Stopword lists for the n-gram/stopword language-ID heuristic.
#: Deterministic tie-break order: en > de > es > fr.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es": ("el", "la", "que", "y", "en", "un", "es", "se", "no", "los"),
    "fr": ("le", "et", "les", "des", "une", "dans", "est", "pour", "que", "ce"),
}

#: "BPE-ish" token pattern: letter runs, digit runs, single punctuation.
TOKEN_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

#: BPE symbol delimiters (U+001F unit separator / U+001E record
#: separator): control characters that cannot occur in real tokens, so
#: the delimiter encoding in :func:`bpe_merge_rounds` is collision-free
#: for arbitrary text including literal angle brackets.
BPE_OPEN = "\x1f"
BPE_CLOSE = "\x1e"


# ---------------------------------------------------------------------------
# Tokenization / shingling
# ---------------------------------------------------------------------------
def words(text_col: str = "text") -> Column:
    """Whitespace word split (lowercased)."""
    return F.split(F.lower(F.col(text_col)), " ")


def shingles(words_col: str = "toks", n: int = 3) -> Column:
    """Distinct n-word shingles via higher-order array functions —
    the unit of near-duplicate comparison (word-level sets are useless
    on small vocabularies; n-grams are discriminative).

    Documents shorter than n tokens yield an EMPTY set — the guard is
    load-bearing: ``sequence(1, size-n+1)`` with size < n produces a
    *descending* sequence ([1, 0]), and element_at(toks, 0) throws
    under ANSI semantics (found by the hypothesis property suite)."""
    parts = ", ".join(f"element_at({words_col}, i + {j})" for j in range(n))
    return F.expr(
        f"if(size({words_col}) < {n}, cast(array() as array<string>), "
        f"array_distinct(transform(sequence(1, size({words_col}) - {n - 1}), "
        f"i -> concat_ws(' ', {parts}))))"
    )


def shingles_sql(words_expr: str = "w", n: int = 3) -> str:
    """DuckDB rendering of :func:`shingles` (1-based list indexing)."""
    parts = " || ' ' || ".join(f"{words_expr}[i + {j}]" for j in range(n))
    return (
        f"list_distinct([{parts} "
        f"FOR i IN range(1, greatest(len({words_expr}) - {n - 2}, 1))])"
    )


def bpe_token_count(text_col: str = "text") -> Column:
    """Token count under the BPE-ish regex (letters / digits / punct).

    Spark SQL string literals process backslash escapes (``\\s`` → ``s``),
    so the regex is doubled there; DuckDB literals don't, so the oracle
    uses TOKEN_REGEX verbatim.
    """
    sql_regex = TOKEN_REGEX.replace("\\", "\\\\")
    return F.expr(f"size(regexp_extract_all({text_col}, '{sql_regex}', 0))")


BPE_TOKEN_COUNT_SQL = f"len(regexp_extract_all({{col}}, '{TOKEN_REGEX}', 0))"


# ---------------------------------------------------------------------------
# Language identification (stopword-score heuristic)
# ---------------------------------------------------------------------------
def _contains_list(lang: str) -> str:
    return "array(" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + ")"


def lang_score(words_col: str, lang: str) -> Column:
    """Occurrences of ``lang``'s stopwords in the token array."""
    return F.expr(
        f"size(filter({words_col}, t -> array_contains({_contains_list(lang)}, t)))"
    )


def predicted_lang(words_col: str = "toks") -> Column:
    """Argmax of stopword scores with fixed precedence en>de>es>fr."""
    s = {lang: lang_score(words_col, lang) for lang in STOPWORDS}
    return (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en")
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )


def lang_score_sql(words_expr: str, lang: str) -> str:
    lst = "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"
    return f"len(list_filter({words_expr}, t -> list_contains({lst}, t)))"


def predicted_lang_sql(words_expr: str) -> str:
    s = {lang: lang_score_sql(words_expr, lang) for lang in STOPWORDS}
    return f"""CASE
      WHEN {s['en']} >= {s['de']} AND {s['en']} >= {s['es']} AND {s['en']} >= {s['fr']} THEN 'en'
      WHEN {s['de']} >= {s['es']} AND {s['de']} >= {s['fr']} THEN 'de'
      WHEN {s['es']} >= {s['fr']} THEN 'es'
      ELSE 'fr' END"""


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------
def quality_features(text_col: str = "text", words_col: str = "toks") -> dict[str, Column]:
    """Deterministic per-document quality features: char length, word
    count, mean word length, stopword ratio, alpha ratio."""
    n_words = F.size(F.col(words_col))
    n_chars = F.length(F.col(text_col))
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
    stop_hits = lang_score(words_col, "en")
    return {
        "n_chars": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "mean_word_len": F.round(
            (alpha_chars.cast("double") / F.nullif(n_words.cast("double"), F.lit(0.0))), 6
        ),
        "stopword_ratio": F.round(
            stop_hits.cast("double") / F.nullif(n_words.cast("double"), F.lit(0.0)), 6
        ),
        "alpha_ratio": F.round(
            alpha_chars.cast("double") / F.nullif(n_chars.cast("double"), F.lit(0.0)), 6
        ),
    }


def quality_score(text_col: str = "text", words_col: str = "toks") -> Column:
    """Composite [0,1] quality score: length component (saturates at 200
    words) + stopword-presence component + alpha-density component."""
    n_words = F.size(F.col(words_col)).cast("double")
    stop_ratio = lang_score(words_col, "en").cast("double") / F.nullif(n_words, F.lit(0.0))
    alpha_ratio = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", "")).cast(
        "double"
    ) / F.nullif(F.length(F.col(text_col)).cast("double"), F.lit(0.0))
    return F.round(
        F.least(n_words / F.lit(200.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
        + alpha_ratio * 0.3,
        6,
    )


def quality_score_sql(text_expr: str, words_expr: str) -> str:
    n_words = f"len({words_expr})::DOUBLE"
    stop = lang_score_sql(words_expr, "en")
    alpha = f"len(regexp_replace({text_expr}, '[^a-zA-Z]', '', 'g'))::DOUBLE"
    return (
        f"ROUND(LEAST({n_words} / 200.0, 1.0) * 0.4"
        f" + LEAST(({stop}::DOUBLE / NULLIF({n_words}, 0.0)) * 5.0, 1.0) * 0.3"
        f" + ({alpha} / NULLIF(len({text_expr})::DOUBLE, 0.0)) * 0.3, 6)"
    )


# ---------------------------------------------------------------------------
# Fingerprinting
# ---------------------------------------------------------------------------
def min_shingle_fingerprint(shingle_col: str = "sh") -> Column:
    """Document fingerprint: lexicographic-min md5 over the shingle set
    (a 1-permutation MinHash with a portable hash — identical in any
    engine with md5). Equal fingerprints ⇒ shared minimal shingle, a
    cheap first-pass near-dup blocker."""
    return F.expr(f"array_min(transform({shingle_col}, s -> md5(s)))")


def content_hash(text_col: str = "text") -> Column:
    """Exact-dedup key: sha256 hex of the raw text. Grouping/shuffling
    on the 64-char digest instead of multi-KB text bodies keeps exact
    dedup's shuffle narrow at 100 TB."""
    return F.sha2(F.col(text_col), 256)


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------
def tfidf_top_terms(
    df,
    tokens_col: str = "toks",
    id_col: str = "doc_id",
    k: int = 3,
):
    """Top-k characteristic terms per document by TF-IDF:
    score = tf · ln((N+1)/(df+1)), the smoothed form that never
    divides by zero. Ties break deterministically on the ROUNDED
    score then the term (both engines order identically on that key).

    Two shuffles total, both narrow: (doc, term) rows from a plain
    explode → hash-agg tf; term document-frequencies are a second agg
    over those (already distinct) pairs; the corpus size N joins in
    as a broadcast 1-row aggregate (no driver collect). The per-doc
    top-k is a window over the doc's own terms — partitioned by doc
    id, so no global sort anywhere."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    tf = (
        # explode_outer: plain explode of the computed token array makes
        # Catalyst infer a guard that re-inlines the tokenize pipeline
        # below this projection (planlint); the != '' filter already
        # drops the outer variant's null rows.
        df.select(F.col(id_col), F.explode_outer(F.col(tokens_col)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "tfidf")
    )


def tfidf_top_terms_sql(k: int = 3) -> str:
    """DuckDB rendering of :func:`tfidf_top_terms` over a CTE ``docs_w``
    exposing (doc_id, w)."""
    return f"""
        WITH tok AS (
            SELECT doc_id, unnest(w) AS term FROM docs_w
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM tok WHERE term <> '' GROUP BY doc_id, term
        ), dfreq AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        ), n AS (
            SELECT COUNT(*)::DOUBLE AS n_docs FROM docs_w
        ), scored AS (
            SELECT tf.doc_id, tf.term, tf.tf,
                   ROUND(tf.tf * LN((n.n_docs + 1.0) / (dfreq.df + 1.0)), 6) AS tfidf
            FROM tf JOIN dfreq USING (term) CROSS JOIN n
        )
        SELECT doc_id, rank, term, tf, tfidf FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, term
            )::BIGINT AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# Vocabulary construction
# ---------------------------------------------------------------------------
def build_vocab(df, tokens_col: str = "toks", vocab_size: int = 1000):
    """Frequency-ranked vocabulary with dense ids and a coverage curve:
    token_id 0 is the most frequent token; ``cum_coverage`` is the
    fraction of ALL token occurrences covered by ids 0..i (how big a
    vocab you need is read straight off this column).

    Scale shape: one hash-agg shuffle for the counts (partial
    aggregation does the heavy lifting map-side), then
    ``orderBy().limit(V)`` — a distributed TakeOrderedAndProject, not
    a global sort — so the only single-partition step (the
    row_number/cumsum window) runs over at most V rows, which is by
    definition vocabulary-sized, not corpus-sized. Ordering ties
    break on the token string, so ids are bit-stable across engines
    and re-runs."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    counts = (
        # explode_outer + the != '' filter: see planlint (inferred-guard trap)
        df.select(F.explode_outer(F.col(tokens_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    total = counts.agg(F.sum("freq").cast("double").alias("_total"))
    top = counts.orderBy(F.desc("freq"), F.asc("token")).limit(vocab_size)
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return (
        top.join(F.broadcast(total))
        .select(
            (F.row_number().over(w) - 1).cast("long").alias("token_id"),
            "token",
            "freq",
            F.round(
                F.sum("freq").over(w.rowsBetween(Window.unboundedPreceding, 0))
                / F.col("_total"),
                6,
            ).alias("cum_coverage"),
        )
    )


def build_vocab_sql(vocab_size: int = 1000) -> str:
    """DuckDB rendering of :func:`build_vocab` over ``docs_w``."""
    return f"""
        WITH tok AS (
            SELECT unnest(w) AS token FROM docs_w
        ), counts AS (
            SELECT token, COUNT(*) AS freq
            FROM tok WHERE token <> '' GROUP BY token
        ), tot AS (
            SELECT SUM(freq)::DOUBLE AS total FROM counts
        ), top AS (
            SELECT token, freq FROM counts
            ORDER BY freq DESC, token LIMIT {vocab_size}
        )
        SELECT (ROW_NUMBER() OVER (ORDER BY freq DESC, token) - 1)::BIGINT AS token_id,
               token, freq,
               ROUND(SUM(freq) OVER (ORDER BY freq DESC, token
                     ROWS UNBOUNDED PRECEDING) / total, 6) AS cum_coverage
        FROM top CROSS JOIN tot
    """


def inverted_index(
    docs, id_col: str = "doc_id", words_col: str = "toks", term_filter=None
):
    """Posting-list construction: one row per (term, doc) with term
    frequency, document frequency, and collection frequency.

    The plan is two aligned shuffles and nothing else: a partial-agg
    ``groupBy(term, doc)`` collapses repeated occurrences map-side, then
    a window over ``term`` adds df/cf without a second aggregate-join
    round-trip (a join of a per-term stats aggregate would shuffle the
    postings a third time). Per-term window state is the term's posting
    count — bounded by document frequency, never by corpus size; at
    100 TB a stopword's partition is the one skew risk, which callers
    cut with ``term_filter`` (the filter sits on the partitioning key,
    so Catalyst pushes it below the window and the shuffle).
    """
    from pyspark.sql import DataFrame, Window

    # explode_outer + the != '' filter: see planlint (inferred-guard trap)
    toks = docs.select(id_col, F.explode_outer(F.col(words_col)).alias("term")).filter(
        F.col("term") != ""
    )
    if term_filter is not None:
        toks = toks.filter(term_filter)
    postings = toks.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
    w = Window.partitionBy("term")
    return postings.select(
        "term",
        id_col,
        "tf",
        F.count(F.lit(1)).over(w).alias("df"),
        F.sum("tf").over(w).alias("cf"),
    )


def bm25_scores(
    docs,
    terms: tuple[str, ...],
    id_col: str = "doc_id",
    words_col: str = "toks",
    k1: float = 1.2,
    b: float = 0.75,
):
    """Okapi BM25 ranked retrieval for a fixed query-term set
    (Robertson/Sparck Jones; the Lucene ``+1`` idf form, so scores stay
    positive even for terms in most documents).

    Plan shape, sized for 100 TB:

    - Collection stats (N, avgdl) are ONE partial-agg pass collapsing
      to a single row, broadcast back — never a driver round-trip.
    - The term filter sits on the exploded tokens BEFORE the postings
      aggregation, so only query-term occurrences shuffle: the moved
      volume is Σ df(term), not the corpus.
    - df is a |terms|-row aggregate, broadcast into the scoring join.
    - Per-document scores are built as one conditional sum PER QUERY
      TERM added in fixed left-to-right term order — not an unordered
      ``SUM`` over (term, doc) rows — so the floating-point result is
      bit-reproducible across engines and partitionings (each
      conditional sum has at most one non-zero addend per document).

    Returns (id, score) for every document matching ≥1 term; callers
    take top-k via ``orderBy().limit()`` (TakeOrderedAndProject —
    distributed heaps, no global sort)."""
    d = docs.select(
        id_col, F.expr(f"filter({words_col}, x -> x <> '')").alias("_w")
    )
    stats = d.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg(F.size("_w")).alias("_avgdl"),
    )
    tok = d.select(
        id_col,
        F.size("_w").cast("double").alias("_dl"),
        # explode_outer: the isin() filter drops the null rows; plain
        # explode would re-inline the _w pipeline (planlint)
        F.explode_outer("_w").alias("term"),
    ).filter(F.col("term").isin(*terms))
    postings = tok.groupBy("term", id_col).agg(
        F.count(F.lit(1)).cast("double").alias("_tf"),
        F.first("_dl").alias("_dl"),
    )
    df = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("_df")
    )
    idf = F.log((F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0)
    contrib = idf * F.col("_tf") * (k1 + 1.0) / (
        F.col("_tf") + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
    )
    scored = (
        postings.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("_c", contrib)
    )
    # Fixed-order addition over the query terms (see docstring).
    per_term = [
        F.sum(F.when(F.col("term") == t, F.col("_c")).otherwise(0.0)).alias(
            f"_s{i}"
        )
        for i, t in enumerate(terms)
    ]
    out = scored.groupBy(id_col).agg(*per_term)
    score = F.col("_s0")
    for i in range(1, len(terms)):
        score = score + F.col(f"_s{i}")
    return out.select(id_col, score.alias("score"))


def bm25_sql(
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB rendering of :func:`bm25_scores` over ``documents``,
    with the identical fixed-term-order float addition."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    per_term = ",\n               ".join(
        f"SUM(CASE WHEN term = '{t}' THEN c ELSE 0.0 END) AS s{i}"
        for i, t in enumerate(terms)
    )
    add = " + ".join(f"s{i}" for i in range(len(terms)))
    return f"""
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        FROM documents
    ), stats AS (
        SELECT COUNT(*)::DOUBLE AS n, AVG(len(w))::DOUBLE AS avgdl FROM d
    ), tok AS (
        SELECT doc_id, len(w)::DOUBLE AS dl, unnest(w) AS term FROM d
    ), postings AS (
        SELECT term, doc_id, COUNT(*)::DOUBLE AS tf, MIN(dl) AS dl
        FROM tok WHERE term IN ({in_list})
        GROUP BY term, doc_id
    ), df AS (
        SELECT term, COUNT(*)::DOUBLE AS df FROM postings GROUP BY term
    ), contrib AS (
        SELECT p.doc_id, p.term,
               ln((s.n - f.df + 0.5) / (f.df + 0.5) + 1.0)
                 * p.tf * {k1 + 1.0}
                 / (p.tf + {k1} * ({1.0 - b} + {b} * p.dl / s.avgdl)) AS c
        FROM postings p JOIN df f USING (term) CROSS JOIN stats s
    ), folded AS (
        SELECT doc_id,
               {per_term}
        FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, ({add}) AS score FROM folded
    """


def bigram_lm_scores(
    docs,
    ref,
    id_col: str = "doc_id",
    words_col: str = "toks",
):
    """CCNet-style n-gram language-model scoring (Wenzek et al.,
    arXiv:1911.00359): train add-one-smoothed bigram counts on a clean
    REFERENCE corpus, score every document by its mean bigram
    log-probability — the fluency/quality filter big crawls run before
    training (low avg_logp ⇒ boilerplate, gibberish, wrong-language).

    ``lp(w1 w2) = ln((c(w1,w2) + 1) / (c(w1) + V))`` with counts from
    ``ref`` and V its unigram vocabulary size; OOV backs off to counts
    of zero. Returns (id, n_bigrams, avg_logp) for docs with ≥1 bigram.

    Plan shape at 100 TB: the LM is trained once on the BOUNDED
    reference slice (two partial-agg shuffles over ref only); V is a
    one-row broadcast. Scoring explodes each document's bigrams ONCE
    and joins the count tables on the bigram/unigram keys — Spark
    broadcasts them when the reference is small enough, else they
    shuffle; a stopword-pair hot key is absorbed by the partial
    aggregate on the scoring side and the AQE skew backstop. The
    per-doc mean is an unordered SUM of ~doc-length ln() terms; its
    cross-engine fp noise (~1e-14 relative) sits far below the 6-dp
    rounding, the same margin every ln/avg oracle in this engine
    rides."""
    def _w(df):
        return df.select(
            id_col, F.expr(f"filter({words_col}, x -> x <> '')").alias("_w")
        )

    def _bigrams(df):
        # explode_outer + post-Generate null filter: plain explode of
        # the computed bigram array re-inlines the whole tokenize →
        # transform pipeline in an inferred guard (planlint); the
        # size>=2 guard makes the array non-empty so the filter is a
        # row-identical no-op that just suppresses the inference.
        return _w(df).filter(F.size("_w") >= 2).select(
            id_col,
            F.explode_outer(
                F.expr(
                    "transform(sequence(1, size(_w) - 1), i -> "
                    "struct(concat_ws(' ', element_at(_w, i), "
                    "element_at(_w, i + 1)) AS bg, "
                    "element_at(_w, i) AS w1))"
                )
            ).alias("_b"),
        ).filter(F.col("_b").isNotNull()).select(
            id_col, F.col("_b.bg").alias("bg"), F.col("_b.w1").alias("w1")
        )

    refuni = (
        _w(ref)
        .select(F.explode_outer("_w").alias("w1"))
        .filter(F.col("w1").isNotNull())
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    refbi = _bigrams(ref).groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    vocab = refuni.agg(F.count(F.lit(1)).cast("double").alias("_v"))

    lp = F.log(
        (F.coalesce("c12", F.lit(0)) + 1.0)
        / (F.coalesce("c1", F.lit(0)) + F.col("_v"))
    )
    return (
        _bigrams(docs)
        .join(refbi, "bg", "left")
        .join(refuni, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(id_col, lp.alias("_lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("_lp"), 6).alias("avg_logp"),
        )
    )


def dup_ngram_fraction(
    docs,
    n: int = 8,
    id_col: str = "doc_id",
    words_col: str = "toks",
):
    """Duplicated-n-gram fraction: for every document, the share of its
    word n-grams that also occur in at least one OTHER document — the
    corpus-level repetition signal Dolma/FineWeb-class pipelines score
    before training (high fraction ⇒ boilerplate, mirrored pages,
    template spam). Unlike `llm_repetition_filter` (repetition WITHIN a
    document) this measures cross-document duplication without running
    a pair join.

    Returns (id, n_ngrams, n_dup_ngrams, dup_frac) for docs with ≥ n
    tokens.

    Plan shape: positional n-grams explode once; the gram →
    distinct-doc-count table is a two-level aggregate (distinct
    (gram, doc) collapses each doc's internal repeats map-side, then a
    per-gram count), and the scoring join is gram-keyed with the
    per-doc aggregate directly on top. Everything shuffles on the gram
    hash — n·L rows, the honest cost of exact corpus-wide n-gram
    statistics (this IS what Dolma runs at trillion-token scale); a
    boilerplate hot gram is one shuffle key whose count partial-aggs
    map-side, so skew stays in the join, absorbed by AQE."""
    g = (
        docs.select(
            id_col, F.expr(f"filter({words_col}, x -> x <> '')").alias("_w")
        )
        .filter(F.size("_w") >= n)
        .select(
            id_col,
            # explode_outer, NOT explode: plain explode makes Catalyst
            # infer a non-empty guard (InferFiltersFromGenerate) that
            # inlines the whole tokenize→n-gram pipeline a second time
            # below the projection; the outer variant infers nothing
            # and the (impossible, size≥n) null rows are dropped after.
            F.explode_outer(
                F.expr(
                    f"transform(sequence(1, size(_w) - {n - 1}), i -> "
                    f"concat_ws(' ', slice(_w, i, {n})))"
                )
            ).alias("g"),
        )
        .filter(F.col("g").isNotNull())
    )
    gd = (
        g.select("g", id_col)
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("_ndocs"))
    )
    return (
        g.join(gd, "g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(
                F.when(F.col("_ndocs") >= 2, 1).otherwise(0)
            ).alias("n_dup_ngrams"),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_dup_ngrams",
            F.round(
                F.col("n_dup_ngrams") / F.col("n_ngrams").cast("double"), 6
            ).alias("dup_frac"),
        )
    )


def bpe_merge_rounds(
    docs,
    rounds: int = 2,
    words_col: str = "toks",
):
    """Byte-pair-encoding tokenizer training, ``rounds`` merge
    iterations (Sennrich et al., arXiv:1508.07909) — the vocabulary
    induction step of tokenizer training, run corpus-wide.

    The distributed shape (how SentencePiece/HF train at scale too):
    the corpus collapses FIRST to a (word, freq) table — vocabulary-
    sized, not corpus-sized — and every BPE round runs over that
    table: count adjacent symbol pairs weighted by word freq (one
    vocab-sized shuffle), pick the argmax pair (cnt DESC, pair ASC —
    a deterministic 1-row TakeOrdered), apply the merge map-side with
    the rule riding a broadcast. No collect: the loop chains lazily,
    one plan.

    Symbols are rendered ``␟a␞␟b␞...`` (U+001F unit-separator open,
    U+001E record-separator close) so a merge is a plain
    ``replace(repr, '␟a␞␟b␞', '␟ab␞')`` — the delimiters make
    cross-symbol false matches impossible, and both engines apply
    replace left-to-right non-overlapping, which IS greedy BPE merge
    order. Control delimiters (r5 ADVICE upgrade from ``<``/``>``)
    cannot occur in real tokens, so literal angle brackets now merge
    like any other character; only the two control characters
    themselves are stripped up front (an innocuous normalization —
    they never carry meaning in text), identically in the SQL oracle.
    Returns one row per round: (round, merged_pair, cnt) with the
    merged pair in raw delimiter encoding.
    """
    d = docs.select(
        F.explode(
            F.expr(f"filter({words_col}, x -> x <> '')")
        ).alias("word")
    )
    w = d.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    sym = w.select(
        F.regexp_replace(
            F.regexp_replace("word", f"[{BPE_OPEN}{BPE_CLOSE}]", ""),
            "(.)",
            f"{BPE_OPEN}$1{BPE_CLOSE}",
        ).alias("repr"),
        "freq",
    )

    def pair_counts(sym_df):
        s = F.expr(
            f"regexp_extract_all(repr, '{BPE_OPEN}[^{BPE_CLOSE}]+{BPE_CLOSE}', 0)"
        )
        return (
            sym_df.select(s.alias("_s"), "freq")
            .select(
                # size<2 guard: sequence(1, 0) DESCENDS ([1, 0]) and
                # element_at(_s, 0) throws — the shingles() pitfall.
                F.explode(
                    F.expr(
                        "if(size(_s) < 2, cast(array() as array<string>), "
                        "transform(sequence(1, size(_s) - 1), i -> "
                        "concat(element_at(_s, i), element_at(_s, i + 1))))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p")
            .agg(F.sum("freq").alias("cnt"))
        )

    rules = []
    for r in range(1, rounds + 1):
        rule = (
            pair_counts(sym)
            .orderBy(F.col("cnt").desc(), "p")
            .limit(1)
            .select(F.lit(r).alias("round"), F.col("p").alias("merged_pair"), "cnt")
        )
        rules.append(rule)
        if r < rounds:
            sym = sym.crossJoin(
                F.broadcast(rule.select("merged_pair"))
            ).select(
                F.expr(
                    "replace(repr, merged_pair,"
                    f" replace(merged_pair, '{BPE_CLOSE}{BPE_OPEN}', ''))"
                ).alias("repr"),
                "freq",
            )

    out = rules[0]
    for rule in rules[1:]:
        out = out.unionAll(rule)
    return out.orderBy("round")


def normalize_text(text_col: str = "text") -> Column:
    """Canonical text normalization: lowercase, non-alphanumerics → space,
    whitespace runs collapsed, trimmed. Pure codegen string expressions
    (no UDF); the regexes stay inside the shared RE2-compatible subset so
    the DuckDB oracle reproduces them byte-for-byte."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )


NORMALIZE_SQL = (
    "trim(regexp_replace(regexp_replace(lower({t}), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)
