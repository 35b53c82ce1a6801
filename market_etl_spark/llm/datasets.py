"""Dataset-construction operators for training-data pipelines:
deterministic splits, stratified sampling, sequence packing, PII
redaction, and benchmark decontamination.

Like :mod:`.text`, every operator has a Spark Column/DataFrame builder
and a matching ANSI-SQL rendering for the DuckDB oracle. All hashing is
md5-based (portable across engines) so splits/samples are reproducible
bit-for-bit anywhere — the property a real pipeline needs so a re-run
months later lands every document in the same split.

Scale notes: split/sample/redaction are per-row projections (no
shuffle, linear in input splits). Packing shuffles once on the group
key. Decontamination explodes n-grams but joins against the *eval*
side, which for benchmark-contamination checks is small enough to
broadcast — the 100 TB train side is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# ---------------------------------------------------------------------------
# Deterministic hash bucketing (the primitive under splits and sampling)
# ---------------------------------------------------------------------------


def hash_bucket(key: Column, seed: str, n_buckets: int) -> Column:
    """Uniform deterministic bucket in [0, n_buckets): first 8 hex chars
    of md5(seed | key) as an integer, mod n_buckets. Engine-portable —
    any system with md5 assigns identical buckets, which is what makes
    train/test membership reproducible across engines and re-runs."""
    digest = F.md5(F.concat_ws("|", F.lit(seed), key.cast("string")))
    return (F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % n_buckets).alias(
        "bucket"
    )


def hash_bucket_sql(key_expr: str, seed: str, n_buckets: int) -> str:
    """DuckDB rendering of :func:`hash_bucket`."""
    return (
        f"CAST(('0x' || substring(md5('{seed}' || '|' || CAST({key_expr} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {n_buckets}"
    )


# ---------------------------------------------------------------------------
# Train / validation / test split
# ---------------------------------------------------------------------------
#: (name, cumulative upper bound in percent) — train [0,90), val [90,95),
#: test [95,100).
DEFAULT_SPLITS = (("train", 90), ("val", 95), ("test", 100))


def assign_split(
    df: DataFrame,
    key_col: str,
    seed: str = "split-v1",
    splits=DEFAULT_SPLITS,
) -> DataFrame:
    """Add a ``split`` column by deterministic hash bucket of ``key_col``.

    Hash-based (not random) assignment is the production norm: adding
    new documents never reshuffles existing ones between splits, and
    the assignment is recomputable from the key alone — no membership
    table to store or join at 100 TB."""
    b = hash_bucket(F.col(key_col), seed, 100)
    expr = F.when(b < splits[0][1], splits[0][0])
    for name, hi in splits[1:-1]:
        expr = expr.when(b < hi, name)
    expr = expr.otherwise(splits[-1][0])
    return df.withColumn("split", expr)


def split_sql(key_expr: str, seed: str = "split-v1", splits=DEFAULT_SPLITS) -> str:
    """DuckDB rendering of :func:`assign_split`'s split expression."""
    b = hash_bucket_sql(key_expr, seed, 100)
    arms = "".join(
        f" WHEN ({b}) < {hi} THEN '{name}'" for name, hi in splits[:-1]
    )
    return f"CASE{arms} ELSE '{splits[-1][0]}' END"


# ---------------------------------------------------------------------------
# Stratified sampling
# ---------------------------------------------------------------------------


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 1.0,
    seed: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its hash
    bucket (of the row key, 10 000 buckets for 4-digit rate precision)
    falls under the stratum's rate. The language-rebalancing stage of a
    corpus pipeline — e.g. downweight English, keep all low-resource
    languages — with exactly reproducible membership (unlike
    ``DataFrame.sampleBy``, which is seeded-random per partition)."""
    b = hash_bucket(F.col(key_col), seed, 10_000)
    rate = F.lit(default_rate)
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(r)).otherwise(rate)
    return df.filter(b < (rate * 10_000).cast("long"))


def stratified_sample_sql(
    stratum_expr: str,
    rates: dict[str, float],
    key_expr: str,
    default_rate: float = 1.0,
    seed: str = "sample-v1",
) -> str:
    """DuckDB WHERE-clause rendering of :func:`stratified_sample`."""
    b = hash_bucket_sql(key_expr, seed, 10_000)
    arms = "".join(
        f" WHEN {stratum_expr} = '{v}' THEN {r}" for v, r in sorted(rates.items())
    )
    rate = f"CASE{arms} ELSE {default_rate} END"
    return f"({b}) < CAST(({rate}) * 10000 AS BIGINT)"


# ---------------------------------------------------------------------------
# Weighted dataset mixing (fractional epochs)
# ---------------------------------------------------------------------------


def mixture_copies(key: Column, weight: Column, seed: str = "mixture-v1") -> Column:
    """How many times a row appears in a weighted training mixture:
    ``floor(w)`` guaranteed copies plus one more with probability
    ``frac(w)``, decided by the row's own md5 hash — the standard
    fractional-epoch upsampling rule (weight 2.3 ⇒ every doc twice,
    a deterministic 30% of docs a third time).

    Hash-Bernoulli instead of ``rand()`` so mixture membership is a
    pure function of (seed, key): re-runs, retries, and other engines
    reproduce the exact same corpus — the property that makes a
    training mixture auditable."""
    base = F.floor(weight).cast("int")
    frac = weight - F.floor(weight)
    u = hash_bucket(key, seed, 1_000_000).cast("double") / F.lit(1e6)
    return base + F.when(u < frac, F.lit(1)).otherwise(F.lit(0))


def mixture_copies_sql(key_expr: str, weight_expr: str, seed: str = "mixture-v1") -> str:
    """DuckDB rendering of :func:`mixture_copies`."""
    u = f"(CAST({hash_bucket_sql(key_expr, seed, 1_000_000)} AS DOUBLE) / 1e6)"
    return (
        f"(CAST(FLOOR({weight_expr}) AS INT) + CASE WHEN {u} < "
        f"({weight_expr}) - FLOOR({weight_expr}) THEN 1 ELSE 0 END)"
    )


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Concat-then-split sequence packing: documents are laid out in
    deterministic order within each group and assigned to the
    fixed-token-budget chunk their first token lands in (``floor`` of
    the running token total before the document / budget) — the
    standard "concatenate the corpus, slice into context windows"
    packing used to build LLM training batches.

    One shuffle on the group key; the running sum is a single window
    pass. Group = shard key (here: source) so packing parallelizes
    across shards at 100 TB rather than serializing on one global
    order."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn("chunk_id", F.floor(prev / F.lit(budget)).cast("long"))


def pack_sequences_sql(
    group_expr: str, order_expr: str, token_expr: str, budget: int
) -> str:
    """DuckDB rendering of the chunk assignment of :func:`pack_sequences`."""
    return (
        f"CAST(floor(COALESCE(SUM({token_expr}) OVER ("
        f"PARTITION BY {group_expr} ORDER BY {order_expr} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        f"/ {budget}.0) AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------
#: Deliberately simple patterns valid in both Java regex (Spark) and RE2
#: (DuckDB): email-shaped tokens and 555-prefixed phone numbers.
EMAIL_REGEX = r"[a-z0-9._]+@[a-z0-9]+\.[a-z]+"
PHONE_REGEX = r"555-[0-9]{4}"


def redact_pii(text_col: Column) -> Column:
    """Replace email/phone matches with typed placeholder tags. Pure
    per-row string projection — the cheapest possible shape for a
    100 TB scrubbing pass (no shuffle, pushdown-friendly)."""
    out = F.regexp_replace(text_col, F.lit(EMAIL_REGEX), F.lit("[EMAIL]"))
    return F.regexp_replace(out, F.lit(PHONE_REGEX), F.lit("[PHONE]"))


def pii_counts(text_col: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) match counts for audit metrics."""
    return (
        F.size(F.regexp_extract_all(text_col, F.lit(EMAIL_REGEX), F.lit(0))).cast("long"),
        F.size(F.regexp_extract_all(text_col, F.lit(PHONE_REGEX), F.lit(0))).cast("long"),
    )


def redact_pii_sql(text_expr: str) -> str:
    """DuckDB rendering of :func:`redact_pii` (global replace flag)."""
    return (
        f"regexp_replace(regexp_replace({text_expr}, '{EMAIL_REGEX}', '[EMAIL]', 'g'), "
        f"'{PHONE_REGEX}', '[PHONE]', 'g')"
    )


# ---------------------------------------------------------------------------
# Document chunking (long doc → overlapping fixed-size training chunks)
# ---------------------------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    tokens_col: str = "toks",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document's token array into fixed-size chunks with
    overlap — the standard context-window chunking before training or
    embedding: chunk k covers tokens [k·stride+1, k·stride+chunk_size]
    (1-based), stride = chunk_size - overlap, and the final chunk is
    clamped short rather than padded so every token appears.

    Shaped like :func:`shingle_rows`: explode a cheap integer
    ``sequence`` (plain Generate) and build each chunk in the
    post-explode projection with ``slice``/``concat_ws`` — codegen
    expressions, no higher-order lambdas. Per-row work only, no
    shuffle: scales linearly with input splits, and the 1→N fan-out is
    bounded by ceil(|doc|/stride)."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    return (
        df.select(F.col(id_col), F.col(tokens_col))
        .withColumn(
            "_nc",
            F.expr(
                f"1 + cast(ceil(greatest(size({tokens_col}) - {chunk_size}, 0)"
                f" / {stride}.0) as int)"
            ),
        )
        .select(
            id_col,
            tokens_col,
            F.explode(F.expr("sequence(0, _nc - 1)")).alias("_ci"),
        )
        .select(
            id_col,
            F.col("_ci").cast("long").alias("chunk_idx"),
            F.expr(
                f"concat_ws(' ', slice({tokens_col}, _ci * {stride} + 1, {chunk_size}))"
            ).alias("chunk_text"),
            F.expr(
                f"size(slice({tokens_col}, _ci * {stride} + 1, {chunk_size}))"
            ).cast("long").alias("chunk_tokens"),
        )
    )


def chunk_documents_sql(
    words_expr: str = "w", chunk_size: int = 64, overlap: int = 16
) -> str:
    """DuckDB rendering of :func:`chunk_documents`'s per-document
    fan-out: emits ``chunk_idx`` / ``chunk_text`` / ``chunk_tokens``
    select expressions for a table exposing ``doc_id`` and the token
    list ``words_expr``."""
    stride = chunk_size - overlap
    lo = f"chunk_idx * {stride} + 1"
    hi = f"chunk_idx * {stride} + {chunk_size}"
    return f"""
        SELECT doc_id, chunk_idx,
               array_to_string(list_slice({words_expr}, {lo}, {hi}), ' ') AS chunk_text,
               len(list_slice({words_expr}, {lo}, {hi}))::BIGINT AS chunk_tokens
        FROM (
            SELECT doc_id, {words_expr},
                   unnest(range(0, 1 + CAST(CEIL(GREATEST(len({words_expr}) - {chunk_size}, 0)
                         / {stride}.0) AS BIGINT))) AS chunk_idx
            FROM docs_w
        )
    """


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


def shingle_rows(
    df: DataFrame, tokens_col: str, n: int, id_col: str, out_id: str
) -> DataFrame:
    """(id, shingle) rows by position-exploding the token array: explode
    ``sequence(1, size - n + 1)`` (a cheap Generate), then build each
    n-gram in the post-explode projection with ``element_at``/
    ``concat_ws`` — plain codegen-friendly expressions. Building the
    shingle *array* with a higher-order ``transform`` and exploding
    that is ~10× slower: HOF lambdas never enter whole-stage codegen,
    and a Generate over a nested-lambda input is itself interpreted.
    The repartition spreads rows across cores (AQE would otherwise
    coalesce a small scan to one task) and stops Catalyst re-inlining
    the tokenize upstream of the explode."""
    parts = ", ".join(f"element_at({tokens_col}, pos + {j})" for j in range(n))
    n_part = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(F.col(id_col).alias(out_id), F.col(tokens_col))
        .filter(F.size(tokens_col) >= n)
        .repartition(n_part, F.col(out_id))
        .select(
            out_id,
            F.col(tokens_col),
            F.explode(
                F.sequence(F.lit(1), F.size(tokens_col) - (n - 1))
            ).alias("pos"),
        )
        .select(out_id, F.expr(f"concat_ws(' ', {parts})").alias("shingle"))
    )


def contamination_report(
    train: DataFrame,
    eval_set: DataFrame,
    tokens_col: str = "toks",
    n: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag training documents sharing any n-gram shingle with an
    evaluation set: position-explode both sides' token arrays into
    shingle rows, inner-join on the shingle, count distinct shared
    shingles and distinct eval documents hit per training document.

    The eval side (a benchmark: thousands of documents, not billions)
    is aggregated then **broadcast**, so the train side — the 100 TB
    one — is never shuffled: the plan is scan → explode → broadcast
    hash join → partial agg. This is the standard n-gram overlap
    decontamination used before training runs."""
    train_sh = shingle_rows(train, tokens_col, n, id_col, "train_id")
    eval_sh = (
        shingle_rows(eval_set, tokens_col, n, id_col, "eval_id")
        .groupBy("shingle")
        .agg(F.collect_set("eval_id").alias("eval_ids"))
    )
    joined = train_sh.join(F.broadcast(eval_sh), "shingle")
    return (
        joined.groupBy("train_id")
        .agg(
            F.countDistinct("shingle").alias("n_shared_shingles"),
            F.size(F.array_distinct(F.flatten(F.collect_list("eval_ids")))).cast(
                "long"
            ).alias("n_eval_docs_hit"),
        )
        .withColumnRenamed("train_id", id_col)
    )


# ---------------------------------------------------------------------------
# Weighted priority sampling (deterministic, without replacement)
# ---------------------------------------------------------------------------
def priority_key(key: Column, weight: Column, seed: str = "wsample-v1") -> Column:
    """Deterministic priority for weight-sensitive sampling without
    replacement: ``u / w`` where ``u`` is the md5-derived uniform 32-bit
    integer (+1, never zero) and ``w`` the item's weight — the k items
    with the SMALLEST priorities form the sample (priority sampling,
    Duffield/Lund/Thorup JACM 2007: selection probability grows with
    weight; estimates from the sample are unbiased under their
    threshold estimator).

    Engine-portable by construction: the uniform comes from md5 (same
    trick as :func:`hash_bucket`) and the only arithmetic is ONE
    IEEE-754 double division, which every conforming engine rounds
    identically — so the selected SET (not just its distribution) is
    bit-reproducible across Spark, DuckDB, and re-runs, which is what
    an auditable training-mixture pipeline needs."""
    digest = F.md5(F.concat_ws("|", F.lit(seed), key.cast("string")))
    u = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") + F.lit(1)
    return (u.cast("double") / weight.cast("double")).alias("priority")


def priority_key_sql(key_expr: str, weight_expr: str, seed: str = "wsample-v1") -> str:
    """DuckDB rendering of :func:`priority_key` (same digest, same
    single division)."""
    return (
        f"(CAST(('0x' || substring(md5('{seed}' || '|' || CAST({key_expr} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) + 1)::DOUBLE / CAST({weight_expr} AS DOUBLE)"
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: str = "wsample-v1",
) -> DataFrame:
    """The k rows with the smallest :func:`priority_key` (ties broken by
    key) — a weighted sample without replacement that is a pure
    function of (keys, weights, seed). Plans as TakeOrderedAndProject:
    each partition keeps its local top-k, the driver merges k·P rows —
    no global sort, no shuffle of the data itself, so it runs at any
    corpus size for any sane k."""
    return (
        df.withColumn(
            "priority", priority_key(F.col(key_col), F.col(weight_col), seed)
        )
        .orderBy("priority", key_col)
        .limit(k)
    )


def stratified_weighted_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    weight_col: str,
    k_per_stratum: int,
    seed: str = "wsample-v1",
) -> DataFrame:
    """Per-stratum weighted sampling without replacement: within every
    ``stratum_col`` group, the ``k_per_stratum`` rows with the smallest
    priorities (ties by key). The per-group form of
    :func:`weighted_sample` — one window over the stratum partitioning
    (rank state is k rows per group, Spark's WindowGroupLimit prunes
    rows past the cut before the sort buffers them), same
    engine-portable determinism. This is how a training mixture takes
    'the best-weighted N docs per language/source' reproducibly."""
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy("priority", key_col)
    return (
        df.withColumn(
            "priority", priority_key(F.col(key_col), F.col(weight_col), seed)
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k_per_stratum)
        .drop("_rn", "priority")
    )
