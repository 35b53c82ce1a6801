"""Dataset-construction queries: splits, sampling, packing, redaction,
decontamination, and sketch aggregates.

The training-corpus assembly stages that sit between raw documents and
a training run, each as a registered, oracle-checked query. These are
the operators a 100 TB pipeline runs *after* dedup/quality filtering
(llm_corpus.py) to produce the actual training mix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import datasets
from ..llm.text import (
    BPE_TOKEN_COUNT_SQL,
    bpe_token_count,
    quality_score,
    shingles_sql,
    words,
)
from ..tables import load
from .registry import query

# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------


@query(
    "llm_dataset_split",
    oracle=f"""
    SELECT split, lang, COUNT(*) AS docs, ROUND(AVG(n_chars), 6) AS avg_chars
    FROM (
        SELECT lang, n_chars, {datasets.split_sql("doc_id")} AS split
        FROM documents
    )
    GROUP BY split, lang
    ORDER BY split, lang
    """,
    tags=("llm", "dataset-split"),
)
def llm_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split by md5 hash bucket of
    the document id, audited per (split, language). Hash-based splits
    are the production norm: membership is recomputable from the key
    alone (no membership table), stable under corpus growth, and —
    because the hash is portable md5 — bit-identical in any engine, as
    the DuckDB oracle proves. Pure projection: no shuffle besides the
    tiny audit aggregate."""
    d = datasets.assign_split(load(spark, sf_dir, "documents"), "doc_id")
    return (
        d.groupBy("split", "lang")
        .agg(
            F.count("*").alias("docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .orderBy("split", "lang")
    )


# ---------------------------------------------------------------------------
# Stratified sampling
# ---------------------------------------------------------------------------
_SAMPLE_RATES = {"en": 0.25, "zh": 0.8}


@query(
    "llm_stratified_sample",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM documents
    WHERE {datasets.stratified_sample_sql("lang", _SAMPLE_RATES, "doc_id")}
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("llm", "stratified-sample"),
)
def llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling for corpus rebalancing:
    keep 25% of English, 80% of Chinese, 100% of low-resource
    languages, with membership decided by a per-document hash bucket
    (not a random draw — the same document survives every re-run and
    every engine). The id_checksum pins the exact surviving set, not
    just its size. Scales as a scan + filter; no shuffle."""
    d = datasets.stratified_sample(
        load(spark, sf_dir, "documents"), "lang", _SAMPLE_RATES, "doc_id"
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------
_PACK_BUDGET = 512


@query(
    "llm_sequence_packing",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source,
               {BPE_TOKEN_COUNT_SQL.format(col="text")} AS n_tokens
        FROM documents
    ), p AS (
        SELECT *,
               {datasets.pack_sequences_sql("source", "doc_id", "n_tokens", _PACK_BUDGET)}
                   AS chunk_id
        FROM d
    )
    SELECT source, chunk_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens
    FROM p
    GROUP BY source, chunk_id
    ORDER BY source, chunk_id
    """,
    tags=("llm", "sequence-packing"),
)
def llm_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-split sequence packing into 512-token training
    chunks, sharded by source: each document joins the chunk its first
    token lands in under a running token total. One shuffle (on the
    shard key) + one window pass; shards pack independently, so the
    packing parallelizes across a 100 TB corpus instead of
    serializing on a global document order."""
    d = load(spark, sf_dir, "documents").withColumn(
        "n_tokens", bpe_token_count("text")
    )
    packed = datasets.pack_sequences(d, "source", "doc_id", "n_tokens", _PACK_BUDGET)
    return (
        packed.groupBy("source", "chunk_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("chunk_tokens"),
        )
        .orderBy("source", "chunk_id")
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------
_PLANT_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com or call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


@query(
    "llm_pii_redaction",
    oracle=f"""
    WITH planted AS (
        SELECT doc_id, {_PLANT_SQL} AS text2
        FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           len(regexp_extract_all(text2, '{datasets.EMAIL_REGEX}', 0)) AS n_emails,
           len(regexp_extract_all(text2, '{datasets.PHONE_REGEX}', 0)) AS n_phones,
           md5({datasets.redact_pii_sql("text2")}) AS redacted_md5
    FROM planted
    ORDER BY doc_id
    """,
    tags=("llm", "pii-redaction"),
)
def llm_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: plant a deterministic email + phone per
    document (the corpus has none), count matches for the audit
    metric, and redact to typed placeholders. The md5 of the redacted
    text is hash-verified against DuckDB, proving the regex semantics
    agree byte-for-byte across engines. Pure per-row projection — the
    cheapest shape a 100 TB scrub can have."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    planted = d.withColumn(
        "text2",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    )
    n_emails, n_phones = datasets.pii_counts(F.col("text2"))
    return planted.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        F.md5(datasets.redact_pii(F.col("text2"))).alias("redacted_md5"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------
_DECON_SQL = f"""
    WITH t AS (
        SELECT doc_id, source, string_split(lower(text), ' ') AS w FROM documents
    ), s AS (
        SELECT doc_id, source, {shingles_sql("w", 5)} AS sh FROM t
    ), ex AS (
        SELECT doc_id, source, unnest(sh) AS shingle FROM s
    ), ev AS (
        SELECT DISTINCT shingle, doc_id AS eval_id FROM ex WHERE source = 'src0'
    ), tr AS (
        SELECT doc_id, shingle FROM ex WHERE source <> 'src0'
    )
    SELECT tr.doc_id,
           COUNT(DISTINCT shingle) AS n_shared_shingles,
           COUNT(DISTINCT eval_id) AS n_eval_docs_hit
    FROM tr JOIN ev USING (shingle)
    GROUP BY tr.doc_id
    ORDER BY tr.doc_id
"""


@query("llm_decontamination", oracle=_DECON_SQL, tags=("llm", "decontamination"))
def llm_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training documents (sources ≠ src0)
    sharing any 5-gram with the held-out eval set (src0), with shared
    shingle and eval-document counts. The eval side is aggregated and
    broadcast — the train side (the 100 TB one) is scanned once and
    never shuffled before the per-document aggregate. This is the
    n-gram-overlap contamination check run before every serious
    training job. Shingles are built by position-explode (codegen), not
    a higher-order transform (interpreted) — 3.3× measured at sf0.1."""
    d = load(spark, sf_dir, "documents").withColumn("toks", words("text"))
    train = d.filter(F.col("source") != "src0")
    eval_set = d.filter(F.col("source") == "src0")
    return datasets.contamination_report(train, eval_set).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Sketch aggregates (approximate distinct)
# ---------------------------------------------------------------------------


@query(
    "q_approx_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(*) AS n_events,
           TRUE AS within_bound
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("sketch", "approx"),
)
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user counts per event type
    (``approx_count_distinct``, rsd 2%) audited against the exact count
    in the same query. The sketch is THE 100 TB cardinality plan:
    fixed-size (~kB) partial state per group merges map-side, versus
    the exact count's full shuffle of every distinct (group, user)
    pair.

    The sketch estimate itself is engine-specific, so the hashable
    output carries the deterministic columns (exact count, row count)
    plus ``within_bound`` — the ≤5% relative-error contract evaluated
    in-query; the oracle returns the exact values and TRUE, so a
    drifting sketch flips the boolean and fails the hash."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
        )
        .select(
            "event_type",
            "exact_users",
            "n_events",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("within_bound"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Document chunking
# ---------------------------------------------------------------------------


@query(
    "llm_doc_chunking",
    oracle=f"""
    WITH docs_w AS (
        SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    )
    SELECT doc_id, chunk_idx, md5(chunk_text) AS chunk_md5, chunk_tokens
    FROM ({datasets.chunk_documents_sql("w", 64, 16)})
    ORDER BY doc_id, chunk_idx
    """,
    tags=("llm", "chunking"),
)
def llm_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: every document splits into 64-token
    chunks with 16-token overlap (stride 48), the final chunk clamped
    short so no token is dropped — the step that turns documents into
    training/embedding inputs. The md5 of each chunk's text is
    hash-compared against DuckDB computing the identical slicing, so
    the window arithmetic agrees byte-for-byte. Pure 1→N per-row
    fan-out (explode of an int sequence + codegen slice): no shuffle,
    linear at 100 TB."""
    d = load(spark, sf_dir, "documents").withColumn("toks", words("text"))
    chunks = datasets.chunk_documents(d, "toks", "doc_id", 64, 16)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.md5("chunk_text").alias("chunk_md5"),
        "chunk_tokens",
    ).orderBy("doc_id", "chunk_idx")


# ---------------------------------------------------------------------------
# Weighted dataset mixing
# ---------------------------------------------------------------------------
#: Per-source mixture weight: 0.5 + (source number mod 4) · 0.75, i.e.
#: {0.5, 1.25, 2.0, 2.75} — exercises pure-downsample (w < 1), exact
#: integer epochs (w = 2.0), and both fractional cases.
_MIX_WEIGHT = "0.5 + (CAST(substring(source, 4) AS INT) % 4) * 0.75"


@query(
    "llm_dataset_mixture",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, source,
               CAST({_MIX_WEIGHT} AS DOUBLE) AS weight,
               {datasets.mixture_copies_sql("doc_id", f"({_MIX_WEIGHT})")} AS n_copies
        FROM documents
    )
    SELECT source,
           ROUND(MIN(weight), 6) AS weight,
           COUNT(*) AS n_docs,
           CAST(SUM(n_copies) AS BIGINT) AS n_rows_out,
           CAST(SUM(doc_id * n_copies) AS BIGINT) AS id_checksum
    FROM w
    GROUP BY source
    ORDER BY source
    """,
    tags=("llm", "dataset-mixture"),
)
def llm_dataset_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted training-mixture assembly: each source gets a sampling
    weight (fractional epochs), rows replicate ``floor(w)`` times plus
    a deterministic hash-Bernoulli extra — the corpus-mixing step of
    every pretraining pipeline (downweight boilerplate sources, repeat
    scarce ones), auditable because membership is a pure function of
    (seed, doc_id).

    The Spark side MATERIALIZES the mixture (explode of an int
    sequence — a per-row 1→N Generate, no shuffle) and aggregates the
    exploded stream; the oracle integrates the copy counts analytically
    (Σ n_copies), so a hash match proves the fan-out produced exactly
    the rows the rule prescribes. The id_checksum (Σ doc_id · copies)
    pins per-document multiplicity, not just totals. The only shuffle
    anywhere is the 20-accumulator final aggregate."""
    d = load(spark, sf_dir, "documents")
    weight = F.expr(_MIX_WEIGHT).cast("double")
    staged = d.select(
        "doc_id",
        "source",
        weight.alias("weight"),
        datasets.mixture_copies(F.col("doc_id"), weight).alias("n_copies"),
    )
    mixture = staged.where(F.col("n_copies") >= 1).withColumn(
        "copy_idx", F.explode(F.expr("sequence(1, n_copies)"))
    )
    per_source_out = mixture.groupBy("source").agg(
        F.count("*").cast("long").alias("n_rows_out"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
    )
    per_source_in = staged.groupBy("source").agg(
        F.round(F.min("weight"), 6).alias("weight"),
        F.count("*").alias("n_docs"),
    )
    return (
        per_source_in.join(F.broadcast(per_source_out), "source", "left")
        .select(
            "source",
            "weight",
            "n_docs",
            F.coalesce("n_rows_out", F.lit(0)).alias("n_rows_out"),
            F.coalesce("id_checksum", F.lit(0)).alias("id_checksum"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Embedding-space decontamination (round 4)
# ---------------------------------------------------------------------------

#: Cosine threshold for semantic train↔eval overlap. Calibrated so the
#: contaminated set is non-trivial at every SF (51 flagged at sf0.01,
#: 211 at sf0.1) without flooding the report.
_EDECON_TAU = 0.35
#: The held-out eval slice: deterministic id range, bounded at any SF.
_EDECON_EVAL_IDS = 50


def _edecon_oracle() -> str:
    from ..llm.similarity import dot_sql

    dims = 64
    n = "sqrt(" + dot_sql("embedding", "embedding", dims) + ")"
    return f"""
    WITH ev AS (
        SELECT vec_id, embedding, {n} AS nrm
        FROM embeddings WHERE vec_id < {_EDECON_EVAL_IDS}
    ), tr AS (
        SELECT vec_id, embedding, {n} AS nrm
        FROM embeddings WHERE vec_id >= {_EDECON_EVAL_IDS}
    ), hits AS (
        SELECT t.vec_id, e.vec_id AS eval_id,
               ROUND(({dot_sql('t.embedding', 'e.embedding', dims)})
                     / (t.nrm * e.nrm), 6) AS cos
        FROM tr t CROSS JOIN ev e
    )
    SELECT vec_id,
           COUNT(*) AS n_eval_matches,
           MAX(cos) AS max_cos
    FROM hits WHERE cos >= {_EDECON_TAU}
    GROUP BY vec_id
    ORDER BY vec_id
    """


@query(
    "llm_embedding_decontamination",
    oracle=_edecon_oracle(),
    tags=("llm", "decontamination", "embedding", "extension"),
)
def llm_embedding_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination: training vectors whose cosine to ANY
    held-out eval vector reaches the threshold — the embedding-space
    complement of the n-gram check (`llm_decontamination`), catching
    paraphrased benchmark leakage that shares no 5-gram.

    The eval side is bounded by construction (a benchmark is thousands
    of rows, not a corpus) and BROADCAST with its norms precomputed;
    the train side — the 100 TB one — is scanned once, scored map-side
    against the broadcast slab, and only flagged (id, count, max-cos)
    rows ever shuffle into the per-document aggregate. Cosines are the
    shared left-to-right double fold, rounded to 6 dp BEFORE the
    threshold and MAX on both engines."""
    from ..llm import similarity

    emb = load(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") < _EDECON_EVAL_IDS).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("_ee"),
        similarity.norm("embedding").alias("_ne"),
    )
    tr = emb.filter(F.col("vec_id") >= _EDECON_EVAL_IDS).select(
        "vec_id",
        F.col("embedding").alias("_et"),
        similarity.norm("embedding").alias("_nt"),
    )
    cos = F.round(
        similarity.dot("_et", "_ee") / (F.col("_nt") * F.col("_ne")), 6
    )
    return (
        tr.crossJoin(F.broadcast(ev))
        .withColumn("_cos", cos)
        .filter(F.col("_cos") >= _EDECON_TAU)
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).alias("n_eval_matches"),
            F.max("_cos").alias("max_cos"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# End-to-end training-data pipeline (round 4)
# ---------------------------------------------------------------------------
_E2E_QUALITY_FLOOR = 0.4


def _e2e_oracle() -> str:
    from ..llm.text import quality_score_sql

    return f"""
    WITH t AS (
        SELECT doc_id, source, text,
               string_split(lower(text), ' ') AS w
        FROM documents
    ), scored AS (
        SELECT doc_id, source, text,
               {quality_score_sql('text', 'w')} AS q
        FROM t
    ), filtered AS (
        SELECT * FROM scored WHERE q >= {_E2E_QUALITY_FLOOR}
    ), deduped AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY text ORDER BY doc_id) AS _rn
            FROM filtered
        ) WHERE _rn = 1
    ), split AS (
        SELECT doc_id, source,
               {BPE_TOKEN_COUNT_SQL.format(col="text")} AS n_tokens
        FROM deduped
        WHERE {datasets.split_sql("doc_id")} = 'train'
    ), packed AS (
        SELECT source, n_tokens,
               {datasets.pack_sequences_sql("source", "doc_id", "n_tokens", 512)}
                   AS chunk_id
        FROM split
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT chunk_id) AS BIGINT) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM packed
    GROUP BY source
    ORDER BY source
    """


@query(
    "llm_training_pipeline_e2e",
    oracle=_e2e_oracle(),
    tags=("llm", "pipeline-composite", "extension"),
)
def llm_training_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The assembled training-data pipeline, one lazy plan end to end:
    quality filter (composite score ≥ 0.4) → exact dedup (min-id per
    body) → deterministic hash-bucket train split → 512-token sequence
    packing per source shard — i.e. the stages every other query in
    the LLM pillar verifies in isolation, COMPOSED, with the hash
    check certifying the stage boundaries (a row dropped or duplicated
    between stages shifts every downstream count).

    Plan shape: the stages chain filter → window-on-text → filter →
    window-on-source with no action in between, so Catalyst sees ONE
    tree — the corpus is scanned once, and the only exchanges are the
    dedup hash on the body digest and the shard hash for packing.
    That composability IS the 100 TB pitch: a user swaps any stage
    (MinHash for exact dedup, a classifier for the heuristic score)
    without re-materializing intermediates."""
    d = load(spark, sf_dir, "documents").withColumn("toks", words("text"))
    scored = d.withColumn("q", quality_score("text", "toks"))
    filtered = scored.filter(F.col("q") >= _E2E_QUALITY_FLOOR)
    from pyspark.sql import Window

    rn = F.row_number().over(Window.partitionBy("text").orderBy("doc_id"))
    deduped = filtered.withColumn("_rn", rn).filter(F.col("_rn") == 1)
    split = (
        datasets.assign_split(deduped, "doc_id")
        .filter(F.col("split") == "train")
        .withColumn("n_tokens", bpe_token_count("text"))
    )
    packed = datasets.pack_sequences(split, "source", "doc_id", "n_tokens", 512)
    return (
        packed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("chunk_id").alias("n_chunks"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("source")
    )
