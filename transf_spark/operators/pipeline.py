"""Training-data pipeline operators (north-star extension, round 2).

The ops a 100 TB pretraining-data pipeline runs between raw crawl and
tokenized shards, beyond dedup/similarity (dedup.py, similarity.py) and
quality scoring (text.py):

- ``sample_stratified``     — reproducible per-language hash sampling
- ``text_repetition_filter``— Gopher-style top-bigram repetition signal
- ``docs_pack_sequences``   — token-budget sequence packing (cumsum bins)
- ``text_denylist_scrub``   — dictionary scrub with redaction counts
- ``text_domain_cap``       — per-source document cap (crawl anti-bias)

All five are pure JVM expressions (no Python in the hot path) and every one
is oracle-checked against DuckDB.  Hash-based sampling uses md5 (portable
across engines, unlike xxhash64 seeding — same choice as dedup_simhash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from transf_spark.queries import register
from transf_spark.sources.tables import load_table

# Per-language keep-percentage: up-sample scarce langs, down-sample dominant
# ones — the standard rebalancing move before tokenization.
SAMPLE_PCT = {"en": 60, "es": 40, "zh": 40, "de": 25, "fr": 25}
SAMPLE_DEFAULT_PCT = 10

PACK_BUDGET = 2048  # tokens per packed sequence bin
PACK_SHARDS = 32  # parallel packing shards per language

DENYLIST = ("customer", "vector", "secret")
_DENY_RE = r"\b(customer|vector|secret)\b"

DOMAIN_CAP = 20  # max docs kept per source


def _sample_case_sql() -> str:
    arms = " ".join(f"WHEN '{k}' THEN {v}" for k, v in SAMPLE_PCT.items())
    return f"CASE lang {arms} ELSE {SAMPLE_DEFAULT_PCT} END"


@register(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
          < {_sample_case_sql()}
    """,
    category="pipeline/sampling",
    origin="EXT",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible stratified sampling: keep a per-language percentage of
    documents chosen by a content-independent hash of the id — NOT ``rand()``
    (not reproducible across retries/re-runs) and NOT ``TABLESAMPLE``
    (block-level, biased by layout). ``md5(doc_id)[:8] % 100`` gives every
    row a stable [0,100) draw that both engines compute identically; the
    filter is a pure map, pushed to the scan, zero shuffles — the only
    formulation that stays deterministic when a 1000-executor job retries
    tasks."""
    docs = load_table(spark, sf_dir, "documents")
    draw = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    pct = F.expr(_sample_case_sql())
    return docs.filter(draw < pct).select("doc_id", "lang", "source")


@register(
    "text_repetition_filter",
    oracle="""
    WITH bg AS (
      SELECT doc_id,
             len(string_split(text, ' ')) - 1 AS n_bigrams,
             unnest([string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
                     for i in generate_series(1, len(string_split(text,' ')) - 1)]) AS b
      FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    counts AS (
      SELECT doc_id, n_bigrams, b, COUNT(*) AS c FROM bg GROUP BY 1, 2, 3
    )
    SELECT doc_id,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CAST(MAX(c) AS BIGINT) AS top_bigram_n,
           CAST(MAX(c) AS DOUBLE) / n_bigrams AS rep_ratio,
           CAST(MAX(c) AS DOUBLE) / n_bigrams >= 0.1 AS is_repetitive
    FROM counts GROUP BY doc_id, n_bigrams
    """,
    category="pipeline/quality",
    origin="EXT",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal: the fraction of a document's word
    bigrams taken by its single most frequent bigram ("batch batch batch"
    spam scores high). Plan: split once, explode bigrams, one (doc, bigram)
    count aggregate, one per-doc max — two shuffles, both on high-cardinality
    keys, all codegen. The 0.1 flag threshold follows the published
    repetition-filter family (duplicate n-gram fraction)."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.split("text", " ").alias("w")).filter(F.size("w") >= 2)
    bg = w.select(
        "doc_id",
        (F.size("w") - 1).cast("long").alias("n_bigrams"),
        F.explode(
            F.expr("transform(sequence(0, size(w) - 2), i -> concat_ws(' ', w[i], w[i+1]))")
        ).alias("b"),
    )
    counts = bg.groupBy("doc_id", "n_bigrams", "b").agg(F.count(F.lit(1)).alias("c"))
    top = counts.groupBy("doc_id", "n_bigrams").agg(F.max("c").cast("long").alias("top_bigram_n"))
    ratio = F.col("top_bigram_n").cast("double") / F.col("n_bigrams")
    return top.select(
        "doc_id",
        "n_bigrams",
        "top_bigram_n",
        ratio.alias("rep_ratio"),
        (ratio >= 0.1).alias("is_repetitive"),
    )


@register(
    "docs_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, doc_id % {PACK_SHARDS} AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    placed AS (
      SELECT lang, shard, n_tokens,
             COALESCE(SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS tok_offset
      FROM toks
    )
    SELECT lang, CAST(shard AS BIGINT) AS shard,
           CAST(FLOOR(tok_offset / {PACK_BUDGET}) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           SUM(n_tokens) AS n_tokens
    FROM placed GROUP BY 1, 2, 3
    """,
    category="pipeline/packing",
    origin="EXT",
)
def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed token-budget bins
    (the pre-tokenization step that turns ragged documents into ~2048-token
    training sequences). Deterministic offset packing: within each
    (lang, shard) stream, a document's bin is ``floor(running-token-offset /
    budget)`` — order fixed by doc_id, so every run packs identically.

    Scale shape: the window partitions by (lang, {PACK_SHARDS} shards), so
    packing parallelism is lang × shard, not one task per language (a
    single-language 100 TB corpus would otherwise serialize). One shuffle,
    then a map-side-combinable aggregate over the same key prefix."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % PACK_SHARDS).cast("long").alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    win = (
        W.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    placed = toks.withColumn("offset", F.coalesce(F.sum("n_tokens").over(win), F.lit(0)))
    return (
        placed.groupBy(
            "lang", "shard", F.floor(F.col("offset") / PACK_BUDGET).alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
    )


@register(
    "text_denylist_scrub",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_DENY_RE}')) AS BIGINT) AS n_hits,
           sha256(regexp_replace(text, '{_DENY_RE}', '[REDACTED]', 'g')) AS scrubbed_sha,
           length(regexp_replace(text, '{_DENY_RE}', '[REDACTED]', 'g')) AS scrubbed_len
    FROM documents
    """,
    category="pipeline/scrub",
    origin="EXT",
)
def text_denylist_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary scrub — the shape of PII/denylist redaction at scale
    (here a stand-in term list; a real deployment compiles its PII lexicon
    and regexes into the same single pass). One ``regexp_replace`` map, no
    shuffle; emits the redaction count and a digest of the scrubbed text so
    the oracle verifies the actual rewrite, not just the count. Word
    boundaries ``\\b`` behave identically in Java regex and RE2."""
    docs = load_table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace("text", _DENY_RE, "[REDACTED]")
    # NB: inside a Spark SQL string literal '\b' is a BACKSPACE escape, so
    # the expr form needs doubled backslashes (the Column-API regexp_replace
    # above takes the pattern verbatim).
    deny_sql = _DENY_RE.replace("\\", "\\\\")
    return docs.select(
        "doc_id",
        F.expr(f"regexp_count(text, '{deny_sql}')").cast("long").alias("n_hits"),
        F.sha2(scrubbed, 256).alias("scrubbed_sha"),
        F.length(scrubbed).alias("scrubbed_len"),
    )


@register(
    "text_domain_cap",
    oracle=f"""
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rk
      FROM documents)
    WHERE rk <= {DOMAIN_CAP}
    """,
    category="pipeline/sampling",
    origin="EXT",
)
def text_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap — the crawl anti-bias step (no single domain
    may dominate the corpus). Deterministic keep-set: the first
    ``DOMAIN_CAP`` doc_ids per source. One shuffle on source; at 100 TB a
    hot source is exactly the skew case, so the production variant pre-
    filters with a salted partial top-k per (source, salt) before the final
    per-source rank — same two-stage move as ``agg_skew_salted_two_stage``;
    at fixture cardinality (20 sources) the direct window is the honest
    plan."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy("doc_id")
    return (
        docs.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= DOMAIN_CAP)
    )
