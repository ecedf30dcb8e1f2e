"""Derived protocol fixtures (FIXTURES.md §2) — the reference's wire/state
records restated as DataFrames, derived deterministically from ``documents``
and ``events`` so the DuckDB oracle can re-derive them with identical SQL.

Reference mapping:
- ``chunks``      ≈ TRANSFER frames (`/root/reference/transf_client.cpp:163-170`):
                    text sliced at 64 chars, 1-based ``seq``.
- ``handshakes``  ≈ HS frames (`/root/reference/transf_server.cpp:154-161`),
                    including malformed filenames mirroring the reference's own
                    probe test (`/root/reference/tests/client-cleanup.py:38-39`)
                    and understated filesizes to exercise the write clamp
                    (`/root/reference/transf_server.cpp:277-283`).
- fault-injected ``chunks_faulty``: deterministic missing + duplicate chunks
  (stop-and-wait reject paths, `/root/reference/transf_server.cpp:268-273`).

Every derivation has a SQL twin (the ``*_SQL`` constants) used verbatim as a
CTE inside oracle queries — Spark plan and oracle recompute the same fixture
from the same base table, so parity checks cover the derivation too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from transf_spark.sources.tables import load_table

CHUNK_SZ = 64

# ---- SQL twins (DuckDB dialect) ------------------------------------------

CHUNKS_SQL = f"""
  SELECT sha256(CAST(doc_id AS VARCHAR)) AS transfer_id,
         doc_id,
         CAST(i AS BIGINT) AS seq,
         substring(text, CAST((i-1)*{CHUNK_SZ}+1 AS BIGINT), {CHUNK_SZ}) AS payload,
         CAST(length(substring(text, CAST((i-1)*{CHUNK_SZ}+1 AS BIGINT), {CHUNK_SZ})) AS INT) AS payload_len
  FROM documents,
       UNNEST(generate_series(1, CAST(ceil(length(text)/{CHUNK_SZ}.0) AS BIGINT))) AS t(i)
"""

# Missing chunk: every doc with doc_id % 37 == 1 loses seq 2 (completion never
# reached). Duplicate chunk: doc_id % 41 == 3 re-sends seq 1 (stop-and-wait
# duplicate-drop path).
CHUNKS_FAULTY_SQL = f"""
  WITH chunks_base AS ({CHUNKS_SQL})
  SELECT * FROM chunks_base WHERE NOT (doc_id % 37 = 1 AND seq = 2)
  UNION ALL
  SELECT * FROM chunks_base WHERE doc_id % 41 = 3 AND seq = 1
"""
# ^ single chunks_base CTE, not the derivation inlined twice: DuckDB does
# not dedupe identical derived tables, so every oracle embedding this
# fragment was unnest-and-chunking the whole corpus twice (round-5
# review); nested WITH inside a CTE definition is valid DuckDB.

# COALESCE pins NULL-free HS fields BY CONSTRUCTION in both dialects
# (round-13 review): documents.source / n_chars are nullable in the
# schema, and a regenerated fixture bearing NULLs would otherwise make
# the two engines diverge three-valued-logic-wise (the oracle's
# bad/good ladder excludes NULL filenames from BOTH sides while the
# machine coerces to 'None' and accepts; a NULL filesize NaN-crashes
# the pandas state machine). A NULL source folds into '' so the built
# filename starts with '/' — an ABSOLUTE path every consumer already
# rejects identically — and a NULL n_chars folds into filesize 0, the
# fs <= 0 completes-at-first-chunk class the closed form already covers.
HANDSHAKES_SQL = """
  SELECT sha256(CAST(d.doc_id AS VARCHAR)) AS transfer_id,
         d.doc_id,
         CASE WHEN d.doc_id % 31 = 0 THEN ''
              WHEN d.doc_id % 29 = 0 THEN '/' || COALESCE(d.source, '') || '/doc_' || CAST(d.doc_id AS VARCHAR) || '.txt'
              WHEN d.doc_id % 23 = 0 THEN COALESCE(d.source, '') || '/../doc_' || CAST(d.doc_id AS VARCHAR) || '.txt'
              ELSE COALESCE(d.source, '') || '/doc_' || CAST(d.doc_id AS VARCHAR) || '.txt' END AS filename,
         CAST(CASE WHEN d.doc_id % 43 = 0 THEN COALESCE(d.n_chars, 0) - 10 ELSE COALESCE(d.n_chars, 0) END AS BIGINT) AS filesize,
         e.ts AS ts
  FROM documents d JOIN events e ON e.event_id = d.doc_id
"""

# ---- Spark builders -------------------------------------------------------


def transfer_id_col() -> F.Column:
    return F.sha2(F.col("doc_id").cast("string"), 256).alias("transfer_id")


def chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunker (R2): one row per 64-char slice, 1-based seq.

    The slice array is built per-row with a higher-order function (JVM-side,
    no Python), then exploded — at 100 TB this is a narrow map stage, no
    shuffle; chunk count scales with text length, not row count.
    """
    from transf_spark.functions.exprs import chunk_slices

    docs = load_table(spark, sf_dir, "documents")
    slices = chunk_slices("text", CHUNK_SZ)
    return (
        docs.select("doc_id", F.explode(slices).alias("c"))
        .select(
            transfer_id_col(),
            "doc_id",
            F.col("c.seq").alias("seq"),
            F.col("c.payload").alias("payload"),
            F.length("c.payload").alias("payload_len"),
        )
    )


def chunks_faulty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunks with deterministic faults: missing seq-2 for doc_id%37==1,
    duplicated seq-1 for doc_id%41==3 (mirrors FIXTURES.md §2 fault table)."""
    c = chunks(spark, sf_dir)
    kept = c.filter(~((F.col("doc_id") % 37 == 1) & (F.col("seq") == 2)))
    dups = c.filter((F.col("doc_id") % 41 == 3) & (F.col("seq") == 1))
    return kept.unionByName(dups)


def handshakes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HS frames with malformed filename / understated filesize injections.

    Filename faults follow the reference's reject ladder
    (`/root/reference/transf_server.cpp:164-168`): empty, absolute,
    traversal. ``ts`` joins from events (event_id == doc_id) for expiry
    fixtures."""
    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events").select("event_id", "ts")
    # src0/nc0 mirror HANDSHAKES_SQL's COALESCEs — see the note there: a
    # NULL source becomes an absolute (rejected) path, a NULL n_chars a
    # filesize-0 transfer, identically in both dialects
    src0 = F.coalesce(F.col("source"), F.lit(""))
    nc0 = F.coalesce(F.col("n_chars"), F.lit(0))
    fname = (
        F.when(F.col("doc_id") % 31 == 0, F.lit(""))
        .when(
            F.col("doc_id") % 29 == 0,
            F.concat(F.lit("/"), src0, F.lit("/doc_"), F.col("doc_id").cast("string"), F.lit(".txt")),
        )
        .when(
            F.col("doc_id") % 23 == 0,
            F.concat(src0, F.lit("/../doc_"), F.col("doc_id").cast("string"), F.lit(".txt")),
        )
        .otherwise(
            F.concat(src0, F.lit("/doc_"), F.col("doc_id").cast("string"), F.lit(".txt"))
        )
    )
    fsize = (
        F.when(F.col("doc_id") % 43 == 0, nc0 - 10)
        .otherwise(nc0)
        .cast("long")
    )
    return (
        docs.join(events, docs.doc_id == events.event_id)
        .select(
            transfer_id_col(),
            "doc_id",
            fname.alias("filename"),
            fsize.alias("filesize"),
            "ts",
        )
    )
