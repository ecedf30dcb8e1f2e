"""Round-14: the degenerate-fixture device applied to the DOCUMENTS table
across the WHOLE document-touching registry (the multimodal twin in
tests/test_multimodal_corrupt.py covers the 5 multimodal queries; this
file sweeps the other 54 — dedup, text analysis, pipeline, format
round-trips, hashes, streams).

The text column is degraded with NULL, empty, one-char, whitespace-only,
embedded-NUL, wide-multibyte, CSV-hostile (embedded comma/quote/newline),
XML-hostile (markup + CDATA terminator), and JSON-ish rows. The round-14
exploratory sweep came back 54/54 green — earlier rounds' unicode/NULL
hardening already covers this table — so this file pins that posture
against regression (a staging writer that stops quoting newlines, a
tokenizer that chokes on NUL, an oracle that starts erroring on empty
shingle sets would all surface here first).
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle import compare
from transf_spark.queries import REGISTRY, _load_all_modules

_QUERIES = [
    "completion_manifest", "dedup_cluster_cc", "dedup_exact",
    "dedup_fuzzy_minhash", "dedup_ngram_jaccard", "dedup_simhash",
    "docs_char_class_profile", "docs_chunk_overlap", "docs_length_histogram",
    "docs_mixture_reweight", "docs_ngram_topk_per_lang", "docs_pack_sequences",
    "docs_perplexity_buckets", "docs_quality_gate_report", "docs_shard_assign",
    "docs_token_budget_sample", "docs_train_val_split", "filter_path_security",
    "hash_integrity_suite", "hash_noncrypto", "reassembly_ordered_concat",
    "sample_group_topk_hash", "sample_stratified", "scalar_bitwise_suite",
    "scalar_net_validators", "scalar_string_suite", "scan_avro_logical_typed",
    "scan_avro_roundtrip", "scan_csv_corrupt_tolerant", "scan_csv_roundtrip",
    "scan_dynamic_partition_pruning", "scan_json_roundtrip",
    "scan_jsonl_corrupt_tolerant", "scan_orc_roundtrip",
    "scan_partitioned_pruning", "scan_schema_evolution",
    "scan_text_lines_roundtrip", "scan_xml_roundtrip", "stream_ack_verify_join",
    "stream_dedup_exact", "stream_static_enrich", "text_analysis_tokens",
    "text_decontaminate", "text_denylist_scrub", "text_domain_cap",
    "text_fingerprint", "text_language_id", "text_pii_redact",
    "text_quality_score", "text_repetition_filter", "text_segment_dedup",
    "text_tfidf_topk", "text_token_count", "text_unigram_lm_score",
    "window_lag_lead_gap",
]

_ALL_TABLES = (
    "documents", "events", "embeddings", "region", "nation", "customer",
    "supplier", "part", "orders", "lineitem",
)


@pytest.fixture(scope="module")
def degenerate_docs_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("degenerate_docs")
    t = pq.read_table(f"{src}/documents.parquet")
    texts = t["text"].to_pylist()
    texts[0] = None
    texts[1] = ""
    texts[2] = "x"
    texts[3] = " \t\n "
    texts[4] = "nul\x00inside"
    texts[5] = "汉字🙂" * 200
    texts[6] = 'comma,quote"and\nnewline'  # CSV-hostile
    texts[7] = "<tag>&amp; ]]> </xml>"     # XML-hostile
    texts[8] = '{"k": 1} \\u0000'          # JSON-ish
    cols = {n: t[n] for n in t.schema.names}
    cols["text"] = pa.array(texts, pa.string())
    pq.write_table(pa.table(cols), str(out / "documents.parquet"))
    for name in _ALL_TABLES:
        if name == "documents":
            continue
        p = f"{src}/{name}.parquet"
        if os.path.exists(p):
            shutil.copy(p, str(out / f"{name}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", _QUERIES)
def test_documents_family_survives_degenerate_fixture(
    spark, degenerate_docs_dir, name
):
    _load_all_modules()
    spec = REGISTRY[name]
    df = spec.fn(spark, degenerate_docs_dir)
    con = duckdb.connect()
    for tbl in _ALL_TABLES:
        if os.path.exists(f"{degenerate_docs_dir}/{tbl}.parquet"):
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM "
                f"read_parquet('{degenerate_docs_dir}/{tbl}.parquet')"
            )
    problems = compare(df, con, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)
