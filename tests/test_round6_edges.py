"""Edge-case gates for the round-6 corpus-statistics queries, on a
synthetic fixture the real testdata doesn't exercise: empty texts,
one-word documents, NULL text, a language whose whole corpus fits the
token budget, and duplicate-free vocabulary. Each case is a
regeneration-latent hazard class from the round-5 checklist (0/0
denominators, degenerate word-pair loops, concat_ws NULL skipping) —
parity with the DuckDB oracle is asserted on the same synthetic table so
both dialects face the edge together.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.oracle import compare
from transf_spark.queries import all_specs, queries


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    """documents.parquet with degenerate rows: empty text, single word,
    NULL text, whitespace-only, and a tiny 'xx' language."""
    out = str(tmp_path_factory.mktemp("edge_docs"))
    rows = [
        (1, "", "en", "srcA"),                       # empty text
        (2, "word", "en", "srcA"),                   # one word — no bigram
        (3, None, "en", "srcA"),                     # NULL text
        (4, "   ", "en", "srcB"),                    # whitespace only
        (5, "alpha beta gamma alpha beta", "xx", "srcB"),
        (6, "alpha beta delta epsilon zeta", "xx", "srcB"),
        (7, "a b c d e f g h i j " * 30, "en", "srcB"),
        # U+000B vertical tab: Java \s counts it, RE2 \s does not — the
        # round-6 review's whitespace-shorthand divergence repro
        (8, "tab\x0bsep and\ttab", "en", "srcB"),
        # a lang slice whose EVERY text is NULL: SUM over all-NULL flags
        # is NULL in Spark vs 0 in the oracle's CASE arm unless mirrored
        (9, None, "yy", "srcC"),
        (10, None, "yy", "srcC"),
    ]
    # n_chars derived from the text by the shared writer — a hand-kept
    # count drifted off-by-one in an earlier revision (review finding)
    from tests.docfixtures import write_documents

    return write_documents(out, rows)


def _con(edge_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{edge_dir}/documents.parquet'"
    )
    return con


# Every documents-only query with an oracle runs against the degenerate
# fixture — the full-family sweep that exposed seven latent divergences
# (size(split(NULL)) = -1, NULL-text fingerprint folds, untrainable-lang
# census, a sequence(1,-1) crash) in queries that had been green on the
# well-formed fixtures since rounds 3-5.
#
# AUTO-DISCOVERED since round 8 (the tests/test_tpch_edges.py device):
# the hand-maintained list had silently omitted FIFTEEN documents-only
# queries — the whole scan/* staging family, the scalar suites, the
# transfer-pipeline pair, the CC clusterer — exactly the class of gap the
# TPC-H sweep's discovery fix closed the same round. A query reading only
# the documents table (quoted load_table argument or oracle SQL token,
# no other table, no streaming source) runs here and, via the import in
# tests/test_unicode_edges.py, against the multilingual fixture too.
_TABLES_OTHER = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "embeddings",
)


def _documents_only_queries() -> list[str]:
    import inspect

    out = []
    for name, spec in all_specs().items():
        if spec.oracle is None:
            continue
        src = inspect.getsource(spec.fn) + " " + spec.oracle
        other = any(
            f'"{t}"' in src or f" {t}" in spec.oracle for t in _TABLES_OTHER
        ) or any(api in src for api in ("readStream", "binaryFile"))
        if ('"documents"' in src or " documents" in spec.oracle) and not other:
            out.append(name)
    return out


EDGE_QUERIES = _documents_only_queries()


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_round6_docs_queries_survive_degenerate_rows(spark, edge_dir, name):
    """Empty/NULL/one-word texts must neither error nor diverge from the
    oracle — the 0-denominator guards and the size<2 gram gate are load-
    bearing here, not decorative."""
    spec = all_specs()[name]
    df = spec.fn(spark, edge_dir)
    assert not compare(df, _con(edge_dir), spec.oracle)


def test_ngram_degenerate_docs_contribute_no_grams(spark, edge_dir):
    """Docs 1-4 (empty/one-word/NULL/whitespace) produce zero bigrams;
    the 'xx' language still ranks its four distinct pairs."""
    from pyspark.sql import functions as F

    out = queries()["docs_ngram_topk_per_lang"](spark, edge_dir).collect()
    xx = [r for r in out if r["lang"] == "xx"]
    assert {r["gram"] for r in xx} >= {"alpha beta"}
    # 'alpha beta' appears twice in doc 5 and once in doc 6
    assert max(r["cnt"] for r in xx) == 3


def test_token_budget_small_lang_fully_kept(spark, edge_dir):
    """A language whose whole corpus fits the budget keeps everything —
    the running-sum cut must not drop the final row on the <= boundary."""
    out = {
        r["lang"]: r
        for r in queries()["docs_token_budget_sample"](spark, edge_dir).collect()
    }
    assert out["xx"]["n_kept"] == out["xx"]["n_total"] == 2
    assert out["xx"]["tokens_kept"] == out["xx"]["tokens_total"]


def test_hash_noncrypto_values_deterministic_and_census_consistent(spark):
    """The per-doc hash surface behind the declared census: values are
    repeat-deterministic, non-NULL for non-NULL text, and the 64-bit
    injectivity the census asserts holds row-for-row on the fixture."""
    from transf_spark.operators.scalars import hash_noncrypto_values

    sf = "/root/testdata/sf0.001"
    a = {r["doc_id"]: r for r in hash_noncrypto_values(spark, sf).collect()}
    b = {r["doc_id"]: r for r in hash_noncrypto_values(spark, sf).collect()}
    assert a.keys() == b.keys() and len(a) > 0
    for k in a:
        assert (
            a[k]["text_xxh64"],
            a[k]["text_crc32"],
            a[k]["text_murmur3"],
        ) == (b[k]["text_xxh64"], b[k]["text_crc32"], b[k]["text_murmur3"])
    texts = {r["text"] for r in a.values() if r["text"] is not None}
    xxh = {r["text_xxh64"] for r in a.values() if r["text_xxh64"] is not None}
    assert len(xxh) == len(texts)

    census = queries()["hash_noncrypto"](spark, sf).collect()
    assert len(census) == 1
    row = census[0]
    assert row["n_distinct_xxh64"] == len(texts)
    assert row["small_hash_collisions_bounded"] is True


def test_xml_roundtrip_subset_predicate_covers_noncharacters(spark, tmp_path):
    """The XML-representable-subset predicate must exclude BMP
    noncharacters (U+FFFE/U+FFFF) exactly like C0 controls — in BOTH
    dialects — or the Woodstox writer crashes on one side while the
    oracle keeps the row (the \\x0B class, round-9 review finding #2).
    The shared-codepoint-list construction is exercised end-to-end on a
    fixture carrying both hazard classes plus keepable rows."""
    from tests.docfixtures import write_documents

    rows = [
        (1, "clean row", "en", "s"),
        (2, "vertical\x0btab", "en", "s"),      # C0 control — excluded
        (3, "noncharacter￿tail", "en", "s"),  # U+FFFF — excluded
        (4, "almost￾", "en", "s"),            # U+FFFE — excluded
        (5, None, "en", "s"),                      # NULL — kept (no chars)
        (6, "tab\tand\nnewline ok", "en", "s"),    # XML-legal controls kept
    ]
    d = write_documents(str(tmp_path), rows)
    spec = all_specs()["scan_xml_roundtrip"]
    df = spec.fn(spark, d)
    got = {(r["lang"], r["source"]): r["n_docs"] for r in df.collect()}
    assert got == {("en", "s"): 3}  # rows 1, 5, 6 survive the subset
    assert not compare(df, _con(d), spec.oracle)
