"""Semantic invariants for docs_pack_sequences beyond oracle equality:
offset-packing must place every document exactly once, keep bins in a
contiguous 0..max range per (lang, shard), and never let a bin exceed the
budget by more than one document's tokens (the only legal overshoot in
offset packing — a doc straddling a boundary belongs to the bin its offset
starts in)."""

from __future__ import annotations

from pyspark.sql import functions as F

from transf_spark.operators.pipeline import PACK_BUDGET, docs_pack_sequences
from transf_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_pack_places_every_document_once(spark):
    bins = docs_pack_sequences(spark, SF)
    total_docs = bins.agg(F.sum("n_docs")).collect()[0][0]
    assert total_docs == load_table(spark, SF, "documents").count()


def test_pack_bins_contiguous_and_budget_bounded(spark):
    bins = docs_pack_sequences(spark, SF).collect()
    by_stream = {}
    for r in bins:
        by_stream.setdefault((r["lang"], r["shard"]), []).append(r)
    max_doc_tokens = (
        load_table(spark, SF, "documents")
        .select(F.size(F.split("text", " ")).alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    for (lang, shard), rows in by_stream.items():
        got = sorted(r["bin"] for r in rows)
        assert got == list(range(len(got))), f"bin gap in ({lang}, {shard}): {got}"
        for r in rows:
            assert r["n_tokens"] <= PACK_BUDGET + max_doc_tokens, (lang, shard, r)
