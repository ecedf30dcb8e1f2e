"""Property-based round-trip: chunk → (out-of-order delivery) → reassemble
must be the identity on arbitrary text and chunk sizes.

This is the batch restatement of the reference's whole client/server
exchange (SURVEY.md §7 M2): the chunker mirrors
`/root/reference/transf_client.cpp:126-133` (1-based seq, ceil split) and
reassembly mirrors the server's ordered write path
(`/root/reference/transf_server.cpp:277-294`) as
`array_sort(collect_list(...))`. Hypothesis drives the corpus; the oracle
is Python string slicing.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

TEXTS = st.lists(
    st.text(min_size=0, max_size=200),
    min_size=1,
    max_size=20,
)


def _chunk_expr(sz: int):
    return F.expr(
        f"""CASE WHEN length(text) > 0 THEN
              transform(sequence(1, int(ceil(length(text)/{sz}.0))),
                        i -> struct(cast(i AS bigint) AS seq,
                                    substring(text, (i-1)*{sz}+1, {sz}) AS payload))
            ELSE array() END"""
    )


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts=TEXTS, sz=st.integers(min_value=1, max_value=97))
def test_chunk_shuffle_reassemble_is_identity(spark, texts, sz):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    chunks = df.select("doc_id", F.explode(_chunk_expr(sz)).alias("c")).select(
        "doc_id", F.col("c.seq").alias("seq"), F.col("c.payload").alias("payload")
    )
    # adversarial delivery order (the whole point of seq + array_sort)
    delivered = chunks.orderBy(F.xxhash64("doc_id", "seq"))
    assembled = (
        delivered.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("seq", "payload"))).alias("parts"))
        .select("doc_id", F.array_join(F.expr("transform(parts, p -> p.payload)"), "").alias("text"))
    )
    got = {r["doc_id"]: r["text"] for r in assembled.collect()}
    want = {i: t for i, t in enumerate(texts) if len(t) > 0}  # empty docs → 0 chunks
    assert got == want

    # chunk accounting: sizes sum to the original length, count is ceil
    stats = (
        chunks.groupBy("doc_id")
        .agg(F.sum(F.length("payload")).alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in stats:
        t = texts[r["doc_id"]]
        assert r["total"] == len(t)
        assert r["n"] == -(-len(t) // sz)
