"""Boundary semantics of docs_chunk_overlap and merge_scd2_upsert on
CONSTRUCTED adversarial inputs (not the fixture): the oracle run proves
engine parity on typical data; these prove the declared semantics at the
edges a fixture may never hit, against hand-written Python references.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from transf_spark.operators.pipeline import CHUNK_SIZE, CHUNK_STRIDE


def _ref_chunks(text: str):
    """Reference chunker: 1-based starts on the stride grid while start<=n."""
    toks = text.split(" ")
    n = len(toks)
    out = []
    s = 1
    while s <= n:
        sl = toks[s - 1 : s - 1 + CHUNK_SIZE]
        out.append(
            (
                (s - 1) // CHUNK_STRIDE,
                s,
                min(CHUNK_SIZE, n - s + 1),
                hashlib.md5(" ".join(sl).encode()).hexdigest(),
            )
        )
        s += CHUNK_STRIDE
    return out


def test_chunker_boundary_lengths_match_reference(spark):
    """Empty text (split ⇒ ['']), single token, exactly CHUNK_SIZE,
    CHUNK_SIZE+1 (one overlap token), an exact stride multiple, and a long
    doc — chunk ids, offsets, lengths and hashes must all match the
    reference implementation."""
    cases = {
        0: "",
        1: "one",
        2: " ".join(f"t{i}" for i in range(CHUNK_SIZE)),
        3: " ".join(f"t{i}" for i in range(CHUNK_SIZE + 1)),
        4: " ".join(f"t{i}" for i in range(CHUNK_STRIDE * 3)),
        5: " ".join(f"t{i}" for i in range(CHUNK_SIZE * 5 + 7)),
    }
    df = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in cases.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # re-run the operator's body against the in-memory frame by calling the
    # registered function with a monkeypatched loader
    import transf_spark.operators.pipeline as pl

    orig = pl.load_table
    pl.load_table = lambda _s, _d, _t: df
    try:
        got = pl.docs_chunk_overlap(spark, "unused").collect()
    finally:
        pl.load_table = orig

    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_tok"], r["chunk_len"], r["chunk_hash"])
        )
    for doc_id, text in cases.items():
        want = _ref_chunks(text)
        assert sorted(by_doc[doc_id]) == sorted(want), (doc_id, text[:40])
    # every chunk covers its tokens: overlap = CHUNK_SIZE - CHUNK_STRIDE
    for r in got:
        assert 1 <= r["chunk_len"] <= CHUNK_SIZE


def test_scd2_adversarial_same_day_and_alternation(spark):
    """Constructed change feed: same-day competing updates (highest order
    key must win), A→B→A alternation (every flip is a new version — the
    collapse only removes CONSECUTIVE duplicates), and an update equal to
    the initial load value (collapsed away)."""
    import datetime

    import transf_spark.operators.warehouse as wh

    customer = spark.createDataFrame(
        [(1, "c1", 0, 0.0, "SEG_A"), (2, "c2", 0, 0.0, "SEG_B")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    d = datetime.datetime
    orders = spark.createDataFrame(
        [
            # cust 1: same-day conflict on day1 (key 11 vs 12 → 12 wins: SEG_C),
            # then A again on day2 (new version), then A on day3 (consecutive
            # duplicate → collapsed)
            (11, 1, "O", 1.0, d(2000, 1, 1), "SEG_B"),
            (12, 1, "O", 1.0, d(2000, 1, 1), "SEG_C"),
            (13, 1, "O", 1.0, d(2000, 1, 2), "SEG_A"),
            (14, 1, "O", 1.0, d(2000, 1, 3), "SEG_A"),
            # cust 2: first update equals the initial load value → collapsed;
            # second flips
            (21, 2, "O", 1.0, d(2000, 2, 1), "SEG_B"),
            (22, 2, "O", 1.0, d(2000, 2, 2), "SEG_A"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    )
    tables = {"orders": orders, "customer": customer}
    orig = wh.load_table
    wh.load_table = lambda _s, _d, name: tables[name]
    try:
        rows = wh.merge_scd2_upsert(spark, "unused").collect()
    finally:
        wh.load_table = orig

    def hist(cust):
        return [
            (r["segment"], str(r["valid_from"]), r["valid_to"] and str(r["valid_to"]))
            for r in sorted(
                (r for r in rows if r["c_custkey"] == cust),
                key=lambda r: r["valid_from"],
            )
        ]

    assert hist(1) == [
        ("SEG_A", "1990-01-01", "2000-01-01"),  # initial load
        ("SEG_C", "2000-01-01", "2000-01-02"),  # same-day: key 12 beat key 11
        ("SEG_A", "2000-01-02", None),  # day3 duplicate collapsed
    ]
    assert hist(2) == [
        ("SEG_B", "1990-01-01", "2000-02-02"),  # 2000-02-01 SEG_B collapsed
        ("SEG_A", "2000-02-02", None),
    ]
