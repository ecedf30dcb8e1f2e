"""Semantic invariants for the warehouse family (round 5) — the properties
the DuckDB oracle's value-hash can't articulate: SCD2 interval algebra,
Morton-code correctness against a bit-level reference, and the
split-independence of re-aggregatable state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from transf_spark.queries import queries
from transf_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_scd2_intervals_partition_each_customer_timeline(spark):
    """Per customer: versions tile the timeline with no gaps or overlaps
    (valid_to == next valid_from), exactly one open (current) version, the
    first version starts at the synthetic epoch, and no two consecutive
    versions carry the same value (the collapse worked)."""
    import datetime

    rows = queries()["merge_scd2_upsert"](spark, SF).collect()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["c_custkey"], []).append(r)
    assert by_cust
    for cust, vers in by_cust.items():
        vers.sort(key=lambda r: r["valid_from"])
        assert vers[0]["valid_from"] == datetime.date(1990, 1, 1), cust
        assert sum(1 for v in vers if v["is_current"]) == 1
        assert vers[-1]["is_current"] and vers[-1]["valid_to"] is None
        for a, b in zip(vers, vers[1:]):
            assert a["valid_to"] == b["valid_from"], cust  # no gap, no overlap
            assert a["segment"] != b["segment"], cust  # collapsed
            assert not a["is_current"]


def _morton_ref(x: int, y: int) -> int:
    """Bit-level reference interleave (even bits ← x, odd bits ← y)."""
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_buckets_match_bitlevel_reference(spark):
    """The shift/mask spread-bits pipeline must agree with a literal
    bit-by-bit interleave: recompute every order's bucket in Python and
    compare the per-bucket row counts; bucket envelopes must contain the
    rows that produced them."""
    rows = queries()["layout_zorder_stats"](spark, SF).collect()
    got = {r["bucket"]: r for r in rows}

    src = load_table(spark, SF, "orders").select(
        (F.col("o_custkey").bitwiseAND(65535)).alias("x"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .bitwiseAND(65535)
        .alias("y"),
    )
    from collections import defaultdict

    counts: dict[int, int] = defaultdict(int)
    envel: dict[int, list] = {}
    for r in src.collect():
        b = _morton_ref(r["x"], r["y"]) >> 28
        counts[b] += 1
        e = envel.setdefault(b, [r["x"], r["x"], r["y"], r["y"]])
        e[0] = min(e[0], r["x"]); e[1] = max(e[1], r["x"])
        e[2] = min(e[2], r["y"]); e[3] = max(e[3], r["y"])
    assert set(got) == set(counts)
    for b, n in counts.items():
        assert got[b]["n_rows"] == n, b
        assert [got[b]["min_cust"], got[b]["max_cust"], got[b]["min_day"], got[b]["max_day"]] == envel[b], b


def test_incremental_merge_is_split_invariant(spark):
    """merge(state, delta) must equal the direct aggregate for ANY split
    day, not just the declared one — the algebraic property the pattern
    rests on. Re-run the merge at three other split points and assert the
    published answer never moves."""
    from transf_spark.operators import warehouse as wh

    def run(split_day: str):
        orders = load_table(spark, SF, "orders")
        split = F.lit(split_day).cast("date")
        day = F.col("o_orderdate").cast("date")

        def partial(src):
            return src.groupBy("o_orderstatus").agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("rev"),
                F.min(day).alias("first_day"),
                F.max(day).alias("last_day"),
            )

        merged = (
            partial(orders.filter(day < split))
            .unionByName(partial(orders.filter(day >= split)))
            .groupBy("o_orderstatus")
            .agg(
                F.sum("n_orders").alias("n_orders"),
                F.sum("rev").cast("string").alias("revenue_exact"),
                F.min("first_day").alias("first_day"),
                F.max("last_day").alias("last_day"),
            )
        )
        return sorted(tuple(r) for r in merged.collect())

    baseline = sorted(
        tuple(r) for r in queries()["agg_incremental_state_merge"](spark, SF).collect()
    )
    # extremes (everything in one side) and a mid split
    for split_day in ("1992-01-01", "1997-06-15", "2005-01-01"):
        assert run(split_day) == baseline, split_day


def test_zorder_spread_full_16bit_domain(spark):
    """Regression for the int32 shiftleft wrap: day values with bit 15 set
    (epoch day >= 32768 — dates past 2059-09-18, inside the declared
    & 65535 domain) produced a NEGATIVE bucket before the y column was
    widened to long. Drive the exact production spread expressions over
    the domain corners and a seeded sample, compare to the bit-level
    reference."""
    import itertools
    import random

    from transf_spark.operators.warehouse import (
        ZORDER_BUCKETS_SHIFT,
        _morton_spread_steps,
    )

    corners = [0, 1, 32767, 32768, 40000, 65535]
    rng = random.Random(9)
    pairs = list(itertools.product(corners, corners)) + [
        (rng.randrange(65536), rng.randrange(65536)) for _ in range(50)
    ]
    df = spark.createDataFrame(pairs, "x long, y long")
    for col in ("x", "y"):
        for name, expr in _morton_spread_steps(
            col, lambda e, n: f"shiftleft({e}, {n})"
        ):
            df = df.withColumn(name, F.expr(expr))
    got = df.select(
        "x",
        "y",
        F.expr(
            f"shiftright(x_3 | shiftleft(y_3, 1), {ZORDER_BUCKETS_SHIFT})"
        ).alias("bucket"),
    ).collect()
    assert len(got) == len(pairs)
    for r in got:
        expect = _morton_ref(r["x"], r["y"]) >> ZORDER_BUCKETS_SHIFT
        assert r["bucket"] == expect, (r["x"], r["y"], r["bucket"], expect)
        assert 0 <= r["bucket"] < 16
