"""Property tests for the deterministic sampling family and the
decimal-exactness claim of `agg_decimal_exact_money`.

The oracle-parity suite proves fixture answers match DuckDB; these prove
the structural claims the docstrings make — two-phase salted top-k equals
the single-window answer on ADVERSARIAL group shapes, and decimal money
sums are invariant to partition count/order (the exact property raw
double sums lack at 1000 executors).
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from transf_spark.operators.pipeline import group_topk_by_hash


def _single_window_topk(docs, k):
    w = W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "lang", F.col("rn").cast("long").alias("sample_rank"))
    )


def test_salted_two_phase_equals_global_window(spark):
    """Exactness on shapes the fixture never exercises: a group smaller
    than k (all rows kept), a group of exactly k, a singleton group, a
    dominant group (hot key), and ids that collide onto few salt slices
    (doc_id ≡ 0 mod 32 — every row of 'mod0' lands in ONE salted slice, so
    stage 1 degenerates to the single-window case it must still match)."""
    rows = (
        [(i * 32, "mod0") for i in range(40)]  # all in salt slice 0
        + [(i, "big") for i in range(1, 200, 2)]  # dominant group, odd ids
        + [(1000 + i, "tiny") for i in range(3)]  # smaller than k
        + [(2000 + i, "exact") for i in range(5)]  # exactly k
        + [(9999, "one")]  # singleton
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    for k, salt in ((5, 32), (1, 32), (5, 2), (7, 64)):
        got = sorted(group_topk_by_hash(docs, k=k, salt=salt).collect())
        want = sorted(_single_window_topk(docs, k).collect())
        assert got == want, f"k={k} salt={salt}"


def test_group_topk_invariant_to_input_partitioning(spark):
    """The sample is a pure function of the data — repartitioning the
    input (what task retry / AQE reshaping does) must not change it."""
    rows = [(i * 7 + 3, ["en", "de", "zh"][i % 3]) for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    base = sorted(group_topk_by_hash(docs, k=4, salt=8).collect())
    for n in (1, 5, 37):
        again = sorted(group_topk_by_hash(docs.repartition(n), k=4, salt=8).collect())
        assert again == base, f"repartition({n}) changed the sample"


def test_decimal_money_sum_invariant_to_partition_count(spark):
    """The docstring claim behind agg_decimal_exact_money: DECIMAL(12,2)
    accumulation yields the bit-identical answer whatever partitioning the
    planner picks, while raw double sums drift in the last bits. Aggregate
    the same skewed cent values under 1, 3 and 64 partitions and require
    exact equality of the decimal sum AND of its final double rendering."""
    vals = [(i % 7, round(((i * 2654435761) % 10_000_000) / 100 + 0.01, 2)) for i in range(5000)]
    df = spark.createDataFrame(vals, "k int, amount double")
    results = []
    for n in (1, 3, 64):
        agg = (
            df.repartition(n)
            .groupBy("k")
            .agg(
                F.sum(F.col("amount").cast("decimal(12,2)")).cast("string").alias("exact"),
                F.sum(F.col("amount").cast("decimal(12,2)")).cast("double").alias("dbl"),
            )
        )
        results.append(sorted(agg.collect()))
    assert results[0] == results[1] == results[2]
