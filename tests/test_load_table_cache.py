"""load_table identity-cache hazards (round-15 verdict item 7 / "what's
wrong" item 5): the per-session plan memo returns the SAME DataFrame object
for repeated loads, which can trip Spark's ambiguous-self-join detection
where two fresh reads would not. No current call site bracket-joins two
loads of one table (grepped r15), but nothing stopped a future builder —
this pins the safe pattern and fails loudly if the cache ever breaks it."""

from pyspark.sql import functions as F

from transf_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_repeated_load_is_cached_identity(spark):
    a = load_table(spark, SF, "nation")
    b = load_table(spark, SF, "nation")
    assert a is b, "plan memo must return the cached lazy plan"


def test_self_join_via_aliases_works_on_cached_plan(spark):
    n_rows = load_table(spark, SF, "nation").count()
    a = load_table(spark, SF, "nation").alias("a")
    b = load_table(spark, SF, "nation").alias("b")
    joined = a.join(b, F.col("a.n_nationkey") == F.col("b.n_nationkey"))
    assert joined.count() == n_rows  # n_nationkey unique per row
    # asymmetric predicate: both sides must resolve independently
    lt = a.join(b, F.col("a.n_nationkey") < F.col("b.n_nationkey")).count()
    assert lt == n_rows * (n_rows - 1) // 2


def test_self_join_using_column_works_on_cached_plan(spark):
    n_rows = load_table(spark, SF, "nation").count()
    a = load_table(spark, SF, "nation")
    b = load_table(spark, SF, "nation")
    assert a.join(b, "n_nationkey").count() == n_rows
