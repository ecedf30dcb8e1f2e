"""Hypothesis property suites for the round-8 kernels — random inputs
against pure-Python references, driven on in-memory frames (no parquet
staging), so the algebra itself is checked independently of both engines'
oracle parity AND of the single hand-computed fixtures:

- lifecycle classification: for ANY set of activity days, the per-day
  entries must match a reference run-length walk, and the global
  conservation laws must hold (Σnew = users, Σchurn = runs,
  Σresurrected = runs - users, Σretained = active_days - runs);
- bitmap distinct: equals a Python set count per segment for arbitrary
  long ids (word-boundary straddlers, negatives, Long.MIN-adjacent).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

_D0 = dt.date(2024, 1, 3)


def _lifecycle_ref(days: list[dt.date]):
    """Reference classification: dict day -> [new, ret, res, churn]."""
    days = sorted(set(days))
    out: dict[dt.date, list[int]] = {}

    def bump(day, idx):
        out.setdefault(day, [0, 0, 0, 0])[idx] += 1

    one = dt.timedelta(days=1)
    for i, d in enumerate(days):
        if i == 0:
            bump(d, 0)
        elif days[i - 1] == d - one:
            bump(d, 1)
        else:
            bump(d, 2)
        if i == len(days) - 1 or days[i + 1] > d + one:
            bump(d + one, 3)
    return out


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=25), min_size=1, max_size=12),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=8, deadline=None)
def test_lifecycle_entries_match_reference(spark, user_day_offsets):
    from pyspark.sql import functions as F

    from transf_spark.operators.behavior import lifecycle_entries

    # one row per user carrying its sorted distinct day array
    df = spark.createDataFrame(
        [(sorted({_D0 + dt.timedelta(days=o) for o in offs}),) for offs in user_day_offsets],
        "ds array<date>",
    )
    got = (
        df.select(F.explode(lifecycle_entries()).alias("e"))
        .select("e.*")
        .groupBy("day")
        .agg(
            F.sum("is_new").alias("n"),
            F.sum("is_ret").alias("r"),
            F.sum("is_res").alias("s"),
            F.sum("is_churn").alias("c"),
        )
        .collect()
    )
    got_map = {row["day"]: [row["n"], row["r"], row["s"], row["c"]] for row in got}

    expected: dict[dt.date, list[int]] = {}
    total_days = 0
    n_runs = 0
    for offs in user_day_offsets:
        days = sorted({_D0 + dt.timedelta(days=o) for o in offs})
        total_days += len(days)
        one = dt.timedelta(days=1)
        n_runs += sum(
            1
            for i, d in enumerate(days)
            if i == len(days) - 1 or days[i + 1] > d + one
        )
        for day, v in _lifecycle_ref(days).items():
            acc = expected.setdefault(day, [0, 0, 0, 0])
            for j in range(4):
                acc[j] += v[j]
    assert got_map == expected

    # conservation laws over the whole population
    n_users = len(user_day_offsets)
    tot = [sum(v[j] for v in got_map.values()) for j in range(4)]
    assert tot[0] == n_users  # every user is new exactly once
    assert tot[3] == n_runs  # every activity run churns exactly once
    assert tot[2] == n_runs - n_users  # every later run starts by resurrecting
    assert tot[1] == total_days - n_runs  # non-run-start days are retained


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.one_of(
                st.none(),
                # FULL long domain including Long.MIN/MAX — the kernel's
                # exactness contract is "every long id"
                st.integers(min_value=-(2**63), max_value=2**63 - 1),
                st.integers(min_value=-130, max_value=130),
            ),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=8, deadline=None)
def test_bitmap_distinct_matches_set_reference(spark, rows):
    from transf_spark.operators.warehouse import bitmap_distinct

    df = spark.createDataFrame(rows, "seg string, uid long")
    got = {
        r["seg"]: r["n_distinct"]
        for r in bitmap_distinct(df, "seg", "uid").collect()
    }
    ref: dict[str, set] = {}
    for seg, uid in rows:
        ref.setdefault(seg, set())
        if uid is not None:
            ref[seg].add(uid)
    assert got == {seg: len(ids) for seg, ids in ref.items()}


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.one_of(
                st.none(),
                # sparse universe: the regime the dictionary pass exists for
                st.integers(min_value=-(2**63), max_value=2**63 - 1),
                st.integers(min_value=-130, max_value=130),
            ),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=6, deadline=None)
def test_bitmap_distinct_sparse_matches_dense_and_reference(spark, rows):
    """The dictionary-pass variant must return the dense variant's exact
    counts on ANY id distribution — only the intermediate word-space
    compaction differs. Also pins the compaction contract: the dictionary
    codes stay within BITMAP_DICT_BUCKETS x distinct-count, so the word
    table is code-space-sized, never id-universe-sized."""
    from pyspark.sql import functions as F

    from transf_spark.operators.warehouse import (
        BITMAP_DICT_BUCKETS,
        bitmap_distinct,
        bitmap_distinct_sparse,
    )

    df = spark.createDataFrame(rows, "seg string, uid long")
    dense = {
        r["seg"]: r["n_distinct"] for r in bitmap_distinct(df, "seg", "uid").collect()
    }
    sparse = {
        r["seg"]: r["n_distinct"]
        for r in bitmap_distinct_sparse(df, "seg", "uid").collect()
    }
    ref: dict[str, set] = {}
    for seg, uid in rows:
        ref.setdefault(seg, set())
        if uid is not None:
            ref[seg].add(uid)
    want = {seg: len(ids) for seg, ids in ref.items()}
    assert dense == want
    assert sparse == want  # LEFT dictionary join keeps all-NULL segments
    n_distinct_all = len({u for _, u in rows if u is not None})
    if n_distinct_all:
        ids = df.select("uid").where(F.col("uid").isNotNull()).distinct()
        bucket = F.pmod(F.xxhash64("uid"), F.lit(BITMAP_DICT_BUCKETS)).cast("long")
        from pyspark.sql import Window as W

        w = W.partitionBy(bucket).orderBy("uid")
        max_code = ids.select(
            ((F.row_number().over(w).cast("long") - 1) * BITMAP_DICT_BUCKETS + bucket)
            .alias("c")
        ).agg(F.max("c")).collect()[0][0]
        assert max_code < n_distinct_all * BITMAP_DICT_BUCKETS
