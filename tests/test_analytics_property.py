"""Property tests for the round-5 analytics batch — each pins an invariant
the oracle-parity hash CANNOT see:

- blocking recall: the Levenshtein oracle uses the SAME token blocking as
  the Spark plan, so a pair the blocking misses would pass parity silently
  — only a brute-force all-pairs sweep proves candidate completeness;
- gap-fill algebra: grid completeness / fill semantics, checked against an
  independent pandas reimplementation (the oracle proves engine parity,
  not that both engines implement the *intended* semantics);
- recursion vs closed form: the binary-heap walk must equal pure
  arithmetic on the key range — no engine involved in the expectation;
- attribution vs its window form: min_by argmin == the ROW_NUMBER plan it
  replaced, inside Spark itself;
- OLS vs numpy: the closed-form component-sum slope equals a reference
  least-squares fit.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Window as W, functions as F

from tests.conftest import SF_CHECK, SF_SMOKE
from transf_spark import queries as q
from transf_spark.operators.behavior import LINREG_ANCHOR_DAY
from transf_spark.operators.dedup import LEV_MAX_DIST
from transf_spark.sources.tables import load_table


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_blocking_has_full_recall_on_fixture(spark):
    """Brute-force all-pairs over the (small) part-name vocabulary at
    sf0.01: every true pair within LEV_MAX_DIST must appear in the blocked
    result. A two-word name pair where BOTH words drift (sharing no token)
    would be invisible to the blocking AND to the identically-blocked
    oracle — this is the only gate that can catch that."""
    q._load_all_modules()
    names = [
        r["p_name"]
        for r in load_table(spark, SF_CHECK, "part").select("p_name").distinct().collect()
    ]
    truth = {
        (a, b)
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if _lev(a, b) <= LEV_MAX_DIST
    }
    truth = {(min(a, b), max(a, b)) for a, b in truth}
    got = {
        (r["name_a"], r["name_b"])
        for r in q.REGISTRY["dedup_levenshtein_blocked"].fn(spark, SF_CHECK).collect()
    }
    assert truth, "fixture regenerated with no near-dup names — test is vacuous"
    missed = truth - got
    assert not missed, f"token blocking missed true pairs: {sorted(missed)[:5]}"
    assert got == truth  # and nothing extra survives the distance filter


def test_gapfill_matches_independent_pandas_reference(spark):
    """Re-derive the gap-filled series with pandas resample/ffill semantics
    from the raw events and compare frame-for-frame."""
    q._load_all_modules()
    out = (
        q.REGISTRY["events_gapfill_ffill"].fn(spark, SF_SMOKE)
        .toPandas()
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts_ns", "event_id", "value")
        .toPandas()
    )
    ns_day = 86_400_000_000_000
    ev["day"] = ev["ts_ns"] // ns_day
    # daily close = value of the last (ts_ns, event_id) event of the day.
    # drop_duplicates(keep="last"), NOT groupby().last(): the latter skips
    # nulls per column, diverging from max_by if a day's last event ever
    # carried a null value
    ev = ev.sort_values(["user_id", "day", "ts_ns", "event_id"])
    daily = ev.drop_duplicates(subset=["user_id", "day"], keep="last")[
        ["user_id", "day", "value"]
    ]
    frames = []
    for uid, g in daily.groupby("user_id"):
        grid = pd.DataFrame(
            {"user_id": uid, "day": range(int(g["day"].min()), int(g["day"].max()) + 1)}
        )
        m = grid.merge(g, on=["user_id", "day"], how="left")
        m["is_gap"] = m["value"].isna()
        m["filled_value"] = m["value"].ffill()
        frames.append(m[["user_id", "day", "filled_value", "is_gap"]])
    ref = pd.concat(frames).sort_values(["user_id", "day"]).reset_index(drop=True)
    assert len(out) == len(ref)
    assert (out["user_id"].values == ref["user_id"].values).all()
    assert (out["day"].values == ref["day"].values).all()
    assert (out["is_gap"].values == ref["is_gap"].values).all()
    assert np.array_equal(
        out["filled_value"].values, ref["filled_value"].values, equal_nan=True
    )


def test_recursive_hierarchy_matches_closed_form(spark):
    """Binary-heap arithmetic: depth(k) = floor(log2 k); nodes at depth d
    are exactly the keys in [2^d, 2^(d+1)) ∩ [1, N] REACHABLE from 1 —
    for a contiguous 1..N key space that is the whole interval."""
    q._load_all_modules()
    rows = q.REGISTRY["sql_recursive_hierarchy"].fn(spark, SF_CHECK).collect()
    cust = load_table(spark, SF_CHECK, "customer")
    n_rows, max_key, min_key = cust.agg(
        F.count(F.lit(1)), F.max("c_custkey"), F.min("c_custkey")
    ).collect()[0]
    # fixture keys are contiguous 0..N-1; key 0 is unreachable from root 1
    # (its parent 0//2 = 0 self-loops), so the tree spans exactly [1, N-1]
    assert (min_key, n_rows) == (0, max_key + 1), (
        "key space not contiguous from 0 — closed form needs recomputing"
    )
    n = max_key
    got = {r["depth"]: (r["n_nodes"], r["min_key"], r["max_key"]) for r in rows}
    for d in range(int(math.log2(n)) + 1):
        lo, hi = 2**d, min(2 ** (d + 1) - 1, n)
        assert got[d] == (hi - lo + 1, lo, hi), f"depth {d}"
    assert len(got) == int(math.log2(n)) + 1


def test_attribution_equals_window_form(spark):
    """min_by/max_by argmin-in-aggregate == the double-ROW_NUMBER window
    plan it replaced, computed in Spark itself on the same fixture."""
    q._load_all_modules()
    fast = q.REGISTRY["events_attribution_touch"].fn(spark, SF_CHECK)
    ev = load_table(spark, SF_CHECK, "events")
    asc = W.partitionBy("user_id").orderBy("ts_ns", "event_id")
    desc = W.partitionBy("user_id").orderBy(
        F.col("ts_ns").desc(), F.col("event_id").desc()
    )
    slow = (
        ev.select(
            "user_id",
            "event_type",
            "ts_ns",
            F.row_number().over(asc).alias("rna"),
            F.row_number().over(desc).alias("rnd"),
        )
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("rna") == 1, F.col("event_type"))).alias("first_touch"),
            F.max(F.when(F.col("rnd") == 1, F.col("event_type"))).alias("last_touch"),
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_ns").alias("first_ts_ns"),
            F.max("ts_ns").alias("last_ts_ns"),
        )
    )
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0


def test_linreg_matches_numpy_lstsq(spark):
    """Closed-form component-sum OLS == numpy least squares on the
    collected daily matrix (rtol only — numpy's QR path differs in the
    last ulps, which is exactly why the DECLARED query uses integer sums)."""
    q._load_all_modules()
    rows = q.REGISTRY["agg_linreg_daily_trend"].fn(spark, SF_CHECK).collect()
    ev = load_table(spark, SF_CHECK, "events")
    ns_day = 86_400_000_000_000
    daily = (
        ev.select(
            "event_type",
            (F.expr(f"ts_ns div {ns_day}") - LINREG_ANCHOR_DAY).alias("x"),
        )
        .groupBy("event_type", "x")
        .count()
        .toPandas()
    )
    assert rows and all(r["n_days"] >= 2 for r in rows), (
        "fixture regenerated to single-day groups — trend test is vacuous"
    )
    for r in rows:
        g = daily[daily["event_type"] == r["event_type"]]
        slope, intercept = np.polyfit(g["x"].astype(float), g["count"].astype(float), 1)
        assert math.isclose(r["slope_per_day"], slope, rel_tol=1e-9), r["event_type"]
        assert math.isclose(r["intercept"], intercept, rel_tol=1e-9), r["event_type"]
        assert r["n_days"] == len(g)


def test_rank_normalize_batch_matches_per_user_reference():
    """The salt-bucket grouped-map kernel (one lexsort + segment arithmetic
    over ALL users in the batch) must reproduce the naive per-user form
    exactly — including value ties broken by event_id, singleton users
    (pct 0.0), and duplicate (value, event_id)-adjacent rows. Pure-pandas
    check, no Spark session needed."""
    from transf_spark.operators.pipeline import _rank_normalize_batch

    rng = np.random.RandomState(7)
    for trial in range(20):
        n_users = rng.randint(1, 12)
        frames = []
        eid = 0
        for u in range(n_users):
            n = rng.randint(1, 9)
            vals = rng.randint(0, 4, size=n).astype(float)  # heavy ties
            frames.append(
                pd.DataFrame(
                    {
                        "event_id": np.arange(eid, eid + n),
                        "user_id": np.full(n, u * 13 + 1),
                        "value": vals,
                        # round 13: the Spark side threads a NULL flag so
                        # the kernel can order reals < NaN < NULL; these
                        # synthetic rows are all non-null
                        "vnull": np.zeros(n, dtype=int),
                    }
                )
            )
            eid += n
        pdf = (
            pd.concat(frames)
            .sample(frac=1.0, random_state=trial)  # shuffle row order
            .reset_index(drop=True)
        )
        out = _rank_normalize_batch(pdf.copy()).set_index("event_id")

        for u, g in pdf.groupby("user_id"):
            g = g.sort_values(["value", "event_id"]).reset_index(drop=True)
            n = len(g)
            for i, row in g.iterrows():
                expect = 0.0 if n == 1 else i / (n - 1)
                got = out.loc[row["event_id"], "pct_rank"]
                assert got == expect, (trial, u, row["event_id"], got, expect)
            assert (out.loc[g["event_id"], "user_id"].to_numpy() == u).all()


def test_rank_normalize_orders_reals_then_nan_then_null():
    """Round-13 review: DuckDB's ORDER BY ranks reals < NaN < NULL, but
    Arrow hands the kernel NaN for BOTH — the Spark-side vnull flag must
    restore the three-way order (divergent only when one user carries
    both a NaN and a NULL value)."""
    from transf_spark.operators.pipeline import _rank_normalize_batch

    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [7, 7, 7, 7],
            # NULL arrives as NaN with vnull=1; the real NaN has vnull=0
            "value": [5.0, float("nan"), float("nan"), 1.0],
            "vnull": [0, 0, 1, 0],
        }
    )
    out = _rank_normalize_batch(pdf).set_index("event_id")["pct_rank"]
    assert out.loc[4] == 0.0  # 1.0: smallest real
    assert out.loc[1] == 1 / 3  # 5.0
    assert out.loc[2] == 2 / 3  # NaN after all reals
    assert out.loc[3] == 1.0  # NULL last
