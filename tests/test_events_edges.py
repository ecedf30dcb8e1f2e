"""Degenerate-events parity sweep (round-6 twin of test_round6_edges).

A synthetic events table with NULL user_id / event_type / value / props /
TIMESTAMP, duplicate (user, ts) pairs, and a session gap runs every
events-only oracle query against DuckDB on the same fixture. The classes
this caught on first run (all fixed, mirrored in both dialects):

- NULL timestamps: Spark windows order NULLs FIRST, DuckDB LAST — every
  lead()/lag()/session boundary shifted differently per engine
  (sessionize, markov, top-k paths → ts IS NOT NULL in both dialects);
- NULL user_id: kept by a groupBy fold but silently dropped by the
  oracle's equi-join (funnel → user_id IS NOT NULL in both);
- size(split(NULL)) = -1 vs len(NULL) = NULL (scalar suite n_i);
- Spark's three-valued array_contains vs DuckDB's two-valued
  list_contains (scalar suite has_three).
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pytest

from tests.oracle import compare
from transf_spark.queries import all_specs

_T0 = dt.datetime(2024, 1, 1)


def _ts(mins: int) -> dt.datetime:
    return _T0 + dt.timedelta(minutes=mins)


@pytest.fixture(scope="module")
def edge_events_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("edge_events"))
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, _ts(0), 1, "view", 1.0, '{"k":1}'),
        (2, _ts(5), 1, "click", 2.0, '{"k":2}'),
        (3, _ts(10), 1, "buy", 3.0, None),       # NULL props
        (4, _ts(0), 2, "view", None, '{"k":3}'), # NULL value
        (5, _ts(7), 2, None, 4.0, "{}"),         # NULL event_type
        (6, _ts(9), 2, "view", 5.0, "{}"),
        (7, _ts(3), None, "view", 6.0, "{}"),    # NULL user
        (8, _ts(8), None, "click", 7.0, "{}"),
        (9, None, 3, "view", 8.0, "{}"),         # NULL ts
        (10, _ts(4), 3, "view", 9.0, "{}"),
        (11, _ts(4), 3, "click", 10.0, "{}"),    # duplicate (user, ts)
        (12, _ts(90), 1, "view", 11.0, "{}"),    # gap → new session
        # leading-zero integer: MALFORMED JSON — DuckDB json_extract_string
        # RAISES on it (even under TRY_CAST); the strict-grammar regex gate
        # + the oracle's json_valid guard must both reject it (r9 advisory)
        (13, _ts(91), 1, "view", 12.0, '{"k":007}'),
        (14, _ts(92), 1, "view", 13.0, '{"k": -0}'),  # valid JSON, = 0 both
        (15, _ts(93), 2, "view", 14.0, '{"k":1.5}'),  # fractional → gated
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "events.parquet"))
    return out


# Every oracle query that reads ONLY the events table (the multi-table
# joins — full outer, asof against orders — are covered by the TPC-H
# parity tests; streaming twins by tests/test_streaming.py).
EDGE_EVENT_QUERIES = [
    "events_sessionize",
    "pandas_grouped_rank_normalize",
    "events_funnel_steps",
    "agg_retention_cohort",
    "events_markov_transitions",
    "events_topk_paths",
    "events_anomaly_mad",
    "events_attribution_touch",
    "events_gapfill_ffill",
    "agg_linreg_daily_trend",
    "scalar_date_math_suite",
    "scalar_array_map_json_suite",
    "agg_skew_salted_two_stage",
    # round-8 additions
    "events_user_lifecycle",
    "agg_bitmap_distinct_segments",
    "events_props_json_extract",  # NULL + "{}" props in this fixture
    "join_asof_latest_event",  # r8 completeness audit — was silently missing
    # round-9 pre-staged (M8) additions — gated before promotion
    "agg_theta_sketch_setops",
    "agg_bitmap_distinct_sparse",
    # batch-evaluated sketch-window queries: category streaming/* exempts
    # them from the completeness guard (real-stream cost rationale), but
    # their DECLARED forms are cheap batch plans — so they run here too
    "stream_topk_sketch",
    "stream_kll_quantile_sketch",
]


def test_events_sweep_list_is_complete():
    """Completeness guard (the round-8 docs/TPC-H discovery lesson, applied
    without converting this sweep to auto-discovery): every BATCH
    events-only oracle query must be in EDGE_EVENT_QUERIES — a new
    registration that reads only the events table fails here until it
    joins the sweep. Streaming queries are exempt by design: each runs a
    real staged stream (seconds apiece) and their degenerate/late-data
    semantics are exercised by their own batch-twin harness in
    tests/test_streaming.py."""
    import inspect

    others = (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings",
    )
    for name, spec in all_specs().items():
        if spec.oracle is None or spec.category.startswith("streaming"):
            continue
        src = inspect.getsource(spec.fn) + " " + spec.oracle
        other = any(
            f'"{t}"' in src or f" {t}" in spec.oracle for t in others
        ) or any(api in src for api in ("readStream", "binaryFile"))
        if ('"events"' in src or " events" in spec.oracle) and not other:
            assert name in EDGE_EVENT_QUERIES, (
                f"{name} reads only the events table but is missing from "
                "the degenerate events sweep"
            )


@pytest.mark.parametrize("name", EDGE_EVENT_QUERIES)
def test_events_queries_survive_degenerate_rows(spark, edge_events_dir, name):
    spec = all_specs()[name]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{edge_events_dir}/events.parquet')"
    )
    try:
        problems = compare(spec.fn(spark, edge_events_dir), con, spec.oracle)
    finally:
        con.close()
    assert not problems, "; ".join(str(p) for p in problems)


def test_sessionize_gap_still_splits_on_degenerate_fixture(spark, edge_events_dir):
    """Sanity that the filters didn't neuter the semantics: user 1's
    90-minute-gap event still opens a second session (joined by the two
    round-9 props-edge rows at +91/+92 minutes)."""
    rows = all_specs()["events_sessionize"].fn(spark, edge_events_dir).collect()
    u1 = sorted(
        (r["session_idx"], r["n_events"]) for r in rows if r["user_id"] == 1
    )
    assert u1 == [(1, 3), (2, 3)]
