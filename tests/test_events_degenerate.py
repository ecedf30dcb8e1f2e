"""Round-14: the corrupt-fixture device applied to the EVENTS table.

A regenerated events fixture bearing NULL ts/event_type/user_id/value,
NaN/±Infinity/overflow doubles in the free-form ``value`` measure,
malformed/non-object props JSON, duplicate event_ids, an empty
event_type, and epoch-0/far-future timestamps must leave every
event-touching query and its DuckDB oracle in exact agreement.

The exploratory sweep this test pins found 8 real divergences (fixed in
the same round, ``_SEMANTICS_CHANGED_IN = 14``): six where CAST of a
non-finite/overflow double to DECIMAL/BIGINT silently NULLs under
Spark's ANSI-off cast but HARD-ERRORS the DuckDB oracle connection, one
true value drift (``events_anomaly_mad`` — percentile vs quantile_cont
NaN placement), and one Spark-side crash (``stream_kll_quantile_sketch``
— the KLL sketch built over NaN yields a buffer the quantile extractor
rejects outright).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle import compare
from transf_spark.queries import REGISTRY, _load_all_modules

# every registered query whose Spark source or oracle touches events
_QUERIES = [
    "agg_bitmap_distinct_segments",
    "agg_bitmap_distinct_sparse",
    "agg_linreg_daily_trend",
    "agg_retention_cohort",
    "agg_skew_salted_two_stage",
    "agg_theta_sketch_setops",
    "completion_manifest",
    "events_anomaly_mad",
    "events_attribution_touch",
    "events_funnel_steps",
    "events_gapfill_ffill",
    "events_markov_transitions",
    "events_props_json_extract",
    "events_sessionize",
    "events_topk_paths",
    "events_user_lifecycle",
    "filter_path_security",
    "join_asof_latest_event",
    "join_full_outer",
    "pandas_grouped_rank_normalize",
    "scalar_array_map_json_suite",
    "scalar_date_math_suite",
    "stream_checkpoint_incremental",
    "stream_kll_quantile_sketch",
    "stream_session_window",
    "stream_sliding_window",
    "stream_stateful_reassembly",
    "stream_topk_sketch",
    "stream_tumbling_window",
    "stream_watermark_late_drop",
    "stream_window_distinct_users",
    "window_running_sum_frame",
]

_ALL_TABLES = (
    "documents", "events", "embeddings", "region", "nation", "customer",
    "supplier", "part", "orders", "lineitem",
)


@pytest.fixture(scope="module")
def degenerate_dir(tmp_path_factory):
    """sf0.001 events degraded in place; every other table verbatim."""
    src = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("degenerate_events")
    t = pq.read_table(f"{src}/events.parquet")
    cols = {n: t[n].to_pylist() for n in t.schema.names}
    cols["ts"][0] = None
    cols["event_type"][1] = None
    cols["user_id"][2] = None
    cols["value"][3] = None
    cols["value"][4] = float("nan")
    cols["value"][5] = float("inf")
    cols["props"][6] = None
    cols["props"][7] = "{invalid json"
    cols["props"][8] = "[]"
    cols["ts"][9] = dt.datetime(1970, 1, 1)
    cols["ts"][10] = dt.datetime(2199, 12, 31, 23, 59, 59)
    cols["event_id"][11] = cols["event_id"][12]  # duplicate key
    cols["event_type"][13] = ""
    cols["value"][14] = -1e308  # finite but decimal/int64-unrepresentable
    t2 = pa.table(
        {n: pa.array(cols[n], t.schema.field(n).type) for n in t.schema.names}
    )
    pq.write_table(t2, str(out / "events.parquet"))
    for name in _ALL_TABLES:
        if name == "events":
            continue
        p = f"{src}/{name}.parquet"
        if os.path.exists(p):
            shutil.copy(p, str(out / f"{name}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", _QUERIES)
def test_events_family_survives_degenerate_fixture(spark, degenerate_dir, name):
    _load_all_modules()
    spec = REGISTRY[name]
    df = spec.fn(spark, degenerate_dir)
    con = duckdb.connect()
    for tbl in _ALL_TABLES:
        if os.path.exists(f"{degenerate_dir}/{tbl}.parquet"):
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM "
                f"read_parquet('{degenerate_dir}/{tbl}.parquet')"
            )
    problems = compare(df, con, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)
