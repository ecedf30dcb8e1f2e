"""Degenerate-TPC-H parity sweep (round-6 fourth family): NULLs in every
non-key column — dates, prices, quantities, flags, names, segments —
across customer/supplier/part/orders/lineitem, with clean region/nation
dimensions. The classes this caught on first run (all fixed):

- NULL group keys survive GROUP BY but never plain-equi-join: the
  sketch-vs-exact rejoins in agg_approx_distinct / agg_approx_percentile
  / agg_hll_shard_merge silently dropped the NULL group (→ eqNullSafe);
- non-total partition predicates: agg_incremental_state_merge's
  `< split` / `>= split` pair lost NULL-dated orders from BOTH sides;
- NULL order dates hit the Spark-NULLS-FIRST vs DuckDB-NULLS-LAST window
  divergence in merge_scd2_upsert's validity chain (→ undated change
  events excluded in both dialects);
- int(NaN) crash in the pandas size-formatter UDF (→ na_action).

Queries are discovered automatically: every oracle-checked registry entry
whose source references ONLY TPC-H tables runs here, so future relational
additions inherit the gate.
"""

from __future__ import annotations

import datetime as dt
import inspect
import os

import duckdb
import pytest

from tests.oracle import compare
from transf_spark.queries import all_specs, queries

_TPCH = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
_OTHER = ("documents", "embeddings", "events", "binaryFile", "readStream")

_T0 = dt.datetime(1995, 6, 1)


def _d(days: int) -> dt.datetime:
    return _T0 + dt.timedelta(days=days)


def _tpch_only_queries() -> list[str]:
    out = []
    for name, spec in all_specs().items():
        if spec.oracle is None:
            continue
        # function source for load_table("<t>") callers; the ORACLE SQL for
        # the sql-api family, whose table references live in module-level
        # SQL constants the function source never mentions (round-8 fix —
        # discovery had silently skipped every spark.sql query, so the
        # whole sql_* family missed the degenerate sweep)
        src = inspect.getsource(spec.fn) + " " + spec.oracle
        # exclusion matches only REAL references — a quoted load_table
        # argument or an oracle SQL table token — never a bare substring:
        # agg_mode_exact's docstring cross-references "events_topk_paths"
        # and a substring match silently dropped it from this sweep
        # (round-8 review finding)
        other = any(
            f'"{t}"' in src or f" {t}" in spec.oracle for t in _OTHER[:3]
        ) or any(api in src for api in _OTHER[3:])
        if (
            any(f'"{t}"' in src for t in _TPCH)
            or any(f" {t}" in spec.oracle for t in _TPCH)
        ) and not other:
            out.append(name)
    return out


@pytest.fixture(scope="module")
def edge_tpch_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("edge_tpch"))

    def w(name, cols):
        pq.write_table(pa.table(cols), os.path.join(out, f"{name}.parquet"))

    w("region", {"r_regionkey": pa.array([0, 1], pa.int32()),
                 "r_name": pa.array(["ASIA", "EUROPE"])})
    w("nation", {"n_nationkey": pa.array(list(range(4)), pa.int32()),
                 "n_name": pa.array([f"NATION_{i}" for i in range(4)]),
                 "n_regionkey": pa.array([0, 0, 1, 1], pa.int32())})
    w("customer", {"c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
                   "c_name": pa.array(["Customer#1", None, "Customer#3", "Customer#4"]),
                   "c_nationkey": pa.array([0, 1, 2, 3], pa.int32()),
                   "c_acctbal": pa.array([100.0, None, -50.0, 700.0], pa.float64()),
                   "c_mktsegment": pa.array(["BUILDING", "AUTO", None, "BUILDING"])})
    w("supplier", {"s_suppkey": pa.array([1, 2], pa.int64()),
                   "s_name": pa.array(["Supp#1", None]),
                   "s_nationkey": pa.array([0, 1], pa.int32()),
                   "s_acctbal": pa.array([10.0, None], pa.float64())})
    w("part", {"p_partkey": pa.array([1, 2, 3], pa.int64()),
               "p_name": pa.array(["alpha", None, "gamma"]),
               "p_brand": pa.array(["Brand#3", None, "Brand#14"]),
               "p_type": pa.array(["ECONOMY X", "STANDARD Y", None]),
               "p_size": pa.array([1, None, 9], pa.int32()),
               "p_retailprice": pa.array([10.0, 20.0, None], pa.float64())})
    w("orders", {"o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                 "o_custkey": pa.array([1, 2, 3, 4, 1], pa.int64()),
                 "o_orderstatus": pa.array(["F", "O", None, "F", "P"]),
                 "o_totalprice": pa.array([100.0, None, 300.0, 400.0, 500.0], pa.float64()),
                 "o_orderdate": pa.array([_d(0), _d(10), None, _d(400), _d(20)],
                                          pa.timestamp("us")),
                 "o_orderpriority": pa.array(["1-URGENT", None, "5-LOW", "2-HIGH", "3-MEDIUM"])})
    w("lineitem", {"l_orderkey": pa.array([1, 1, 2, 3, 4, 5], pa.int64()),
                   "l_partkey": pa.array([1, 2, 3, 1, 2, 3], pa.int64()),
                   "l_suppkey": pa.array([1, 2, 1, 2, 1, 2], pa.int64()),
                   "l_linenumber": pa.array([1, 2, 1, 1, 1, 1], pa.int32()),
                   "l_quantity": pa.array([5.0, None, 10.0, 20.0, 30.0, 40.0], pa.float64()),
                   "l_extendedprice": pa.array([50.0, 60.0, None, 200.0, 300.0, 400.0], pa.float64()),
                   "l_discount": pa.array([0.1, 0.05, 0.0, None, 0.02, 0.03], pa.float64()),
                   "l_tax": pa.array([0.02, 0.01, None, 0.04, 0.0, 0.05], pa.float64()),
                   "l_returnflag": pa.array(["R", None, "A", "N", "R", "A"]),
                   "l_linestatus": pa.array(["F", "O", None, "F", "O", "F"]),
                   "l_shipdate": pa.array([_d(5), None, _d(15), _d(30), _d(410), _d(25)],
                                           pa.timestamp("us"))})
    return out


@pytest.mark.parametrize("name", _tpch_only_queries())
def test_tpch_queries_survive_degenerate_rows(spark, edge_tpch_dir, name):
    spec = all_specs()[name]
    con = duckdb.connect()
    for t in _TPCH:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{edge_tpch_dir}/{t}.parquet')"
        )
    try:
        problems = compare(spec.fn(spark, edge_tpch_dir), con, spec.oracle)
    finally:
        con.close()
    assert not problems, "; ".join(str(p) for p in problems)
