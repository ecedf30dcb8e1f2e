"""Round-14: the degenerate-fixture device applied to the TPC-H tables
(orders + lineitem) — the last fixture tables without one.

orders gets a NULL o_orderdate / o_totalprice / o_orderpriority /
o_orderstatus and a negative total; lineitem a NULL l_shipdate /
l_extendedprice / l_returnflag, an out-of-domain discount (> 1), and a
negative quantity. Every registered query whose Spark source or oracle
touches either table runs the full DuckDB-oracle compare.

The round-14 exploratory sweep found 3 real splits (fixed in the same
round, ``_SEMANTICS_CHANGED_IN = 14``): Spark's ascending window ORDER
BY defaults to NULLS FIRST where DuckDB defaults to NULLS LAST, so one
NULL sort key silently reordered ``window_percentile_suite`` /
``window_value_suite`` frames and shifted ``agg_weighted_median``'s
cumulative crossing point. The other 59 queries were already mirrored.

Complementary to tests/test_tpch_edges.py (round 6), which sweeps a
MINIMAL hand-built 5-order fixture: there each order sits alone in its
priority partition, so a NULL sort key could never change a rank — the
split only reproduces when the NULL lands inside a POPULATED partition,
which degrading the real sf0.001 tables in place guarantees.
"""

from __future__ import annotations

import inspect
import os
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle import compare
from transf_spark.queries import REGISTRY, _load_all_modules

_ALL_TABLES = (
    "documents", "events", "embeddings", "region", "nation", "customer",
    "supplier", "part", "orders", "lineitem",
)


def _tpch_queries() -> list[str]:
    _load_all_modules()
    names = []
    for name, spec in REGISTRY.items():
        try:
            src = inspect.getsource(spec.fn)
        except (OSError, TypeError):
            src = ""
        blob = src + (spec.oracle or "")
        if any(t in blob for t in (
            "lineitem", "orders", "customer", "supplier",
            "p_partkey", "c_custkey", "s_suppkey",
        )):
            names.append(name)
    return sorted(names)


@pytest.fixture(scope="module")
def degenerate_tpch_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("degenerate_tpch")

    t = pq.read_table(f"{src}/orders.parquet")
    c = {n: t[n].to_pylist() for n in t.schema.names}
    c["o_orderdate"][0] = None
    c["o_totalprice"][1] = None
    c["o_totalprice"][2] = -5.0
    c["o_orderpriority"][3] = None
    c["o_orderstatus"][4] = None
    pq.write_table(
        pa.table({n: pa.array(c[n], t.schema.field(n).type)
                  for n in t.schema.names}),
        str(out / "orders.parquet"),
    )

    t2 = pq.read_table(f"{src}/lineitem.parquet")
    c2 = {n: t2[n].to_pylist() for n in t2.schema.names}
    c2["l_shipdate"][0] = None
    c2["l_discount"][1] = 1.5
    c2["l_quantity"][2] = -3.0
    c2["l_extendedprice"][3] = None
    c2["l_returnflag"][4] = None
    pq.write_table(
        pa.table({n: pa.array(c2[n], t2.schema.field(n).type)
                  for n in t2.schema.names}),
        str(out / "lineitem.parquet"),
    )

    # dimensions degraded too (round-14 dims probe — caught the
    # window_ntile_deciles decile-boundary shift on a NULL c_acctbal)
    def _degrade(name, edits):
        td = pq.read_table(f"{src}/{name}.parquet")
        cd = {n: td[n].to_pylist() for n in td.schema.names}
        for col, idx, val in edits:
            if col in cd:
                cd[col][idx] = val
        pq.write_table(
            pa.table({n: pa.array(cd[n], td.schema.field(n).type)
                      for n in td.schema.names}),
            str(out / f"{name}.parquet"),
        )

    _degrade("customer", [("c_name", 0, None), ("c_acctbal", 1, None),
                          ("c_acctbal", 2, -999999.0),
                          ("c_mktsegment", 3, None),
                          ("c_nationkey", 4, None)])
    _degrade("supplier", [("s_name", 0, None), ("s_acctbal", 1, None),
                          ("s_nationkey", 2, None)])
    _degrade("part", [("p_name", 0, None), ("p_brand", 1, None),
                      ("p_type", 2, None), ("p_size", 3, None),
                      ("p_retailprice", 4, None)])

    for name in _ALL_TABLES:
        if name in ("orders", "lineitem", "customer", "supplier", "part"):
            continue
        shutil.copy(f"{src}/{name}.parquet", str(out / f"{name}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", _tpch_queries())
def test_tpch_family_survives_degenerate_fixture(
    spark, degenerate_tpch_dir, name
):
    spec = REGISTRY[name]
    df = spec.fn(spark, degenerate_tpch_dir)
    con = duckdb.connect()
    for tbl in _ALL_TABLES:
        if os.path.exists(f"{degenerate_tpch_dir}/{tbl}.parquet"):
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM "
                f"read_parquet('{degenerate_tpch_dir}/{tbl}.parquet')"
            )
    problems = compare(df, con, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)
