"""Sketch error-bound robustness BEYOND the grading fixtures: the theta
set-op and KLL rank invariants are declared as always-TRUE booleans, which
is only honest if they hold when the sketches actually approximate — the
fixtures' 150 users keep every sketch in exact mode, so these tests push
past that regime (above the theta lgK=12 exact-mode threshold, and a
100k-value single window for KLL) on synthetic data and assert the
declared bounds still hold. This is the 100 TB claim, tested."""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.oracle import compare
from transf_spark.queries import all_specs


@pytest.fixture(scope="module")
def big_events_dir(tmp_path_factory):
    """~60k events, ~12k distinct users (3x the theta sketch's 4096
    exact-mode capacity), 5 event types with skewed membership, values
    spanning 5 hourly windows with a heavy-hitter tail — all md5-free
    deterministic arithmetic so the fixture is identical every run."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime as dt
    import numpy as np

    out = str(tmp_path_factory.mktemp("big_events"))
    n = 60_000
    i = np.arange(n, dtype=np.int64)
    # md5-derived identities and memberships (the repo's standard
    # determinism device). Multiplicative/Lehmer hashes are NOT mixing
    # enough here: three drafts of this fixture produced disjoint or
    # missing segments through modular algebra (2^16 preserves input
    # parity; 48271 ≡ 1 mod 30 leaks i mod 3 into both the selector and
    # the user id) — md5 has no such residue structure.
    import hashlib

    def _h(tag):
        return np.fromiter(
            (int(hashlib.md5(f"{tag}:{k}".encode()).hexdigest()[:8], 16)
             for k in range(n)),
            dtype=np.int64, count=n,
        )

    user = (_h("u") % 12_000).astype("int64")  # ~12k distinct users
    h = _h("v")  # value spread
    etypes = np.array(["click", "view", "purchase", "signup", "error"])
    h2 = _h("t")  # segment membership, independent of identity
    tsel = np.where(h2 % 10 < 5, 0,
                    np.where(h2 % 10 < 8, 1,
                             np.where(h2 % 10 == 8, 2, np.where(h2 % 3 == 0, 3, 4))))
    etype = etypes[tsel.astype(int)]
    t0 = dt.datetime(2024, 1, 1)
    ts = [t0 + dt.timedelta(seconds=int(s)) for s in (i % (5 * 3600))]
    value = ((h % 100_000) / 100.0) + np.where(i % 997 == 0, 5000.0, 0.0)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(i),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(user),
                "event_type": pa.array(etype.tolist()),
                "value": pa.array(value),
                "props": pa.array([None] * n, pa.string()),
            }
        ),
        os.path.join(out, "events.parquet"),
    )
    return out


def _con(d):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    return con


def test_theta_bounds_hold_beyond_exact_mode(spark, big_events_dir):
    """12k distinct users per segment-pair union puts every theta sketch
    well past its 4096-entry exact mode — the estimates are genuinely
    approximate here, and the declared 5%+1 bound booleans (and the exact
    counts they ride beside) must still hash-match the oracle's TRUE."""
    spec = all_specs()["agg_theta_sketch_setops"]
    df = spec.fn(spark, big_events_dir)
    con = _con(big_events_dir)
    try:
        problems = compare(df, con, spec.oracle)
    finally:
        con.close()
    assert not problems, "; ".join(problems)
    rows = df.collect()
    assert len(rows) == 10  # 5 segments -> 10 pairs
    past_exact = [r for r in rows if r["n_union_exact"] > 4096]
    assert len(past_exact) >= 6, "fixture must push most pairs past exact mode"
    assert all(r["n_intersect_exact"] > 0 for r in rows), "segments must overlap"


def test_kll_rank_bounds_hold_on_dense_windows(spark, big_events_dir):
    """Five 12k-value windows with a heavy-hitter value tail: the KLL
    k=200 sketch is compacting heavily, and the declared 2ε+1 rank-check
    booleans must still hold alongside the exact medians."""
    spec = all_specs()["stream_kll_quantile_sketch"]
    df = spec.fn(spark, big_events_dir)
    con = _con(big_events_dir)
    try:
        problems = compare(df, con, spec.oracle)
    finally:
        con.close()
    assert not problems, "; ".join(problems)
    rows = df.collect()
    assert len(rows) == 5
    assert all(r["n_events"] > 10_000 for r in rows)


@pytest.fixture(scope="module")
def big_tpch_dir(tmp_path_factory):
    """~200k orders with ~110k distinct custkeys (27x the HLL lgK=12
    register budget — deep estimation regime, nowhere near the sparse
    mode the grading fixtures stay in) over 3 skewed statuses, plus a
    200k-row lineitem whose l_quantity sits on 50 tied integer levels —
    the adversarial shape for a rank-guarantee quantile sketch: ~4k-row
    tie runs make value-equality meaningless and the declared 2ε+1 rank
    slack load-bearing. Same md5 determinism device as big_events_dir."""
    import datetime as dt
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("big_tpch"))
    n = 200_000
    i = np.arange(n, dtype=np.int64)

    def _h(tag):
        return np.fromiter(
            (int(hashlib.md5(f"{tag}:{k}".encode()).hexdigest()[:8], 16)
             for k in range(n)),
            dtype=np.int64, count=n,
        )

    hc, hs, hq = _h("cust"), _h("status"), _h("qty")
    custkey = hc % 150_000  # ~110k distinct across 200k draws
    status = np.array(["O", "F", "P"])[
        np.where(hs % 10 < 6, 0, np.where(hs % 10 < 9, 1, 2)).astype(int)
    ]
    t0 = dt.datetime(2024, 1, 1)
    odate = [t0 + dt.timedelta(days=int(d)) for d in (i % 365)]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(i),
                "o_custkey": pa.array(custkey),
                "o_orderstatus": pa.array(status.tolist()),
                "o_totalprice": pa.array((hc % 100_000) / 100.0),
                "o_orderdate": pa.array(odate, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        os.path.join(out, "orders.parquet"),
    )
    qty = (1 + hq % 50).astype(np.float64)  # 50 tie levels, ~4k rows each
    rflag = np.array(["A", "N", "R"])[
        np.where(hs % 7 < 3, 0, np.where(hs % 7 < 6, 1, 2)).astype(int)
    ]
    sdate = [t0 + dt.timedelta(days=int(d)) for d in (i % 365)]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(i),
                "l_partkey": pa.array(hc % 2000),
                "l_suppkey": pa.array(hc % 100),
                "l_linenumber": pa.array((i % 7).astype(np.int32)),
                "l_quantity": pa.array(qty),
                "l_extendedprice": pa.array(qty * 1000.0),
                "l_discount": pa.array((hq % 10) / 100.0),
                "l_tax": pa.array((hq % 8) / 100.0),
                "l_returnflag": pa.array(rflag.tolist()),
                "l_linestatus": pa.array(["O"] * n),
                "l_shipdate": pa.array(sdate, pa.timestamp("us")),
            }
        ),
        os.path.join(out, "lineitem.parquet"),
    )
    return out


def _tpch_con(d):
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    return con


def test_hll_merge_bound_holds_beyond_sparse_mode(spark, big_tpch_dir):
    """Per-status distincts of 20k-70k put every shard sketch AND the
    cross-shard union deep in HLL estimation mode (lgK=12 → 4096
    registers) — the 5% within_bound boolean and the exact counts it
    rides beside must still hash-match the oracle's literal TRUE."""
    spec = all_specs()["agg_hll_shard_merge"]
    df = spec.fn(spark, big_tpch_dir)
    con = _tpch_con(big_tpch_dir)
    try:
        problems = compare(df, con, spec.oracle)
    finally:
        con.close()
    assert not problems, "; ".join(problems)
    rows = df.collect()
    assert len(rows) == 3
    assert all(r["n_exact"] > 4096 for r in rows), \
        "every status must exceed the register budget"


def test_gk_rank_bounds_hold_on_tied_dense_quantities(spark, big_tpch_dir):
    """n ≈ 28-86k per returnflag >> the GK accuracy parameter (10000),
    with ~4k-row tie runs at every quantity level: the sketch is
    genuinely compacting and any off-by-a-level answer moves measured
    rank by ~2% — far outside the declared 2ε+1 slack, so the rank-check
    booleans are doing real work here."""
    spec = all_specs()["agg_approx_percentile"]
    df = spec.fn(spark, big_tpch_dir)
    con = _tpch_con(big_tpch_dir)
    try:
        problems = compare(df, con, spec.oracle)
    finally:
        con.close()
    assert not problems, "; ".join(problems)
    rows = df.collect()
    assert len(rows) == 3
    assert all(r["n_rows"] > 25_000 for r in rows)  # R gets ~1/7 of 200k


def test_window_distinct_bound_holds_at_dense_cardinality(spark, big_events_dir):
    """~7.6k distinct users per hourly window (the 12k-user pool sampled
    12k times) is far past approx_count_distinct's sparse-exact regime at
    rsd=0.01 — the 5% within_bound boolean must hold while the estimate
    is genuinely approximate, on a fixture 80x denser than the grading
    one."""
    spec = all_specs()["stream_window_distinct_users"]
    df = spec.fn(spark, big_events_dir)
    con = _con(big_events_dir)
    try:
        problems = compare(df, con, spec.oracle)
    finally:
        con.close()
    assert not problems, "; ".join(problems)
    rows = df.collect()
    assert len(rows) == 5
    assert all(r["n_users"] > 5_000 for r in rows)


def test_topk_multiset_exact_below_capacity_on_dense_fixture(spark, big_events_dir):
    """stream_topk_sketch's declared count multiset stays exact while
    window cardinality (~12k users) is far below the 100k sketch
    capacity — on a fixture 80x denser than the grading one."""
    spec = all_specs()["stream_topk_sketch"]
    df = spec.fn(spark, big_events_dir)
    con = _con(big_events_dir)
    try:
        problems = compare(df, con, spec.oracle)
    finally:
        con.close()
    assert not problems, "; ".join(problems)


@pytest.mark.parametrize(
    "qname", ["agg_bitmap_distinct_sparse", "agg_bitmap_distinct_segments"]
)
def test_bitmap_distinct_exact_at_dense_cardinality(spark, big_events_dir, qname):
    """The two bitmap pipelines are EXACT by contract at any cardinality —
    unlike the sketches there is no bound to degrade into, so the dense
    fixture (~12k distinct users, 80x the grading density; the sparse
    variant additionally spreads them across the full 64-bit space before
    its dictionary pass) must keep hash-matching COUNT(DISTINCT) outright.
    This is the composition-losslessness claim (hash spread → bucketed-rank
    densification → word pipeline) under real dictionary pressure."""
    spec = all_specs()[qname]
    df = spec.fn(spark, big_events_dir)
    con = _con(big_events_dir)
    try:
        problems = compare(df, con, spec.oracle)
    finally:
        con.close()
    assert not problems, "; ".join(problems)
    rows = df.collect()
    assert len(rows) == 5
    assert sum(r["n_users"] for r in rows) > 30_000  # dictionary did real work


def test_approx_distinct_bound_holds_beyond_sparse_mode(spark, big_tpch_dir):
    """28-86k distinct orderkeys per returnflag put the rsd=0.01 HLL++
    sketch deep past its sparse-exact regime (the grading fixtures never
    leave it) — the declared 5% bound booleans must hold while the
    estimate is genuinely approximate, alongside the exact counts that
    hash-check as usual. The partkey side stays low-cardinality (2000),
    checking both regimes in one declared output."""
    spec = all_specs()["agg_approx_distinct"]
    df = spec.fn(spark, big_tpch_dir)
    con = _tpch_con(big_tpch_dir)
    try:
        problems = compare(df, con, spec.oracle)
    finally:
        con.close()
    assert not problems, "; ".join(problems)
    rows = df.collect()
    assert len(rows) == 3
    assert all(r["n_orders"] > 25_000 for r in rows)
