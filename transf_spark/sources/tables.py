"""Schema-pinned parquet loaders (SURVEY.md §2 R1 — file scan source).

Reference behavior being reproduced: the client opens a file in binary mode
and learns its size before streaming it (`/root/reference/transf_client.cpp:102,109-110`).
The Spark-native equivalent of "open + size + sequential read" is a parquet
scan with an explicit schema — size/metadata come from the footer, reads are
columnar and pushed-down.

Scale notes (100 TB): loaders never infer, and return plain scans so Catalyst
can prune columns/partitions per query. Nothing here forces materialization.
Loads are memoized per (session, file identity) as PLAN objects — the cache
holds the lazy scan (file listing + footer schema resolution), never rows;
every action still reads the parquet bytes. This is the same metadata reuse a
catalog table provides (optimization guide §6: manifest metadata beats
re-listing), keyed on (mtime_ns, size) so a regenerated fixture re-resolves.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession, functions as F

from transf_spark import schemas
from transf_spark.session import ensure_conf

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def staging_tag(sf_dir: str, *tables: str, extra: str = "") -> str:
    """Cache tag for /tmp staging dirs derived from fixture tables.

    Includes each source parquet's (mtime_ns, size) so regenerating fixtures
    in place invalidates the staged copy instead of silently replaying stale
    data against a fresh oracle (round-2 ADVICE). The tag is content-derived,
    so distinct fixtures can't collide on a predictable path either.
    """
    import hashlib

    parts = [sf_dir, extra]
    for name in tables:
        p = table_path(sf_dir, name)
        st = os.stat(p)
        parts.append(f"{name}:{st.st_mtime_ns}:{st.st_size}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


# How long an untouched completed stage survives a sibling's tag-miss
# eviction. Every stage_once() on a dir re-touches its marker, so only a
# stage no process has asked for in this window is collectable.
_EVICT_AGE_SEC = 3600.0


def stage_once(prefix: str, tag: str, write_fn) -> str:
    """Shared stage-once contract for every /tmp staging site (formats,
    bucketed tables, partitioned docs, stream sources): the target dir is
    ``prefix + tag``; a present ``_READY`` marker means a completed stage
    to reuse, otherwise evict stale siblings under ``prefix``, run
    ``write_fn(out_dir)``, and touch the marker.

    The whole check-evict-write-mark sequence holds an exclusive flock on
    ``prefix + '.lock'`` — without it, a second process entering the same
    site mid-write could rmtree the first one's markerless in-progress
    directory or read a half-written stage (the TOCTOU the round-5 review
    flagged, previously hand-copied with no lock at five formats.py sites
    plus the streaming sources). Same-host serialization is sufficient:
    driver, pytest and bench all stage on this machine's /tmp.

    Eviction is AGE-GATED (round 15): evicting every sibling on a tag miss
    deleted a dir a CONCURRENT process (different fixture ⇒ different tag)
    was actively streaming from — observed live as FAILED_READ_FILE when an
    sf0.01 oracle sweep staged while pytest's degenerate-fixture ack stream
    was mid-query on its own tag. Each reuse touches the ``_READY`` marker,
    and only siblings whose marker is older than ``_EVICT_AGE_SEC`` (or
    markerless leftovers of a crashed stage) are evicted — an active dir is
    re-touched every stage_once call, so it can't age out mid-use, while
    genuinely stale fixture generations still get collected.
    """
    import fcntl
    import glob
    import shutil
    import time

    out = prefix + tag
    marker = os.path.join(out, "_READY")
    if os.path.exists(marker):  # fast path, no lock: marker dirs are final
        try:
            os.utime(marker)  # keep-alive against sibling eviction
        except OSError:
            pass
        return out
    with open(prefix + ".lock", "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        if not os.path.exists(marker):  # re-check under the lock
            now = time.time()
            for d in glob.glob(prefix + "*"):
                if d == out or d == prefix + ".lock":
                    continue
                m = os.path.join(d, "_READY")
                try:
                    fresh = now - os.stat(m).st_mtime < _EVICT_AGE_SEC
                except OSError:
                    fresh = False  # markerless: crashed half-stage, evict
                if not fresh:
                    shutil.rmtree(d, ignore_errors=True)
            write_fn(out)
            open(marker, "w").close()
    return out


# events.ts parquet time-unit per file path — the driver's generator has
# shipped this column as both TIMESTAMP(NANOS) (rounds 1-2) and
# TIMESTAMP(MICROS) (round 3); assuming one of them silently shifts every
# timestamp by 1000× when the fixture changes, so the unit is detected from
# the parquet footer (one cheap driver-side metadata read, cached by
# (path, mtime) so a regenerated fixture re-detects).
_TS_UNIT_CACHE: dict[tuple[str, int], str] = {}


def events_ts_unit(sf_dir: str) -> str:
    """'ns' or 'us' — the physical unit of events.ts in this fixture."""
    path = table_path(sf_dir, "events")
    key = (path, os.stat(path).st_mtime_ns)
    if key not in _TS_UNIT_CACHE:
        import pyarrow.parquet as pq

        t = pq.read_schema(path).field("ts").type
        unit = getattr(t, "unit", "ns")
        if unit not in ("ns", "us"):
            raise ValueError(f"unsupported events.ts unit {unit!r} in {path}")
        # Stale mtimes for the same path are dead (fixture regenerated in
        # place); dropping them keeps the dict bounded by live fixture count
        # in a long-lived process (round-3 ADVICE).
        for dead in [k for k in _TS_UNIT_CACHE if k[0] == path]:
            del _TS_UNIT_CACHE[dead]
        _TS_UNIT_CACHE[key] = unit
    return _TS_UNIT_CACHE[key]


def ts_micros_col(sf_dir: str, col: str = "ts") -> F.Column:
    """Raw int64 ``ts`` (read under ``nanosAsLong``) → TIMESTAMP at
    microsecond precision, whatever unit the parquet stores.

    Integer div truncation toward -inf matches DuckDB's ns→us cast for
    post-epoch data (all fixture timestamps are 2024+)."""
    raw = F.expr(f"{col} div 1000") if events_ts_unit(sf_dir) == "ns" else F.col(col)
    return F.timestamp_micros(raw)


# session -> {(abspath, mtime_ns, size) -> DataFrame}. Weak-keyed so a
# stopped session's plans are collectable. Round-15 measurement: one bench
# build pass makes 331 load_table calls for 10 distinct tables, and each
# cold call pays 15 ms (schema-pinned relation resolve + file listing) to
# 86 ms (events: the normalization select re-analyzes eagerly) of pure
# driver-side metadata work — 19.5 s of a 90 s pass recomputing identical
# lazy plans. Caching the PLAN is not caching data or results: the
# DataFrame holds file paths + schema; every action re-scans the parquet.
# No builder loads the same table twice and bracket-joins the two loads
# (checked round-15), so object identity cannot create an ambiguous
# self-join that the two-reads form would have avoided.
_PLAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table with its pinned schema.

    ``events`` is normalized: parquet TIMESTAMP(NANOS or MICROS) → int64 (via
    ``spark.sql.legacy.parquet.nanosAsLong``; a micros column under a pinned
    LongType field likewise surfaces as the raw count) → microsecond
    TIMESTAMP_NTZ, bit-identical to DuckDB's read of the same file.  The
    nano-precision count is kept as ``ts_ns`` for ordering fidelity.
    """
    ensure_conf(spark)
    if name not in schemas.SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {schemas.TABLE_NAMES}")
    path = os.path.abspath(table_path(sf_dir, name))
    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    per_session = _PLAN_CACHE.setdefault(spark, {})
    cached = per_session.get(key)
    if cached is not None:
        return cached
    df = spark.read.schema(schemas.SCHEMAS[name]).parquet(path)
    if name == "events":
        ns = F.col("ts") if events_ts_unit(sf_dir) == "ns" else F.col("ts") * 1000
        # one select, not withColumn chains — each withColumn re-analyzes
        # the growing plan eagerly (measured 86 ms/call vs 15 for a plain
        # schema-pinned scan)
        df = df.select(
            "event_id",
            ts_micros_col(sf_dir).cast("timestamp_ntz").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
            ns.alias("ts_ns"),
        )
    # a regenerated fixture (new mtime/size) must not strand the old plan
    for stale in [k for k in per_session if k[0] == path and k != key]:
        del per_session[stale]
    per_session[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in schemas.TABLE_NAMES}


# session -> the (name -> (path, mtime_ns, size) | None) snapshot its temp
# views were last registered from. Weak-keyed like _PLAN_CACHE. Round-15
# measurement: a warm register_views call costs ~58 ms of py4j
# createOrReplaceTempView round trips, and 24 sql_* builders call it per
# bench pass (~7 s per 5-pass session) while the registered state is
# byte-identical between calls. The snapshot is re-stat'ed every call
# (10 os.stat ≈ 0.1 ms), so a regenerated fixture, a different sf_dir, or
# a table appearing/vanishing all change the snapshot and force a real
# re-registration — only the true no-op case is skipped. Nothing else in
# the repo creates or drops these temp views (checked round-15), so the
# snapshot cannot go stale behind the cache's back.
_VIEWS_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table PRESENT in ``sf_dir`` as a temp view (for the
    SQL-facing API). Partial fixtures are legitimate — the degenerate parity
    sweeps stage single-family dirs (TPC-H-only, documents-only), and a
    TPC-H query must not fail because events.parquet is absent. A table
    ABSENT from ``sf_dir`` has its view DROPPED, never left behind: a
    shared session (pytest, REPL, bench) that previously registered a full
    fixture would otherwise silently serve the PREVIOUS fixture's data to
    a query referencing the missing table (round-8 review finding) — the
    drop makes such a query fail loudly at resolution instead."""
    snapshot: dict[str, tuple | None] = {}
    for name in schemas.TABLE_NAMES:
        p = table_path(sf_dir, name)
        try:
            st = os.stat(p)
            snapshot[name] = (os.path.abspath(p), st.st_mtime_ns, st.st_size)
        except OSError:
            snapshot[name] = None
    if _VIEWS_CACHE.get(spark) == snapshot:
        # Hardening (round-15 ADVICE): the snapshot can't see an external
        # DROP VIEW / createOrReplaceTempView on this session (e.g. user
        # code on the SQL-facing API), so verify the registered names
        # still resolve before taking the skip path. tableExists is a
        # catalog lookup (~0.5 ms each, ≤10 names) — an order cheaper
        # than the ~58 ms re-registration the memo exists to skip.
        if all(
            spark.catalog.tableExists(name)
            for name, key in snapshot.items()
            if key is not None
        ):
            return
        del _VIEWS_CACHE[spark]
    for name, key in snapshot.items():
        if key is not None:
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        else:
            spark.catalog.dropTempView(name)
    _VIEWS_CACHE[spark] = snapshot
