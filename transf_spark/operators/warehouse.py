"""Warehouse-maintenance operators (north-star extension, round 5).

The table-maintenance patterns a production lakehouse runs beside the
analytical queries — each re-expressed as a declarative single-output
DataFrame so Catalyst owns the physical strategy:

- ``merge_scd2_upsert``       — MERGE INTO as a type-2 slowly-changing
                                dimension rebuild (history with validity
                                intervals), one dimension-key shuffle
- ``window_range_interval``   — trailing 30-day per-customer revenue via a
                                RANGE (value-based) window frame, money in
                                exact decimals
- ``agg_hll_shard_merge``     — two-level mergeable HLL sketches (per-shard
                                sketch → union), the re-aggregatable
                                distinct-count architecture at 100 TB

All three are oracle-checked against DuckDB. Money accumulates as
DECIMAL(12,2) and round-trips as a string (agg_decimal_exact_money
precedent); the HLL query declares the *invariant* (exact count + an
error-bound boolean) since sketch bytes are engine-specific
(agg_approx_distinct precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from transf_spark.functions.exprs import dec
from transf_spark.queries import register
from transf_spark.sources.tables import load_table

SCD2_EPOCH = "1990-01-01"  # synthetic initial-load date, before any order
HLL_SHARDS = 16
HLL_BOUND = 0.05  # |estimate − exact| ≤ 5%·exact (default lgK=12 ⇒ ~1.6% rse)


@register(
    "merge_scd2_upsert",
    oracle=f"""
    WITH upd AS (
      SELECT o_custkey AS c_custkey, CAST(o_orderdate AS DATE) AS valid_from,
             o_orderpriority AS segment
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, CAST(o_orderdate AS DATE)
                                         ORDER BY o_orderkey DESC) AS rn
            FROM orders WHERE o_orderdate IS NOT NULL)
      WHERE rn = 1
    ),
    hist AS (
      SELECT c_custkey, DATE '{SCD2_EPOCH}' AS valid_from, c_mktsegment AS segment
      FROM customer
      UNION ALL SELECT * FROM upd
    ),
    collapsed AS (
      SELECT * FROM (
        SELECT c_custkey, valid_from, segment,
               LAG(segment) OVER (PARTITION BY c_custkey ORDER BY valid_from) AS prev
        FROM hist)
      WHERE prev IS NULL OR segment <> prev
    )
    SELECT c_custkey, segment, valid_from,
           LEAD(valid_from) OVER (PARTITION BY c_custkey ORDER BY valid_from) AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY c_custkey ORDER BY valid_from) IS NULL
             AS is_current
    FROM collapsed
    """,
    category="warehouse/merge",
    origin="EXT",
)
def merge_scd2_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO re-expressed as a type-2 SCD rebuild: the customer table
    is the initial dimension load (valid from a synthetic epoch), the
    orders feed plays the change stream (per customer+day, the highest
    order key's priority wins — a pinned tie-break, deterministic under
    retry). Consecutive same-value versions collapse, then validity
    intervals come from LEAD over the surviving versions; the open
    interval is the current row.

    Scale: every window partitions by c_custkey, so the whole rebuild is
    ONE dimension-key shuffle reused across the dedup window, the
    collapse LAG and the interval LEAD (plan-gated ≤2 exchanges — the
    union's second input reuses the same hash distribution). This is the
    scalable alternative to row-at-a-time MERGE: at 100 TB the change
    feed and dimension co-partition and the history rewrites in one
    pass."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    day = F.col("o_orderdate").cast("date")
    # o_orderdate IS NOT NULL in BOTH dialects: an undated change event
    # has no position on the validity timeline, and a NULL valid_from
    # sorts FIRST in Spark windows but LAST in DuckDB's — shifting the
    # whole collapse/interval chain (round-6 universe sweep)
    orders = orders.filter(F.col("o_orderdate").isNotNull())
    upd = (
        orders.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("o_custkey", day).orderBy(F.col("o_orderkey").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            day.alias("valid_from"),
            F.col("o_orderpriority").alias("segment"),
        )
    )
    base = cust.select(
        "c_custkey",
        F.lit(SCD2_EPOCH).cast("date").alias("valid_from"),
        F.col("c_mktsegment").alias("segment"),
    )
    wv = W.partitionBy("c_custkey").orderBy("valid_from")
    collapsed = (
        base.unionByName(upd)
        .withColumn("prev", F.lag("segment").over(wv))
        .filter(F.col("prev").isNull() | (F.col("segment") != F.col("prev")))
        .drop("prev")
    )
    return collapsed.select(
        "c_custkey",
        "segment",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )


@register(
    "window_range_interval",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
             CAST(o_totalprice AS DECIMAL(12,2)) AS price
      FROM orders
    )
    SELECT o_orderkey, o_custkey, CAST(d AS BIGINT) AS epoch_day,
           CAST(SUM(price) OVER w AS VARCHAR) AS trailing30_exact,
           CAST(SUM(price) OVER w AS DOUBLE) AS trailing30,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_30d
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY d
                 RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
    """,
    category="window/range-frame",
    origin="EXT",
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-day spend per customer — the VALUE-based (RANGE) window
    frame, complementing the ROWS frames in window_running_sum_frame: the
    frame is every order whose *day* falls in [day−29, day], regardless of
    row position, so gaps and same-day ties are handled by the frame
    semantics, not the sort. Day arithmetic is integer epoch-days (no
    timezone or DST drift); money sums as DECIMAL(12,2) — a RANGE frame
    includes ALL peer rows of the current day, so a float sum would
    otherwise depend on peer order at 1000 executors. The exact decimal
    round-trips as a string, digit-checked by the oracle.

    Scale: one o_custkey shuffle (plan-gated), frame evaluation is a
    per-partition sorted sliding sum."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("epoch_day"),
        dec("o_totalprice").alias("price"),
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("epoch_day")
        .rangeBetween(-29, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "epoch_day",
        F.sum("price").over(w).cast("string").alias("trailing30_exact"),
        F.sum("price").over(w).cast("double").alias("trailing30"),
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    )


@register(
    "agg_hll_shard_merge",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,
           TRUE AS within_bound
    FROM orders GROUP BY 1
    """,
    category="aggregation/sketch",
    origin="EXT",
)
def agg_hll_shard_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level mergeable distinct counting — the architecture that
    replaces COUNT(DISTINCT) at 100 TB: each of HLL_SHARDS data shards
    builds its own Datasketches HLL sketch (one map-side-combinable
    pass), and the per-status answer is the UNION of shard sketches —
    proving the sketches re-aggregate losslessly across shards, which is
    what lets a lakehouse maintain per-partition sketches and answer
    rollups without rescanning raw data. Declared output is the invariant
    (agg_approx_distinct precedent): the exact count, hash-checked, plus
    a boolean asserting the merged estimate lands within 5% (the default
    lgK=12 sketch carries ~1.6% rse — deterministic for fixed input, so
    the boolean is stable). The oracle emits literal TRUE; a sketch or a
    broken merge drifting out of bound hash-mismatches.

    Plan: sketches and exact distincts run as two separate aggregates
    joined on the 3-row status key (broadcast) — never in one agg, to
    keep sketch buffers out of the distinct Expand (the 37× lesson on
    agg_approx_distinct, relational.py)."""
    orders = load_table(spark, sf_dir, "orders")
    shard_sk = (
        orders.withColumn("shard", F.pmod(F.col("o_orderkey"), F.lit(HLL_SHARDS)))
        .groupBy("o_orderstatus", "shard")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    )
    merged = shard_sk.groupBy("o_orderstatus").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    # eqNullSafe: a NULL status group (regeneration-latent) exists on both
    # sides but never plain-equi-joins, silently dropping the group the
    # oracle's GROUP BY keeps (round-6 universe sweep)
    return exact.join(
        F.broadcast(merged),
        exact["o_orderstatus"].eqNullSafe(merged["o_orderstatus"]),
    ).select(
        exact["o_orderstatus"],
        "n_exact",
        (
            F.abs(F.col("est") - F.col("n_exact")) <= HLL_BOUND * F.col("n_exact")
        ).alias("within_bound"),
    )


ZORDER_BUCKETS_SHIFT = 28  # top 4 bits of the 32-bit z-value ⇒ 16 buckets
INCR_SPLIT_DAY = "1999-01-01"  # state = orders before, delta = orders after


# The classic 16→32-bit interleave ('spread bits'): 4 shift/mask steps
# per dimension, then the even/odd-bit merge yields the Morton (Z-curve)
# code. ONE mask table feeds both dialects below — the Spark expressions
# and the DuckDB oracle CTE chain are generated from it, so editing a
# mask cannot desync the two sides.
_MORTON_MASKS = ((8, 16711935), (4, 252645135), (2, 858993459), (1, 1431655765))


def _morton_spread_steps(col: str, shl) -> list[tuple[str, str]]:
    """(name, expr) spread steps for one dimension; `shl(expr, n)`
    renders the dialect's left shift."""
    steps = []
    cur = col
    for i, (sh, mask) in enumerate(_MORTON_MASKS):
        nxt = f"{col}_{i}"
        steps.append((nxt, f"({cur} | {shl(cur, sh)}) & {mask}"))
        cur = nxt
    return steps


def _zorder_oracle_sql() -> str:
    """DuckDB oracle generated from _MORTON_MASKS — one CTE per spread
    step carrying both dimensions (date_diff/& are BIGINT-native in
    DuckDB, matching the Spark side's explicit long cast)."""
    shl = lambda e, n: f"({e} << {n})"  # noqa: E731
    ctes = [
        """base AS (
      SELECT o_custkey & 65535 AS x,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) & 65535 AS y,
             CAST(o_totalprice AS DECIMAL(12,2)) AS price
      FROM orders
    )"""
    ]
    prev = "base"
    x_steps = _morton_spread_steps("x", shl)
    y_steps = _morton_spread_steps("y", shl)
    for i, ((xn, xe), (yn, ye)) in enumerate(zip(x_steps, y_steps)):
        ctes.append(f"s{i} AS (\n      SELECT *, {xe} AS {xn}, {ye} AS {yn} FROM {prev}\n    )")
        prev = f"s{i}"
    ctes.append(
        f"""z AS (
      SELECT x, y, price,
             (x_3 | (y_3 << 1)) >> {ZORDER_BUCKETS_SHIFT} AS bucket
      FROM {prev}
    )"""
    )
    return (
        "\n    WITH "
        + ", ".join(ctes)
        + """
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(x) AS BIGINT) AS min_cust, CAST(MAX(x) AS BIGINT) AS max_cust,
           CAST(MIN(y) AS BIGINT) AS min_day, CAST(MAX(y) AS BIGINT) AS max_day,
           CAST(SUM(price) AS VARCHAR) AS revenue_exact
    FROM z GROUP BY 1
    """
    )


@register(
    "layout_zorder_stats",
    oracle=_zorder_oracle_sql(),
    category="layout/data-skipping",
    origin="EXT",
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout statistics — the file-layout move that
    makes multi-dimensional data skipping work at 100 TB: interleaving the
    bits of (customer, order-day) gives a single sort/bucket key whose
    ranges bound BOTH dimensions, so per-file min/max footers prune scans
    filtered on either column (a linear sort bounds only its leading
    column). The z-value is pure integer arithmetic (4 shift/mask spread
    steps per dimension, then even/odd merge) and the bucket is the code's
    top 4 bits — a MAP, not a global sort: at scale this same expression
    feeds repartitionByRange + sortWithinPartitions at write time. The
    declared output is each z-bucket's row count, both per-dimension
    min/max envelopes (the footer stats a reader would prune on), and the
    exact-decimal revenue it covers. One map-side-combinable exchange
    (plan-gated), scan pruned to 3 columns."""
    orders = load_table(spark, sf_dir, "orders")
    df = orders.select(
        (F.col("o_custkey").bitwiseAND(65535)).alias("x"),
        # datediff is IntegerType: widen to long BEFORE the spread steps —
        # shiftleft on int32 wraps negative once the masked day has bit 15
        # set (epoch day ≥ 32768, i.e. dates from 2059-09-18), where the
        # oracle's BIGINT-native date_diff stays positive. The & 65535
        # domain clamp is explicit in both dialects.
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .bitwiseAND(65535)
        .alias("y"),
        dec("o_totalprice").alias("price"),
    )
    for col in ("x", "y"):
        for name, expr in _morton_spread_steps(
            col, lambda e, n: f"shiftleft({e}, {n})"
        ):
            df = df.withColumn(name, F.expr(expr))
    df = df.withColumn(
        "bucket",
        F.expr(f"shiftright(x_3 | shiftleft(y_3, 1), {ZORDER_BUCKETS_SHIFT})").cast(
            "long"
        ),
    )
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("x").cast("long").alias("min_cust"),
        F.max("x").cast("long").alias("max_cust"),
        F.min("y").cast("long").alias("min_day"),
        F.max("y").cast("long").alias("max_day"),
        F.sum("price").cast("string").alias("revenue_exact"),
    )


@register(
    "agg_incremental_state_merge",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS revenue_exact,
           MIN(CAST(o_orderdate AS DATE)) AS first_day,
           MAX(CAST(o_orderdate AS DATE)) AS last_day
    FROM orders GROUP BY 1
    """,
    category="warehouse/incremental",
    origin="EXT",
)
def agg_incremental_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ETL as re-aggregatable state: the historical partition
    set is aggregated once into per-group PARTIAL state (count / decimal
    sum / min / max — all associative), the new-arrivals delta aggregates
    independently, and the published answer is the MERGE of the two state
    tables — never a rescan of history. The oracle is the direct full
    aggregate, proving merge(state, delta) == agg(all): the algebraic
    property that lets a 100 TB pipeline maintain daily rollups by
    touching only the new partition. Decimal money makes the sum
    associative exactly (float partial sums would drift between the
    merged and direct forms); the merge agg runs on 2×|groups| rows.

    Plan: two pruned scans with the split predicate pushed down, two
    map-side-combinable exchanges, then the tiny state merge."""
    orders = load_table(spark, sf_dir, "orders")
    split = F.lit(INCR_SPLIT_DAY).cast("date")
    day = F.col("o_orderdate").cast("date")

    def partial(src: DataFrame) -> DataFrame:
        return src.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).alias("rev"),
            F.min(day).alias("first_day"),
            F.max(day).alias("last_day"),
        )

    # The two partitions must be a TOTAL cover of the table or the
    # merge-equals-direct invariant breaks: a NULL o_orderdate satisfies
    # neither `< split` nor `>= split` and silently vanished from both
    # (round-6 universe sweep). Undated rows are classified as history.
    state = partial(orders.filter((day < split) | day.isNull()))
    delta = partial(orders.filter(day >= split))
    return (
        state.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("rev").cast("string").alias("revenue_exact"),
            F.min("first_day").alias("first_day"),
            F.max("last_day").alias("last_day"),
        )
    )


# Columns profiled by profile_columns_summary — exact-typed only (ints,
# strings, dates): double columns are excluded because min/max STRING
# rendering of floats is engine-specific (Java switches to E-notation at
# 1e7; DuckDB never does), while int/string/date casts render identically.
PROFILE_COLS = (
    "l_orderkey",
    "l_suppkey",
    "l_linenumber",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
)


def _profile_val(c: str):
    # date-normalize the timestamp column so both engines render 'YYYY-MM-DD'
    col = F.col(c).cast("date") if c == "l_shipdate" else F.col(c)
    return col.cast("string")


@register(
    "profile_columns_summary",
    oracle="""
    WITH u AS (
      SELECT 'l_orderkey' AS col_name, CAST(l_orderkey AS VARCHAR) AS val FROM lineitem
      UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
      UNION ALL SELECT 'l_linenumber', CAST(l_linenumber AS VARCHAR) FROM lineitem
      UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem
      UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem
      UNION ALL SELECT 'l_shipdate', CAST(CAST(l_shipdate AS DATE) AS VARCHAR) FROM lineitem
    ),
    d AS (
      SELECT col_name, val, CAST(COUNT(*) AS BIGINT) AS cnt FROM u GROUP BY 1, 2
    )
    SELECT col_name,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(COALESCE(SUM(CASE WHEN val IS NULL THEN cnt END), 0) AS BIGINT)
             AS n_nulls,
           CAST(COUNT(val) AS BIGINT) AS n_distinct,
           MIN(val) AS min_val,
           MAX(val) AS max_val
    FROM d GROUP BY 1
    """,
    category="warehouse/profiling",
    origin="EXT",
)
def profile_columns_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling summary — per column: row count, null count, EXACT
    distinct count, lexicographic min/max — the table-health report every
    warehouse runs after ingest (and the stats a query planner or data
    catalog wants refreshed).

    Shape: unpivot the profiled columns to (col_name, val) rows JVM-side
    (stack — a generate, not a shuffle), then TWO-LEVEL distinct counting:
    first reduce to (col_name, val, cnt) — map-side combinable, the only
    event-volume exchange — then aggregate the distinct-value matrix per
    column. A direct COUNT(DISTINCT col) per column would either run one
    expand-heavy aggregate or funnel each column through a single reducer;
    the two-level form spreads every column's value space across the
    cluster and is how profiling survives a 10⁹-distinct-values column at
    100 TB. Lexicographic (binary-collation) min/max on the string cast is
    identical in both engines; doubles are deliberately out of scope
    (PROFILE_COLS note).

    Sibling: ``agg_distinct_count`` proves the same two-level trick on one
    column; this is the whole-table profiling consumer."""
    li = load_table(spark, sf_dir, "lineitem")
    stack_expr = F.expr(
        "stack({n}, ".format(n=len(PROFILE_COLS))
        + ", ".join(
            f"'{c}', _pv{i}" for i, c in enumerate(PROFILE_COLS)
        )
        + ") AS (col_name, val)"
    )
    u = li.select(
        *[_profile_val(c).alias(f"_pv{i}") for i, c in enumerate(PROFILE_COLS)]
    ).select(stack_expr)
    d = u.groupBy("col_name", "val").agg(F.count(F.lit(1)).alias("cnt"))
    return d.groupBy("col_name").agg(
        F.sum("cnt").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("val").isNull(), F.col("cnt"))), F.lit(0)
        ).alias("n_nulls"),
        F.count("val").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


BITMAP_WORD_BITS = 64  # one long per 64 consecutive user ids


@register(
    "agg_bitmap_distinct_segments",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    """,
    category="aggregation/bitmap",
    origin="EXT",
)
def agg_bitmap_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roaring-style bitmap distinct count: exact distinct users per
    segment via two-level bitmap aggregation — the re-aggregatable EXACT
    architecture beside the HLL sketch's approximate one (M6 item 8;
    expressible after all with public functions: bit ops + bit_or +
    bit_count).

    Level 1 maps each user to (word = floor(user_id / 64), bit) and ORs
    the one-hot longs per (segment, word) — a map-side-combinable
    aggregate whose partial states are 8-byte words, mergeable across
    shards/days exactly like the HLL registers but lossless. Level 2 sums
    ``bit_count`` over each segment's words. The oracle computes the same
    answer as a plain COUNT(DISTINCT): two algorithms, one value —
    a genuine cross-derivation, not an echo.

    NULL users contribute a NULL word/bit (aggregates skip them; an
    all-NULL segment yields a NULL level-1 word whose bit_count SUM is
    coalesced to 0 — COUNT(DISTINCT) semantics exactly). Negative ids are
    floor-divided (pmod bit + compensated word) so every long maps to a
    unique (word, bit). At 100 TB: two exchanges, both map-side combined;
    the level-1 key space is |segments| × |id-space|/64 — dense-id
    friendly. For sparse 64-bit id universes use
    :func:`bitmap_distinct_sparse` (the dictionary-pass variant below,
    landed round 9): same exact counts, one extra id exchange, word table
    bounded by the DISTINCT count instead of the id universe."""
    ev = load_table(spark, sf_dir, "events")
    return bitmap_distinct(ev, "event_type", "user_id").withColumnRenamed(
        "n_distinct", "n_users"
    )


def bitmap_distinct(df: DataFrame, seg_col: str, id_col: str) -> DataFrame:
    """Reusable two-level bitmap exact-distinct kernel: (seg, n_distinct)
    for any long id column — the library form the declared query wraps
    (and the hypothesis property suite drives on arbitrary in-memory
    frames against a Python set reference)."""
    # integer `div`, never `/`: double division would lose exactness above
    # 2^53 and this must hold for EVERY long id
    word = F.expr(
        f"({id_col} - pmod({id_col}, {BITMAP_WORD_BITS})) div {BITMAP_WORD_BITS}"
    )
    onehot = F.expr(
        f"shiftleft(cast(1 AS bigint),"
        f" cast(pmod({id_col}, {BITMAP_WORD_BITS}) AS int))"
    )
    words = (
        df.select(
            F.col(seg_col).alias("__seg"),
            word.alias("word"),
            onehot.alias("onehot"),
        )
        .groupBy("__seg", "word")
        .agg(F.bit_or("onehot").alias("bits"))
    )
    return (
        words.groupBy("__seg")
        .agg(
            F.coalesce(F.sum(F.bit_count("bits")), F.lit(0))
            .cast("long")
            .alias("n_distinct")
        )
        .withColumnRenamed("__seg", seg_col)
    )


# Bucket fan-out for the sparse-id dictionary pass: codes interleave as
# local_rank × P + bucket, so the code space is ≤ P × max-bucket-size —
# within a hash-skew factor of the true distinct count, NEVER the raw
# 64-bit id universe.
BITMAP_DICT_BUCKETS = 1 << 10


def bitmap_distinct_sparse(df: DataFrame, seg_col: str, id_col: str) -> DataFrame:
    """Dictionary-pass twin of :func:`bitmap_distinct` for SPARSE 64-bit id
    universes — the production caveat in the declared query's docstring,
    made concrete (M8 item 7, landed early as a library helper).

    The dense variant's level-1 key space is |segments| × |id-space|/64:
    exact for any ids, but a sparse universe (random 64-bit hashes, snowflake
    ids) explodes the word count to one word per ~1 id, destroying the
    compaction that makes bitmap partials cheap to merge. The fix is the
    classic dictionary pass: densify ids BEFORE the word pipeline.

    Dense codes come from a bucketed rank — ids hash into
    ``BITMAP_DICT_BUCKETS`` buckets, rank within each bucket (a
    high-cardinality window, ~n/P ids per bucket — bounded, never the
    global single-partition window the module's anti-pattern rules ban),
    code = rank × P + bucket. Codes are unique across buckets by
    construction and the code space is ≤ P × max-bucket-size ≈ distinct
    count × hash-skew — so the downstream word table is ~n/64 words
    regardless of how sparse the raw universe is. Cost: one extra id-keyed
    exchange (the distinct) — the explicit trade the docstring caveat
    promised. Counts are EXACT either way; property-tested against the
    dense variant and a Python set reference on ±2^62 ids."""
    ids = (
        df.select(F.col(id_col).alias("__id"))
        .where(F.col("__id").isNotNull())
        .distinct()
    )
    bucket = F.pmod(F.xxhash64("__id"), F.lit(BITMAP_DICT_BUCKETS)).cast("long")
    w = W.partitionBy(bucket).orderBy("__id")
    dic = ids.select(
        "__id",
        (
            (F.row_number().over(w).cast("long") - 1) * BITMAP_DICT_BUCKETS
            + bucket
        ).alias("__code"),
    )
    # LEFT join: rows with NULL ids keep a NULL code, so an all-NULL
    # segment still emits its n_distinct = 0 row — exact parity with the
    # dense variant's COUNT(DISTINCT) semantics
    coded = df.join(dic, df[id_col] == dic["__id"], "left").select(
        F.col(seg_col).alias("__seg0"), "__code"
    )
    return (
        bitmap_distinct(coded, "__seg0", "__code")
        .withColumnRenamed("__seg0", seg_col)
    )


THETA_BOUND = 0.05  # |estimate − exact| ≤ 5%·exact + 1 (lgK=12 ⇒ ~1.6% rse)


@register(
    "agg_theta_sketch_setops",
    oracle="""
    WITH ut AS (
      SELECT DISTINCT event_type AS t, user_id AS u FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    ),
    nd AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM ut GROUP BY t),
    inter AS (
      SELECT x.t AS ta, y.t AS tb, CAST(COUNT(*) AS BIGINT) AS ni
      FROM ut x JOIN ut y ON x.u = y.u AND x.t < y.t
      GROUP BY x.t, y.t
    )
    SELECT a.t AS seg_a, b.t AS seg_b,
           CAST(a.n + b.n - COALESCE(i.ni, 0) AS BIGINT) AS n_union_exact,
           CAST(COALESCE(i.ni, 0) AS BIGINT) AS n_intersect_exact,
           CAST(a.n - COALESCE(i.ni, 0) AS BIGINT) AS n_diff_exact,
           TRUE AS union_ok, TRUE AS intersect_ok, TRUE AS diff_ok
    FROM nd a JOIN nd b ON a.t < b.t
    LEFT JOIN inter i ON i.ta = a.t AND i.tb = b.t
    """,
    category="aggregation/sketch",
    origin="EXT",
)
def agg_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-overlap distinct counting via Theta sketches — the set
    operation HLL cannot do: HLL unions losslessly but has NO
    intersection/difference, so 'users in segment A ∩ B' at 100 TB is
    either a full re-scan per pair or a Theta sketch per segment
    (Datasketches `theta_sketch_agg` + scalar `theta_union` /
    `theta_intersection` / `theta_difference` — all public Spark 4
    functions). One sketch per segment, every pairwise union /
    intersection / difference estimated sketch-vs-sketch with NO second
    pass over the data.

    Declared output is the invariant (agg_hll_shard_merge precedent):
    exact pairwise distinct counts, hash-checked, plus per-set-op
    booleans asserting the sketch estimate lands within
    ``THETA_BOUND``·n_union + 1. The bound is stated against the UNION
    cardinality for ALL three ops — the honest Datasketches error
    model: past exact mode a set-op estimate's absolute error scales
    with the surviving-sample population (the input sketches' theta ≈
    union scale), NOT with the result size, so a 173-row difference of
    two 10k-user segments legitimately carries union-scale noise (the
    beyond-exact-mode fixture in tests/test_sketch_bounds.py caught a
    result-relative bound failing exactly there). Below 4096 distinct
    the sketches are exact and the bound is trivially met; the +1
    absorbs zero-cardinality ops. The oracle emits literal TRUE; a
    broken sketch set-op hash-mismatches.

    Plan: sketches build in ONE segment-keyed aggregate (map-side
    combinable); the exact side is one distinct + one user-keyed
    self-join — the very cost the sketches exist to replace, kept here
    because it IS the grading oracle (HLL-query precedent). The 10-row
    pair frame assembles via broadcast joins; every set-op estimate is a
    scalar expression over two ≤4 KB sketch blobs."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
    )
    ut = ev.select(F.col("event_type").alias("t"), F.col("user_id").alias("u")).distinct()

    # sketch agg and exact distinct agg kept SEPARATE (the 37× Expand
    # lesson on agg_approx_distinct): sketches from raw rows, exact from ut
    sk = ev.groupBy(F.col("event_type").alias("t")).agg(
        F.expr("theta_sketch_agg(user_id)").alias("sk")
    )
    nd = ut.groupBy("t").agg(F.count(F.lit(1)).alias("n"))

    inter = (
        ut.alias("x")
        .join(ut.alias("y"), (F.col("x.u") == F.col("y.u")) & (F.col("x.t") < F.col("y.t")))
        .groupBy(F.col("x.t").alias("ta"), F.col("y.t").alias("tb"))
        .agg(F.count(F.lit(1)).alias("ni"))
    )

    nds = nd.join(sk, "t")  # ONE subtree, selected twice — never built twice
    a = nds.select(
        F.col("t").alias("seg_a"), F.col("n").alias("n_a"), F.col("sk").alias("sk_a")
    )
    b = nds.select(
        F.col("t").alias("seg_b"), F.col("n").alias("n_b"), F.col("sk").alias("sk_b")
    )
    pairs = (
        a.join(F.broadcast(b), F.col("seg_a") < F.col("seg_b"))
        .join(
            F.broadcast(inter),
            (F.col("ta") == F.col("seg_a")) & (F.col("tb") == F.col("seg_b")),
            "left",
        )
        .withColumn("ni0", F.coalesce(F.col("ni"), F.lit(0)))
    )

    u_est = F.expr("theta_sketch_estimate(theta_union(sk_a, sk_b))")
    i_est = F.expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))")
    d_est = F.expr("theta_sketch_estimate(theta_difference(sk_a, sk_b))")
    n_union = (F.col("n_a") + F.col("n_b") - F.col("ni0")).cast("long")
    n_inter = F.col("ni0").cast("long")
    n_diff = (F.col("n_a") - F.col("ni0")).cast("long")
    return pairs.select(
        "seg_a",
        "seg_b",
        n_union.alias("n_union_exact"),
        n_inter.alias("n_intersect_exact"),
        n_diff.alias("n_diff_exact"),
        (F.abs(u_est - n_union) <= THETA_BOUND * n_union + F.lit(1)).alias("union_ok"),
        (F.abs(i_est - n_inter) <= THETA_BOUND * n_union + F.lit(1)).alias("intersect_ok"),
        (F.abs(d_est - n_diff) <= THETA_BOUND * n_union + F.lit(1)).alias("diff_ok"),
    )


@register(
    "agg_bitmap_distinct_sparse",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    """,
    category="aggregation/bitmap",
    origin="EXT",
)
def agg_bitmap_distinct_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-pass bitmap distinct over a SPARSE 64-bit id universe —
    the declared form of :func:`bitmap_distinct_sparse` (round-8 verdict
    carry-over: the dense query's docstring caveat, now a graded
    capability). To exercise sparsity on the dense fixture ids, each
    user_id is spread across the full 64-bit space via xxhash64 FIRST
    (NULLs preserved explicitly — xxhash64 itself never returns NULL) —
    the sparsification DEVICE for grading; production feeds snowflake ids
    or content hashes directly. The dictionary pass then densifies via
    bucketed rank and runs the same two-level bit_or/bit_count pipeline,
    so the word table is bounded by the DISTINCT count, not the id range.

    The oracle counts DISTINCT raw user_ids: equality proves the hash
    spread, the bucketed-rank dictionary, the NULL-preserving LEFT join,
    and the word pipeline all composed losslessly (injective on the
    observed ids; a 64-bit collision would shrink the count and
    hash-mismatch — probability ~n²/2⁶⁴, zero at any grading scale, and
    the docstring's production form has no hash step at all).

    At 100 TB: one id-keyed distinct exchange + bounded per-bucket rank
    windows (never a global window), then the dictionary join and the
    same map-side-combinable word aggregates as the dense twin."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("user_id").isNotNull(), F.xxhash64("user_id")).alias(
            "uid_sparse"
        ),
    )
    return bitmap_distinct_sparse(ev, "event_type", "uid_sparse").withColumnRenamed(
        "n_distinct", "n_users"
    )
