"""SQL-facing API surface: declared queries expressed as ``spark.sql`` text
over registered views (SURVEY.md §1.5 — the engine exposes BOTH the
DataFrame API and plain SQL; ``cli.py repl`` is the interactive form, these
are the graded form).

Catalyst compiles SQL text and DataFrame calls to the same logical plans,
so these also pin that parity: the physical shapes (broadcasts, single
shuffles) asserted for the DataFrame queries hold here too. The oracle SQL
is deliberately near-identical text — the dialect differences (decimal
casts, date literals) are the honest part of the exercise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from transf_spark.functions.exprs import SQL_DISC_PRICE, sql_dsum_raw
from transf_spark.queries import register
from transf_spark.sources.tables import register_views

_Q3_CUTOFF = "TIMESTAMP '1998-01-01 00:00:00'"


@register(
    "sql_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum_raw(SQL_DISC_PRICE, "revenue")},
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < {_Q3_CUTOFF}
      AND l_shipdate > {_Q3_CUTOFF}
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    category="sql-api",
    origin="EXT",
)
def sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape through the SQL entry point: top-10 pending-shipment
    orders by decimal-exact revenue. Plan shape: customer broadcasts into
    orders, one shuffle join to lineitem, single aggregate, then TakeOrdered
    (limit pushed into the sort — no global sort materializes). The ORDER BY
    carries a unique l_orderkey tiebreak so the LIMIT cut is deterministic
    on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
               o_orderdate
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < {_Q3_CUTOFF}
          AND l_shipdate > {_Q3_CUTOFF}
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
        """
    )


@register(
    "sql_exists_late_orders",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    category="sql-api",
    origin="EXT",
)
def sql_exists_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS through the SQL entry point —
    Catalyst rewrites the subquery to a left-semi join on l_orderkey, the
    shape asserted for ``join_left_semi_anti``. Counts 1996 orders with at
    least one lineitem shipped >60 days after ordering, per priority."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
        """
    )


@register(
    "sql_grouping_sets",
    oracle="""
    SELECT n_name, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
           CAST(GROUPING(n_name) AS INT) AS g_nation,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (o_orderstatus), (n_name, o_orderstatus))
    """,
    category="sql-api",
    origin="EXT",
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL entry point — the irregular
    multi-level aggregate rollup/cube can't express (exactly three levels:
    by nation, by status, by both; no grand total). GROUPING() flags
    disambiguate real NULLs from subtotal rows, same device as
    ``agg_rollup_cube``. One pass over the joined fact side: Spark expands
    the grouping sets before the exchange, so partial aggregation still
    combines map-side — the same single-fact-shuffle shape as a plain
    groupBy at 100 TB."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name, o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
               CAST(GROUPING(n_name) AS INT) AS g_nation,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name), (o_orderstatus), (n_name, o_orderstatus))
        """
    )


_Q5_SQL = """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate < DATE '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
"""


@register(
    "sql_nation_revenue",
    oracle=_Q5_SQL,
    category="sql-api",
    origin="EXT",
)
def sql_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume) through the SQL entry point:
    revenue per nation where the customer and the supplier share a nation
    in one region, over one order year — the 6-table join that exercises
    Catalyst's join reordering. The oracle is the IDENTICAL text (both
    dialects accept the DATE literal). Plan shape at scale: the dimension chain
    (region→nation→supplier, customer) broadcasts down into the
    orders⋈lineitem fact join; the date predicate is pushed into the
    orders scan so the fact shuffle carries one year, not seven; revenue
    accumulates as exact decimals with a single final double cast. The
    ORDER BY runs over the ≤|nations| aggregate — never the fact table."""
    register_views(spark, sf_dir)
    return spark.sql(_Q5_SQL)


_ABOVE_AVG_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE CAST(o_totalprice AS DECIMAL(12,2)) * 2
            * (SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
          > 3 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                 FROM orders i WHERE i.o_custkey = o.o_custkey)
"""


@register(
    "sql_above_customer_avg",
    oracle=_ABOVE_AVG_SQL,
    category="sql-api",
    origin="EXT",
)
def sql_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated SCALAR subqueries through the SQL entry point — the
    decorrelation capability beside sql_exists_late_orders' EXISTS
    rewrite: orders priced above 1.5× their own customer's average,
    stated as two correlated aggregates that Catalyst must decorrelate
    into per-customer aggregation + join (never a per-row re-scan).
    IDENTICAL text on both engines. The 1.5×avg predicate is
    cross-multiplied into exact decimal/integer arithmetic
    (price·2·n > 3·Σprice) so no float-summation-order boundary can
    flip a row between engines — the same reason money aggregates use
    decimals everywhere else.

    Plan at scale: one o_custkey aggregate over orders, AQE-joined back
    on the same key — plan-gated to at most the two aggregate exchanges
    plus the join, with no nested-loop re-execution."""
    register_views(spark, sf_dir)
    return spark.sql(_ABOVE_AVG_SQL)


# Recursive-CTE hierarchy: the customer key space forms a synthetic binary
# tree (parent(k) = k div 2, root k=1) — deterministic, derived purely from
# the fixture's key column, and deep enough (log₂|customers|) to exercise
# real multi-round recursion in both engines.
_RECURSIVE_SPARK_SQL = """
    WITH RECURSIVE tree(custkey, depth) AS (
      SELECT c_custkey, CAST(0 AS BIGINT) FROM customer WHERE c_custkey = 1
      UNION ALL
      SELECT c.c_custkey, t.depth + CAST(1 AS BIGINT)
      FROM customer c JOIN tree t ON c.c_custkey DIV 2 = t.custkey
    )
    SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           MIN(custkey) AS min_key, MAX(custkey) AS max_key
    FROM tree GROUP BY depth
"""

_RECURSIVE_DUCK_SQL = """
    WITH RECURSIVE tree(custkey, depth) AS (
      SELECT c_custkey, CAST(0 AS BIGINT) FROM customer WHERE c_custkey = 1
      UNION ALL
      SELECT c.c_custkey, t.depth + CAST(1 AS BIGINT)
      FROM customer c JOIN tree t ON c.c_custkey // 2 = t.custkey
    )
    SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           MIN(custkey) AS min_key, MAX(custkey) AS max_key
    FROM tree GROUP BY depth
"""


@register(
    "sql_recursive_hierarchy",
    oracle=_RECURSIVE_DUCK_SQL,
    category="sql-api/recursive",
    origin="EXT",
)
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE through the SQL entry point (Spark 4's recursive CTE
    support) — hierarchy traversal, the org-chart/BOM/graph-reachability
    shape that pre-4.x Spark forced into a driver-side loop (the engine's
    own ``dedup_cluster_cc`` is exactly such a loop). The customer key
    space is walked as a binary tree (parent = key div 2) from root 1,
    emitting node count and key range per depth level.

    The SQL text differs between engines only in the integer-division
    operator (Spark ``DIV``, DuckDB ``//``) — structure and arithmetic are
    identical, all integer-exact.

    Plan at scale: each recursion level is ONE equi-join of the frontier
    against the child table — Catalyst plans every level hash-partitioned
    (AQE broadcasts the frontier while it's small), and the number of
    rounds is the hierarchy DEPTH (log₂ n here, ~20 for 10⁹ keys), not its
    size — the same rounds-bounded-by-diameter argument as the
    pointer-jumping connected-components loop, but stated declaratively
    so the engine owns frontier materialization."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SPARK_SQL)


# TPC-H Q14 shape (promo-revenue ratio), per ship month of 1996. The ratio
# is stated as exact-decimal sums cast to DOUBLE, then ONE multiply and ONE
# divide in the same textual order on both engines — a float ratio computed
# from deterministic operands is itself deterministic. The CASE guard keeps
# a zero total from producing 0/0: DuckDB >= 1.1 yields NaN there (which
# sorts ABOVE real values), Spark ANSI-off yields NULL — the dialect
# divergence class from the round-5 hardening list.
_PROMO_SQL = """
    SELECT date_trunc('month', l_shipdate) AS ship_month,
           COALESCE(CAST(SUM(CASE WHEN p_type = 'PROMO'
                                  THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                       * (1 - CAST(l_discount AS DECIMAL(12,2)))
                             END) AS DOUBLE), 0.0) AS promo_rev,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS total_rev,
           CASE WHEN CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                             * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) = 0.0
                THEN 0.0
                ELSE 100.0 * COALESCE(CAST(SUM(CASE WHEN p_type = 'PROMO'
                                  THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                       * (1 - CAST(l_discount AS DECIMAL(12,2)))
                             END) AS DOUBLE), 0.0)
                     / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
           END AS promo_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
    GROUP BY date_trunc('month', l_shipdate)
"""


@register(
    "sql_promo_revenue",
    oracle=_PROMO_SQL,
    category="sql-api",
    origin="EXT",
)
def sql_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion-revenue share) through the SQL entry
    point: per ship month of 1996, the percentage of discounted revenue
    earned by PROMO-class parts — the conditional-aggregate-ratio form
    (SUM(CASE)/SUM) that Catalyst folds into ONE aggregate pass, not two.
    IDENTICAL text on both engines.

    Plan at scale: part (the dimension) broadcasts into the lineitem scan
    — no fact shuffle for the join; the ship-date predicate is pushed to
    the parquet scan so only the target year is read; both conditional
    and total sums accumulate in the SAME map-side partial aggregate
    (one exchange on the 12-row month key). Decimal-exact sums, one
    final double multiply/divide per group."""
    register_views(spark, sf_dir)
    return spark.sql(_PROMO_SQL)


# TPC-H Q16 shape restated on the available tables (the fixture has no
# partsupp): supplier variety per part class, excluding flagged suppliers
# via NOT IN — deliberately NOT rewritten to NOT EXISTS/left_anti, because
# the point is Catalyst's null-aware anti join (the one decorrelation form
# the board doesn't otherwise exercise). Both engines implement identical
# three-valued NOT IN semantics, so the texts can be identical too;
# s_acctbal < 0 plays the "customer complaints" exclusion class.
_PARTS_SUPPLIER_SQL = """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
"""


@register(
    "sql_parts_supplier_notin",
    oracle=_PARTS_SUPPLIER_SQL,
    category="sql-api",
    origin="EXT",
)
def sql_parts_supplier_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    class, excluding suppliers flagged by a NOT IN subquery. NOT IN is the
    three-valued-logic trap of SQL (one NULL in the subquery empties the
    result) — Catalyst compiles it to a broadcast NULL-AWARE anti join
    rather than a plain left_anti, and this query pins that plan shape.

    Plan at scale: the flagged-supplier list is a tiny aggregate —
    broadcast null-aware anti join against the lineitem scan (map-side,
    no fact shuffle); part broadcasts likewise; the only exchange is the
    COUNT(DISTINCT) on the ~|brand×type×size| grouped key space."""
    register_views(spark, sf_dir)
    return spark.sql(_PARTS_SUPPLIER_SQL)


# TPC-H Q15 shape: quarterly per-supplier revenue CTE reused against its
# own global MAX. Revenue stays DECIMAL through the MAX-equality cut (an
# exact comparison — a double round-trip could admit/expel ties), and is
# cast to double only in the final projection.
_TOP_SUPPLIER_SQL = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_revenue_raw
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_revenue_raw AS DOUBLE) AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue_raw = (SELECT MAX(total_revenue_raw) FROM revenue)
"""


@register(
    "sql_top_supplier",
    oracle=_TOP_SUPPLIER_SQL,
    category="sql-api",
    origin="EXT",
)
def sql_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier) through the SQL entry point: a
    quarterly revenue CTE consumed twice — once as the join input, once
    reduced to its global MAX inside a scalar subquery. IDENTICAL text on
    both engines; the equality cut compares DECIMALS, so ties are exact
    and the result set is deterministic without an ORDER BY.

    Plan at scale: ONE shuffle builds the per-supplier aggregate (the
    date filter is pushed to the scan, so a quarter — not seven years —
    shuffles); the scalar MAX reduces that aggregate to one broadcast
    row; supplier (dimension) broadcasts into the equality-filtered CTE.
    Catalyst may re-derive the CTE per consumer — both derivations are
    the same single-exchange aggregate, and AQE reuses the shuffle."""
    register_views(spark, sf_dir)
    return spark.sql(_TOP_SUPPLIER_SQL)


# TPC-H Q13 shape: the orders-per-customer histogram. The filter lives in
# the JOIN CONDITION, not the WHERE — Q13's whole point: a WHERE would
# turn the left join inner and silently drop zero-order customers from the
# c_count = 0 bucket. COUNT(o_orderkey) (not COUNT(*)) counts only matched
# rows, so unmatched customers contribute 0, not 1. IDENTICAL text on both
# engines; counts are exact ints, the only typing care is DuckDB's
# COUNT → HUGEINT (cast to BIGINT, comparator contract).
_CUSTOMER_DISTRIBUTION_SQL = """
    SELECT c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey,
             CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
"""


@register(
    "sql_customer_distribution",
    oracle=_CUSTOMER_DISTRIBUTION_SQL,
    category="sql-api",
    origin="EXT",
)
def sql_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    JOIN with the predicate in the ON clause, double aggregation
    (per-customer count, then histogram of counts).

    Plan at scale: orders shuffles on o_custkey once (the join and the
    first groupBy share the key, so Catalyst reuses the exchange for the
    partial count); the second aggregate runs on the tiny distinct-count
    domain (≤ max orders per customer, ~30 keys) — map-side partials
    collapse it before the final 30-row exchange. The o_orderpriority
    filter is pushed to the orders scan even though it sits in the ON
    clause (it references only the right side of a left join)."""
    register_views(spark, sf_dir)
    return spark.sql(_CUSTOMER_DISTRIBUTION_SQL)


# TPC-H Q7 shape: bilateral shipping volume between two nations by year.
_VOLUME_SHIPPING_SQL = f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_dsum_raw("volume", "revenue")}
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
             {SQL_DISC_PRICE} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_11')
          OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_9'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
"""


@register(
    "sql_volume_shipping",
    oracle=_VOLUME_SHIPPING_SQL,
    category="sql-api",
    origin="EXT",
)
def sql_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue between two trading
    nations per shipment year, both directions kept distinct — the
    6-table star-with-two-dimension-roles join (nation joined TWICE under
    different aliases). IDENTICAL text on both engines; decimal-exact
    revenue; EXTRACT(YEAR) cast to INT on both (DuckDB returns BIGINT).

    Plan at scale: the ship-date range is pushed to the lineitem scan (2
    of 7 years read); supplier, customer, and both nation roles are
    dimensions — all broadcast, so the ONLY fact shuffle is the
    lineitem⋈orders key. The nation-pair filter prunes both dimension
    broadcasts to ~1/20 before they ship. Group-by domain is 8 rows
    (2 directions × 2-4 years) — map-side partials collapse everything."""
    register_views(spark, sf_dir)
    return spark.sql(_VOLUME_SHIPPING_SQL)


# TPC-H Q17 shape: small-quantity-order revenue, the correlated scalar
# subquery Catalyst must decorrelate into an aggregate+join. l_quantity
# values are INTEGERS stored as doubles (fixture-checked), so AVG is a
# ratio of exactly-representable sums — identical in both engines
# regardless of summation order, making the 0.2·avg threshold compare
# deterministic (the round-5 float-boundary checklist).
_AVG_YEARLY_SQL = f"""
    SELECT p_brand,
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand IN ('Brand#3', 'Brand#14', 'Brand#25')
      AND l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    GROUP BY p_brand
"""


@register(
    "sql_avg_yearly",
    oracle=_AVG_YEARLY_SQL,
    category="sql-api",
    origin="EXT",
)
def sql_avg_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): per brand, the
    yearly-averaged revenue of lineitems whose quantity is below 20% of
    that PART's average quantity — the correlated scalar subquery form.
    IDENTICAL text on both engines.

    Plan at scale: Catalyst decorrelates the subquery into a per-partkey
    AVG aggregate joined back on p_partkey — no per-row subquery
    execution. The brand filter broadcasts the pruned part dimension into
    both the fact scan and the decorrelated aggregate; the per-part
    average shuffles lineitem on l_partkey ONCE (the same key the verify
    join uses, so AQE co-locates). Decimal-exact revenue; the /7.0 is a
    constant double divide applied identically per group."""
    register_views(spark, sf_dir)
    return spark.sql(_AVG_YEARLY_SQL)


# TPC-H Q21 shape restated on the available columns: the fixture has no
# l_commitdate/l_receiptdate, so "late" is l_shipdate > o_orderdate + 90
# days. The inner EXISTS/NOT EXISTS correlate ONLY on the equality
# l_orderkey = l1.l_orderkey (the lateness test joins orders INSIDE the
# subquery instead of referencing the outer o_orderdate — Spark's
# decorrelation accepts equality correlation; an outer non-equi reference
# would not decorrelate).
_SUPPLIERS_WAITING_SQL = """
    SELECT s_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders     ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1
        FROM lineitem l3
        JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s_name
"""


@register(
    "sql_suppliers_waiting",
    oracle=_SUPPLIERS_WAITING_SQL,
    category="sql-api",
    origin="EXT",
)
def sql_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): count, per
    supplier, the finished multi-supplier orders where ONLY that supplier
    shipped late — the EXISTS + NOT EXISTS double-correlation form, the
    hardest decorrelation on the board. IDENTICAL text on both engines.

    Plan at scale: both subqueries decorrelate into aggregates/semi-joins
    keyed on l_orderkey — the SAME key the outer lineitem⋈orders join
    shuffles on, so the three legs co-partition and AQE reuses the
    exchange. EXISTS becomes a left-semi, NOT EXISTS a left-anti; neither
    carries NULL-key hazards (l_orderkey is non-null by construction).
    supplier is a broadcast dimension; the final aggregate's domain is
    ≤ |supplier| rows."""
    register_views(spark, sf_dir)
    return spark.sql(_SUPPLIERS_WAITING_SQL)


# TPC-H Q22 shape restated: no c_phone country codes in the fixture, so
# the "acquirable customers" cohort keys on nation instead. The positive-
# balance average is computed as exact-decimal SUM / COUNT (DuckDB's
# AVG(DECIMAL) returns DOUBLE, but SUM(DECIMAL) is exact in both engines,
# so the division operands — and therefore the threshold — are bit-
# identical). NOT EXISTS (not NOT IN): o_custkey is non-null, but the
# anti-join form sidesteps three-valued NULL semantics by construction.
_LOST_CUSTOMERS_SQL = """
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(*)
        FROM customer c2
        WHERE c2.c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c_nationkey
"""


@register(
    "sql_lost_customers",
    oracle=_LOST_CUSTOMERS_SQL,
    category="sql-api",
    origin="EXT",
)
def sql_lost_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): per nation, the
    above-average-balance customers with no recent orders — an
    uncorrelated scalar subquery (the balance threshold) combined with a
    correlated NOT EXISTS (the dormancy test). IDENTICAL text on both
    engines.

    Plan at scale: the scalar subquery is ONE map-side-combinable
    aggregate broadcast as a literal into the customer scan's filter; the
    NOT EXISTS becomes a left-anti join against the date-pruned orders
    projection (the o_orderdate predicate pushes to the scan, so only
    the recent slice shuffles); the final aggregate's domain is ≤ 25
    nations. No fact-table window, no correlated re-execution."""
    register_views(spark, sf_dir)
    return spark.sql(_LOST_CUSTOMERS_SQL)


# TPC-H Q8 shape restated on the fixture's vocabulary (r_name regions are
# real; nations are NATION_N; p_type classes replace the three-token TPC-H
# types). The market-share ratio divides two exact-decimal sums CAST TO
# DOUBLE FIRST — decimal division scale rules differ between engines, but
# double division of identical doubles is IEEE-identical; NULLIF guards the
# all-zero-volume group a degenerate fixture can produce (Spark's non-ANSI
# x/0 → NULL vs DuckDB's inf would otherwise diverge). EXTRACT(YEAR) is
# cast to INT on both (DuckDB returns BIGINT).
_MARKET_SHARE_SQL = f"""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN nation = 'NATION_9' THEN volume
                              ELSE CAST(0.00 AS DECIMAL(12,2)) END) AS DOUBLE)
                / NULLIF(CAST(SUM(volume) AS DOUBLE), 0.0) AS DOUBLE)
             AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             {SQL_DISC_PRICE} AS volume,
             n2.n_name AS nation
      FROM lineitem
      JOIN part      ON p_partkey = l_partkey
      JOIN orders    ON l_orderkey = o_orderkey
      JOIN customer  ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN supplier  ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
        AND p_type = 'MEDIUM'
    ) all_nations
    GROUP BY o_year
"""


@register(
    "sql_market_share",
    oracle=_MARKET_SHARE_SQL,
    category="sql-api",
    origin="EXT",
)
def sql_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one supplier nation's share
    of a region's revenue for a part class, per order year — the
    conditional-ratio aggregate over the 8-table join with nation in TWO
    roles (customer-side region membership via n1, supplier-side share
    attribution via n2). IDENTICAL text on both engines.

    Plan at scale: part/customer/nation×2/region/supplier are all
    dimensions — every one broadcasts, so the ONLY fact shuffle is
    lineitem⋈orders on the order key; the r_name and p_type equality
    predicates prune the region and part broadcasts BEFORE they ship
    (dynamic filters then prune the fact scan). The conditional numerator
    and the denominator ride ONE aggregate over a ≤7-row year domain —
    map-side partials collapse everything before the final exchange."""
    register_views(spark, sf_dir)
    return spark.sql(_MARKET_SHARE_SQL)


# TPC-H Q18 shape: l_quantity values are INTEGERS stored as doubles
# (fixture-checked), so the per-order SUM is exact at any summation order
# and the > 300 threshold compare is deterministic — the same device as
# the Q17 analog's 0.2·avg threshold.
_LARGE_ORDERS_SQL = """
    SELECT c_name,
           c_custkey,
           o_orderkey,
           o_orderdate,
           o_totalprice,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 300.0
      )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
"""


@register(
    "sql_large_orders",
    oracle=_LARGE_ORDERS_SQL,
    category="sql-api",
    origin="EXT",
)
def sql_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose summed
    lineitem quantity clears a threshold, with their customer — the
    HAVING-subquery semi-join form (the one decorrelation shape the board
    didn't cover: an IN over a grouped-HAVING derived set). IDENTICAL
    text on both engines.

    Plan at scale: the IN-subquery decorrelates to a semi-join against
    the per-order quantity aggregate — keyed on l_orderkey, the SAME key
    the outer lineitem⋈orders join shuffles on, so the two legs
    co-partition and AQE reuses the exchange; the qualifying-order set
    (selectivity ~0.3% at threshold 300) then drives a highly selective
    join. customer is a broadcast dimension; the final aggregate groups
    on the already-co-partitioned order key."""
    register_views(spark, sf_dir)
    return spark.sql(_LARGE_ORDERS_SQL)


# TPC-H Q19 shape on the fixture vocabulary: three brand/quantity/size
# arms OR'd together. Revenue is the module's decimal-exact device cast to
# double AFTER the exact sum; l_quantity/p_size are integral so every
# bracket compare is exact.
_DISCOUNT_BRACKETS_SQL = f"""
    SELECT CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#3'
           AND l_quantity BETWEEN 1 AND 11
           AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#14'
           AND l_quantity BETWEEN 10 AND 20
           AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#25'
           AND l_quantity BETWEEN 20 AND 30
           AND p_size BETWEEN 1 AND 15)
"""


@register(
    "sql_discount_brackets",
    oracle=_DISCOUNT_BRACKETS_SQL,
    category="sql-api",
    origin="EXT",
)
def sql_discount_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue brackets): revenue from
    lineitems matching any of three brand × quantity-bracket ×
    size-bracket arms — the OR-of-ANDs predicate that exercises CNF
    conversion and partial pushdown. IDENTICAL text on both engines.

    Plan at scale: Catalyst distributes the disjunction — the common
    join key stays an equi-join with part BROADCAST, the brand∈{...}
    union and the quantity envelope (1..30) are pushable supersets, and
    the per-arm residual evaluates post-join in codegen. One broadcast
    join, one 1-row aggregate: the fact table is scanned once with the
    quantity range pushed down."""
    register_views(spark, sf_dir)
    return spark.sql(_DISCOUNT_BRACKETS_SQL)


# TPC-H Q9 shape restated on the available tables (no partsupp fixture:
# part cost = p_retailprice · l_quantity). Profit is a DIFFERENCE of two
# exact-decimal products summed together — decimal precision/scale widening
# rules differ between engines, but both sums are exact and the single
# final double cast is applied to identical values. GROUP BY uses the
# output aliases (both engines resolve them; Spark via the default
# spark.sql.groupByAliases).
_PRODUCT_PROFIT_SQL = """
    SELECT n_name AS supp_nation,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))
                    - CAST(p_retailprice AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%r%'
    GROUP BY supp_nation, o_year
"""


@register(
    "sql_product_profit",
    oracle=_PRODUCT_PROFIT_SQL,
    category="sql-api",
    origin="EXT",
)
def sql_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit measure): profit per supplier
    nation per order year for parts whose name matches a pattern — the
    profit-decomposition join (revenue minus cost attributed up the
    supplier dimension), a top-5 warehouse shape the board lacked.
    IDENTICAL text on both engines; cost restates Q9's
    ps_supplycost·l_quantity as p_retailprice·l_quantity (the fixture has
    no partsupp), keeping the exact-decimal sum-of-differences form.

    Plan at scale: part (name-filtered BEFORE it ships), supplier, and
    nation are broadcast dimensions; the ONLY fact shuffle is
    lineitem⋈orders on the order key. The LIKE predicate prunes the part
    broadcast to a fraction and dynamic filtering prunes the fact scan
    behind it; profit accumulates in ONE map-side-combinable decimal
    aggregate over the ≤|nations|×|years| (~175) group domain."""
    register_views(spark, sf_dir)
    return spark.sql(_PRODUCT_PROFIT_SQL)


# TPC-H Q10 shape: returned-item revenue per customer for one quarter,
# top 20. Revenue is the exact-decimal device; the ORDER BY carries the
# unique c_custkey tiebreak so the LIMIT cut is deterministic on both
# engines even under revenue ties. c_acctbal is emitted (and grouped) as
# the stored double — no arithmetic touches it.
_RETURNED_CUSTOMERS_SQL = """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS revenue,
           CAST(c_acctbal AS DOUBLE) AS acctbal,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1996-07-01'
      AND o_orderdate < DATE '1996-10-01'
      AND l_returnflag = 'R'
      AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


@register(
    "sql_returned_customers",
    oracle=_RETURNED_CUSTOMERS_SQL,
    category="sql-api",
    origin="EXT",
)
def sql_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): the top-20 customers by
    revenue lost to returned items in one quarter, with their nation — the
    single most common BI query shape (revenue top-k over a flagged fact
    slice) the board lacked. IDENTICAL text on both engines. The explicit
    NOT NULL guards keep a degenerate all-NULL-price group from producing
    a NULL revenue — Spark and DuckDB disagree on where NULLs sort under
    DESC, so a NULL revenue inside the top-20 cut would split the engines
    (the round-5/6 NULL-ordering divergence class, handled at the source).

    Plan at scale: the o_orderdate quarter predicate is pushed to the
    orders scan (one quarter of seven years read); customer and nation
    broadcast; the fact shuffle is lineitem⋈orders on the order key, then
    ONE c_custkey aggregate; the ORDER BY runs over the aggregate domain
    (≤|customers with returns in the quarter|) as a TakeOrdered(20) — no
    global sort materializes."""
    register_views(spark, sf_dir)
    return spark.sql(_RETURNED_CUSTOMERS_SQL)


# TPC-H Q11 shape restated (no partsupp: part value = p_retailprice ·
# l_quantity over one nation's suppliers' lineitems). The HAVING threshold
# is CROSS-MULTIPLIED (SUM·1000 > total) so both sides stay exact decimals
# — a 0.001·total double product could flip a boundary part between
# engines. The nation key arrives via an uncorrelated scalar subquery, the
# total via a second one over the SAME filtered join — the correlated/
# uncorrelated scalar-subquery pair Q11 exists to exercise.
_IMPORTANT_STOCK_SQL = """
    SELECT p_partkey,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))
                    * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             AS part_value
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE s_nationkey = (SELECT n_nationkey FROM nation
                         WHERE n_name = 'NATION_9')
    GROUP BY p_partkey
    HAVING SUM(CAST(p_retailprice AS DECIMAL(12,2))
               * CAST(l_quantity AS DECIMAL(12,2))) * 1000 >
      (SELECT SUM(CAST(p_retailprice AS DECIMAL(12,2))
                  * CAST(l_quantity AS DECIMAL(12,2)))
       FROM lineitem
       JOIN part     ON p_partkey = l_partkey
       JOIN supplier ON s_suppkey = l_suppkey
       WHERE s_nationkey = (SELECT n_nationkey FROM nation
                            WHERE n_name = 'NATION_9'))
"""


@register(
    "sql_important_stock",
    oracle=_IMPORTANT_STOCK_SQL,
    category="sql-api",
    origin="EXT",
)
def sql_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): parts holding
    more than 0.1% of one nation's total lineitem value — the
    value-share-HAVING-over-a-scalar-subquery-total form, the one
    decorrelation shape the board's other scalar-subquery queries
    (sql_above_customer_avg, sql_lost_customers) don't cover: the HAVING
    compares a grouped aggregate against an UNCORRELATED aggregate over
    the same derived join. IDENTICAL text on both engines; the threshold
    compare is cross-multiplied into exact decimal arithmetic.

    Plan at scale: the nation-key subquery is a 1-row broadcast literal;
    part and supplier broadcast into the lineitem scan (the s_nationkey
    filter prunes the supplier broadcast to 1/|nations| and dynamic
    filtering prunes the fact behind it); the grouped aggregate shuffles
    on p_partkey ONCE; the total is the same aggregate reduced to one
    broadcast row — Catalyst computes it as a separate subquery stage and
    AQE reuses the exchange where the plans align. The HAVING filter runs
    on the aggregate domain, never the fact."""
    register_views(spark, sf_dir)
    return spark.sql(_IMPORTANT_STOCK_SQL)


# TPC-H Q12 shape restated on the available columns (no l_shipmode /
# l_commitdate / l_receiptdate): the flagged-class filter keys on
# l_returnflag ∈ ('R','A') and "late" is l_shipdate > o_orderdate + 30
# days within one ship year. All-integer counts — no float boundary
# anywhere. A NULL o_orderpriority lands in NEITHER arm (NULL IN / NOT IN
# both gate their CASE to the ELSE 0) — identical three-valued behavior
# in both engines.
_PRIORITY_SHIPPING_SQL = """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag IN ('R', 'A')
      AND l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1997-01-01'
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY l_returnflag
"""


@register(
    "sql_priority_shipping",
    oracle=_PRIORITY_SHIPPING_SQL,
    category="sql-api",
    origin="EXT",
)
def sql_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes and order priority): per flagged
    lineitem class, how many LATE shipments belonged to high- vs
    low-priority orders — the two-arm conditional aggregate over a
    date-windowed join that audits whether cheap shipping classes delay
    critical orders. IDENTICAL text on both engines; restated on the
    fixture's vocabulary (l_returnflag plays Q12's l_shipmode; ship-lag
    vs order date plays commit-vs-receipt lateness).

    Plan at scale: both l_shipdate predicates push to the lineitem scan
    (one year read); the lateness predicate is a non-equi residual on the
    lineitem⋈orders equi-join — the join stays a hash join on the order
    key (the ONLY shuffle), with the residual evaluated in codegen. Both
    conditional counts ride ONE map-side partial aggregate over a ≤3-row
    group domain."""
    register_views(spark, sf_dir)
    return spark.sql(_PRIORITY_SHIPPING_SQL)


# TPC-H Q6 shape: single-scan range-filter revenue aggregate. All three
# predicates push to the parquet scan; the whole query is one map-side
# partial + one 1-row final aggregate — the cheapest possible TPC-H
# shape, included because it completes the sweep of fixture-expressible
# TPC-H queries (every remaining one needs partsupp/comment/phone
# columns the fixtures lack). The 0.05/0.07 literals are decimal on both
# engines and promote to double against the stored double l_discount —
# the same nearest-double on both sides, so the same rows qualify.
_FORECAST_REVENUE_SQL = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
             AS revenue_effect
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@register(
    "sql_forecast_revenue",
    oracle=_FORECAST_REVENUE_SQL,
    category="sql-api",
    origin="EXT",
)
def sql_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the revenue a year of
    small-quantity, mid-discount lineitems would have contributed had the
    discounts been eliminated — the canonical single-table scan-heavy
    aggregate (no join at all), which is exactly why it matters: it
    measures the scan path alone. IDENTICAL text on both engines;
    the discount·price product is the exact-decimal device.

    Plan at scale: all three predicates (ship-year range, discount band,
    quantity cap) push into the parquet scan as PushedFilters with the
    read schema pruned to four columns; what survives flows into ONE
    map-side-combinable aggregate producing a single row — no shuffle of
    data, only the 1-row partial exchange. Fixture check: 1,251 matching
    lineitems at sf0.01."""
    register_views(spark, sf_dir)
    return spark.sql(_FORECAST_REVENUE_SQL)


# TPC-H Q2 shape restated (no partsupp: a supplier's unit cost for a part
# = MIN(l_extendedprice / l_quantity) over its lineitem history). The
# division runs in IEEE double on BOTH engines — bit-identical per row
# (one correctly-rounded op on identical parquet inputs), and MIN is
# order-insensitive, so the min-equality compare is exact without the
# decimal-scale divergence a DECIMAL division would invite (engines
# disagree on result scale rules). The l_quantity > 0 guard keeps the
# division total (fixture min is 1; a zero would diverge: Spark NULLs,
# DuckDB rejects).
_MIN_COST_SUPPLIER_SQL = """
    WITH unit_costs AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DOUBLE)
                 / CAST(l_quantity AS DOUBLE)) AS unit_cost
      FROM lineitem
      WHERE l_quantity > 0
      GROUP BY l_partkey, l_suppkey
    )
    SELECT p_partkey, p_name, s_name, unit_cost AS min_unit_cost
    FROM part
    JOIN unit_costs ON p_partkey = l_partkey
    JOIN supplier   ON s_suppkey = l_suppkey
    WHERE p_size <= 10
      AND unit_cost = (SELECT MIN(u2.unit_cost) FROM unit_costs u2
                       WHERE u2.l_partkey = p_partkey)
"""


@register(
    "sql_min_cost_supplier",
    oracle=_MIN_COST_SUPPLIER_SQL,
    category="sql-api",
    origin="EXT",
)
def sql_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum cost supplier): for every small part, the
    supplier(s) whose historical unit cost achieves the part's minimum —
    the correlated MIN-equality scalar subquery, the one Q2 decorrelation
    form the board's other subquery shapes don't cover (Catalyst rewrites
    it to an aggregate + join on the correlation key). IDENTICAL text on
    both engines; unit cost restates ps_supplycost as the lineitem-history
    price-per-unit minimum (the fixture has no partsupp).

    Plan at scale: unit_costs is ONE (part,supplier)-keyed aggregate over
    the fact; the correlated subquery becomes a p_partkey-keyed
    re-aggregate of the SAME relation joined back (AQE reuses the
    exchange where plans align); part (size-filtered before it ships) and
    supplier broadcast. The equality filter runs on the aggregate domain,
    never the fact. Fixture check: 394 qualifying rows at sf0.01."""
    register_views(spark, sf_dir)
    return spark.sql(_MIN_COST_SUPPLIER_SQL)


# TPC-H Q20 shape restated (no partsupp: "excess stock" becomes a shipped-
# quantity share): suppliers whose 1996 shipments of name-matched parts
# exceed 1/6 of their all-time shipped quantity of those parts. The
# threshold is CROSS-MULTIPLIED (·6) so the compare stays in exact
# arithmetic — l_quantity is integral (1..50), so the double sums are
# exact integers and order-insensitive; no 1/6 rounding anywhere.
_PROMOTABLE_PARTS_SQL = """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%r%'
      GROUP BY l_suppkey
      HAVING SUM(CASE WHEN l_shipdate >= DATE '1996-01-01'
                       AND l_shipdate < DATE '1997-01-01'
                      THEN l_quantity ELSE 0 END) * 6
             > SUM(l_quantity)
    )
"""


@register(
    "sql_promotable_parts",
    oracle=_PROMOTABLE_PARTS_SQL,
    category="sql-api",
    origin="EXT",
)
def sql_promotable_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers who
    concentrated more than a sixth of their all-time shipped quantity of
    name-matched parts into one year — the nested IN/semi-join chain over
    a HAVING-filtered aggregate subquery (Catalyst plans the IN as a left
    semi join against the aggregate, the Q20 decorrelation form).
    IDENTICAL text on both engines; all-integer quantity sums make the
    cross-multiplied threshold exact.

    Plan at scale: part (name-filtered) broadcasts into the fact scan;
    the subquery is ONE l_suppkey-keyed conditional aggregate (both arms
    ride the same map-side partial); the semi join against supplier is a
    broadcast of the ≤|suppliers| aggregate domain. One fact exchange
    total. Fixture check: 21 qualifying suppliers at sf0.01."""
    register_views(spark, sf_dir)
    return spark.sql(_PROMOTABLE_PARTS_SQL)
