"""User-behavior analytics over the event stream: ordered funnel
conversion and cohort retention — the two aggregate shapes every
product/event warehouse runs daily, and natural extensions of the
engine's sessionization family (SURVEY.md §2.B `events_sessionize`).

Reference tie-in: the transfer protocol itself is an ordered funnel —
handshake → sequenced chunks → completion (`transf_client.cpp:112-195`,
`transf_server.cpp:154-316`) — and the session GC's "was the user active
N intervals later?" question (`transf_server.cpp:78-131`) is retention.
These operators restate those questions over the generic `events` table.

All hot-path logic is JVM expressions; timestamps are compared on the raw
nanosecond count (``ts_ns``) so ordering and gap math are integer-exact
in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from transf_spark.functions.exprs import (
    PROPS_CANON_RE,
    SQL_FINITE_VALUE,
    dec,
    finite_value,
    sql_props_k_gate,
)
from transf_spark.queries import register
from transf_spark.sources.tables import load_table

# Strict-order funnel: each later step must happen strictly AFTER the
# user's earliest completion of the previous step (the min-chain
# formulation: t1 = min view; t2 = min click with t > t1; t3 = min
# purchase with t > t2).
FUNNEL_STEPS = ("view", "click", "purchase")

NS_PER_DAY = 86_400_000_000_000


@register(
    "events_funnel_steps",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_ns(ts) AS tns FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    s1 AS (
      SELECT user_id, MIN(tns) AS t1 FROM e
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.tns) AS t2 FROM e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.tns > s1.t1 GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.tns) AS t3 FROM e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.tns > s2.t2 GROUP BY e.user_id
    ),
    c AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n1,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n2,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n3
    )
    SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step_name,
           n1 AS n_users, CAST(1.0 AS DOUBLE) AS frac_of_first FROM c
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'click', n2, CAST(n2 AS DOUBLE) / n1 FROM c
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'purchase', n3, CAST(n3 AS DOUBLE) / n1 FROM c
    """,
    category="window/funnel",
    origin="EXT",
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel conversion (view → click → purchase): how many
    users completed each prefix of the journey, in time order, with every
    later step strictly after the earliest completion of the previous one.

    Implementation is a single-shuffle per-user fold rather than one
    join-per-step: filter to funnel event types (pushed to the scan), one
    groupBy(user_id) collecting the time-sorted (ts_ns, type) list, then a
    codegen ``aggregate`` fold that advances the (t1, t2, t3) chain state
    greedily — over a time-sorted list the greedy chain equals the
    min-chain (first view IS min(view); first click after t1 IS
    min(click > t1)), which is what the oracle's three-CTE join computes.
    The fold's step conditions compare only ``ts_ns`` (strict ``>``), so
    equal-timestamp sort ties cannot change the result.

    Scale: ONE shuffle on user_id; per-user state is 3 ints. The collected
    list is bounded by one user's funnel events — the same per-key bound
    sessionization's windows already assume; a pathological single-user
    hot key would salt/pre-filter upstream, not here. The final step
    counts are a 1-row global aggregate (second, 1-row exchange)."""
    # user_id/ts NOT NULL in BOTH dialects: the oracle's per-step JOIN
    # USING (user_id) silently drops a NULL user that the Spark groupBy
    # fold keeps (NULL keys group but never equi-join — round-6 events
    # sweep); an untimed event cannot participate in a strict time chain
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    per_user = (
        ev.filter(F.col("event_type").isin(*FUNNEL_STEPS))
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list(F.struct("ts_ns", "event_type"))).alias("evts"))
    )
    chain = F.expr(
        """aggregate(
             evts,
             named_struct('t1', CAST(NULL AS BIGINT),
                          't2', CAST(NULL AS BIGINT),
                          't3', CAST(NULL AS BIGINT)),
             (s, e) -> CASE
               WHEN e.event_type = 'view' AND s.t1 IS NULL
                 THEN named_struct('t1', e.ts_ns, 't2', s.t2, 't3', s.t3)
               WHEN e.event_type = 'click' AND s.t1 IS NOT NULL
                    AND s.t2 IS NULL AND e.ts_ns > s.t1
                 THEN named_struct('t1', s.t1, 't2', e.ts_ns, 't3', s.t3)
               WHEN e.event_type = 'purchase' AND s.t2 IS NOT NULL
                    AND s.t3 IS NULL AND e.ts_ns > s.t2
                 THEN named_struct('t1', s.t1, 't2', s.t2, 't3', e.ts_ns)
               ELSE s
             END)"""
    )
    # coalesce(..., 0): over ZERO funnel-type events the global agg
    # returns one row of NULL sums, but the oracle's scalar COUNT
    # subqueries return 0 — a funnel with no participants has zero
    # users at every step, not unknown (round-13 review)
    counts = per_user.select(chain.alias("s")).agg(
        F.coalesce(F.sum(F.col("s.t1").isNotNull().cast("long")), F.lit(0)).alias("n1"),
        F.coalesce(F.sum(F.col("s.t2").isNotNull().cast("long")), F.lit(0)).alias("n2"),
        F.coalesce(F.sum(F.col("s.t3").isNotNull().cast("long")), F.lit(0)).alias("n3"),
    )
    return counts.selectExpr(
        """stack(3,
             CAST(1 AS BIGINT), 'view',     n1, CAST(1.0 AS DOUBLE),
             CAST(2 AS BIGINT), 'click',    n2, CAST(n2 AS DOUBLE) / n1,
             CAST(3 AS BIGINT), 'purchase', n3, CAST(n3 AS DOUBLE) / n1
           ) AS (step_idx, step_name, n_users, frac_of_first)"""
    )


@register(
    "agg_retention_cohort",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT user_id, epoch_ns(ts) // {NS_PER_DAY} AS day FROM events
    ),
    c AS (
      SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id
    ),
    r AS (
      SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM d JOIN c USING (user_id) GROUP BY 1, 2
    )
    SELECT cohort_day, day_offset, n_users,
           CAST(n_users AS DOUBLE)
             / MAX(CASE WHEN day_offset = 0 THEN n_users END)
                 OVER (PARTITION BY cohort_day) AS retained_frac
    FROM r
    """,
    category="aggregation/retention",
    origin="EXT",
)
def agg_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-granularity cohort retention: cohort = a user's first active
    day; for each (cohort_day, day_offset), the count of cohort users
    active that day and the retained fraction of the cohort's size.

    Plan: distinct (user_id, day) — one shuffle with map-side combine on
    high-cardinality keys, collapsing the event volume to active-days;
    cohort assignment is a groupBy(user_id) over that already-reduced set;
    the user-keyed join back is AQE-planned (broadcast when the cohort map
    is small, co-hashed otherwise); the final (cohort_day, day_offset)
    aggregate and the cohort-size window both run on the tiny matrix
    (cohorts × offsets). At 100 TB the only event-volume-sized work is the
    first distinct — everything after touches per-user-day rows. Day
    arithmetic is integer division of the raw nanosecond count, exact and
    identical in both engines; `retained_frac` is a single IEEE division."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.expr(f"ts_ns div {NS_PER_DAY}").alias("day")
    ).distinct()
    cohort = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    matrix = (
        days.join(cohort, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    size_w = W.partitionBy("cohort_day")
    cohort_size = F.max(F.when(F.col("day_offset") == 0, F.col("n_users"))).over(size_w)
    return matrix.select(
        "cohort_day",
        "day_offset",
        "n_users",
        (F.col("n_users").cast("double") / cohort_size).alias("retained_frac"),
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS to_type
      FROM events WHERE ts IS NOT NULL
    ),
    t AS (
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
      FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_transitions,
           CAST(n_transitions AS DOUBLE)
             / SUM(n_transitions) OVER (PARTITION BY from_type) AS p_transition
    FROM t
    """,
    category="window/markov",
    origin="EXT",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event journeys:
    for every ordered pair of consecutive events (same user, time order)
    count the (from_type → to_type) transition and normalize to the
    conditional probability P(next | current) — the model behind
    next-action prediction, anomaly scoring ("error after purchase is
    rare"), and journey visualization. Completes the behavioral family
    next to the funnel (fixed path) and sessionizer (gap structure).

    Ordering is (ts_ns, event_id): raw integer nanoseconds, event_id
    tie-break, so equal-timestamp pairs rank identically in both engines.

    Plan: ONE corpus-sized shuffle (user_id) for the lead() window; the
    transition count then aggregates to at most |event types|² rows —
    map-side combined, so the second exchange moves a few hundred bytes
    per partition regardless of corpus size — and the probability
    normalization is a window over that tiny aggregate. Per-user journey
    length only affects a task's row count, not its memory (lead(1) keeps
    no per-key state beyond one row)."""
    # ts IS NOT NULL in BOTH dialects: Spark windows order NULLs FIRST,
    # DuckDB LAST — an untimed event would reorder every lead() pair in
    # its user's journey differently per engine (round-6 events sweep)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    seq = W.partitionBy("user_id").orderBy("ts_ns", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(seq).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    t = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    norm = W.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        "n_transitions",
        (F.col("n_transitions").cast("double") / F.sum("n_transitions").over(norm)).alias(
            "p_transition"
        ),
    )


PATH_TOP_K = 10


@register(
    "events_topk_paths",
    oracle=f"""
    WITH seq AS (
      SELECT event_type AS e1,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
    ),
    paths AS (
      SELECT e1 || '>' || e2 || '>' || e3 AS path,
             CAST(COUNT(*) AS BIGINT) AS n_journeys
      FROM seq
      WHERE e1 IS NOT NULL AND e2 IS NOT NULL AND e3 IS NOT NULL
      GROUP BY 1
    )
    SELECT path, n_journeys, CAST(rnk AS BIGINT) AS rnk FROM (
      SELECT path, n_journeys,
             ROW_NUMBER() OVER (ORDER BY n_journeys DESC, path ASC) AS rnk
      FROM paths)
    WHERE rnk <= {PATH_TOP_K}
    """,
    category="window/sequence-mining",
    origin="EXT",
)
def events_topk_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k sequential path mining: the most frequent 3-step event
    sequences across all user journeys — the "what do users actually
    do" query behind navigation analysis and funnel discovery, completing
    the behavioral family (funnel = fixed path, markov = 1-step memory,
    this = literal top paths).

    Ordering is (ts_ns, event_id) — integer nanoseconds with the event_id
    tie-break, identical in both engines. Plan: ONE corpus-sized user_id
    shuffle shared by both lead() offsets (same window spec), then the
    path count map-side combines to at most |event types|³ rows; the
    global top-k ranking window runs over that tiny aggregate — its
    single-partition sort sees hundreds of rows, never the corpus (the
    same aggregate-then-rank shape as events_markov_transitions)."""
    # ts IS NOT NULL: same NULLS FIRST/LAST window hazard as the markov
    # twin (round-6 events sweep)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    seq = W.partitionBy("user_id").orderBy("ts_ns", "event_id")
    paths = (
        ev.select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(seq).alias("e2"),
            F.lead("event_type", 2).over(seq).alias("e3"),
        )
        # All three steps non-null explicitly: concat_ws silently SKIPS
        # nulls where the oracle's || propagates them, so a null
        # event_type would otherwise emit a malformed 2-step path here
        # and a separately-grouped NULL path there (latent fixture-drift
        # hazard — today's fixture has no null event types).
        .filter(
            F.col("e1").isNotNull()
            & F.col("e2").isNotNull()
            & F.col("e3").isNotNull()
        )
        .select(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_journeys"))
    )
    # deliberate single-partition window — expected "No Partition Defined"
    # WindowExec warning; its input is the path AGGREGATE (bounded at
    # |event-type|³ ≈ a few hundred rows), never the event stream
    rank = W.orderBy(F.col("n_journeys").desc(), F.col("path").asc())
    return (
        paths.withColumn("rnk", F.row_number().over(rank))
        .filter(F.col("rnk") <= PATH_TOP_K)
        .select("path", "n_journeys", F.col("rnk").cast("long").alias("rnk"))
    )


RFM_ANCHOR = "2002-01-01"  # analysis date, just past the last fixture order


@register(
    "events_rfm_segmentation",
    oracle=f"""
    WITH cust AS (
      SELECT o_custkey,
             date_diff('day', MAX(CAST(o_orderdate AS DATE)), DATE '{RFM_ANCHOR}')
               AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS monetary
      FROM orders GROUP BY 1
    ),
    scored AS (
      SELECT CASE WHEN recency_days <= 90 THEN 4 WHEN recency_days <= 365 THEN 3
                  WHEN recency_days <= 730 THEN 2 ELSE 1 END AS r_score,
             CASE WHEN frequency >= 15 THEN 4 WHEN frequency >= 10 THEN 3
                  WHEN frequency >= 5 THEN 2 ELSE 1 END AS f_score,
             CASE WHEN monetary >= 2000000 THEN 4 WHEN monetary >= 1000000 THEN 3
                  WHEN monetary >= 300000 THEN 2 ELSE 1 END AS m_score,
             monetary
      FROM cust
    )
    SELECT CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary) AS VARCHAR) AS monetary_exact
    FROM scored GROUP BY 1, 2, 3
    """,
    category="aggregation/segmentation",
    origin="EXT",
)
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic lifecycle-marketing rollup. Scores use FIXED business bands,
    not quartiles, deliberately: a global ntile over the customer
    aggregate is a single-partition sort that dies at 10⁸ customers,
    while banded scoring is a pure map over the per-customer aggregate —
    and fixed bands are also what practitioners ship (comparable
    month-over-month, no drift when the population shifts). Integer day
    arithmetic against a pinned anchor date; money in exact decimals
    through both aggregation levels.

    Plan: one o_custkey shuffle for the per-customer aggregate (map-side
    combined), a map for the scores, one tiny (r,f,m)-key exchange for
    the ≤64-segment rollup.

    (Named events_* with its behavioral siblings though it reads orders,
    not events — RFM is the per-customer behavior rollup of the order
    stream; renaming would reset the query's driver grading history.)"""
    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(RFM_ANCHOR).cast("date"), F.max(F.col("o_orderdate").cast("date"))
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(dec("o_totalprice")).alias("monetary"),
    )
    r = (
        F.when(F.col("recency_days") <= 90, 4)
        .when(F.col("recency_days") <= 365, 3)
        .when(F.col("recency_days") <= 730, 2)
        .otherwise(1)
    )
    f_ = (
        F.when(F.col("frequency") >= 15, 4)
        .when(F.col("frequency") >= 10, 3)
        .when(F.col("frequency") >= 5, 2)
        .otherwise(1)
    )
    m = (
        F.when(F.col("monetary") >= 2_000_000, 4)
        .when(F.col("monetary") >= 1_000_000, 3)
        .when(F.col("monetary") >= 300_000, 2)
        .otherwise(1)
    )
    return (
        cust.select(
            r.cast("long").alias("r_score"),
            f_.cast("long").alias("f_score"),
            m.cast("long").alias("m_score"),
            "monetary",
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary").cast("string").alias("monetary_exact"),
        )
    )


MAD_K = 3  # anomaly threshold: |x − median| > K · MAD


@register(
    "events_anomaly_mad",
    oracle=f"""
    WITH fin AS (
      SELECT event_type, value FROM events WHERE {SQL_FINITE_VALUE}
    ),
    med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med FROM fin GROUP BY 1
    ),
    dev AS (
      SELECT e.event_type, ABS(e.value - m.med) AS adev
      FROM fin e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_type, m2.med AS median_value, md.mad AS mad_value,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(CASE WHEN ABS(d.value - m2.med) > {MAD_K} * md.mad THEN 1 END)
                AS BIGINT) AS n_anomalies
    FROM events d JOIN med m2 USING (event_type) JOIN mad md USING (event_type)
    GROUP BY 1, 2, 3
    """,
    category="aggregation/robust-statistics",
    origin="EXT",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection per event type — median absolute deviation,
    the outlier rule that (unlike z-scores) is not itself dragged by the
    outliers it hunts: flag values more than MAD_K·MAD from the median.
    The data-quality scrub that precedes any metric aggregation or
    training-data ingestion of telemetry.

    Exact medians (`percentile`, linear interpolation — the pairing
    agg_percentiles already hash-proves against DuckDB `quantile_cont`),
    computed per engine on identical doubles, so the K-times-MAD threshold
    comparisons agree bit-for-bit. Three passes over events (median →
    deviation median → flag count), each one map-side aggregate with the
    5-row stats tables broadcast back. Honest scale note: EXACT per-group
    medians sort each group's values on one reducer — fine while
    |event types| × values fits a task (it does at any realistic telemetry
    cardinality), and the declared sketch twin (`agg_approx_percentile`)
    is the swap-in when it does not: the MAD rule tolerates ~1% quantile
    error by construction."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    # median and MAD are computed over FINITE values only, mirrored in the
    # oracle's fin CTE (round-14 degenerate-events device): percentile vs
    # quantile_cont disagree on NaN placement, and one ±Infinity drags
    # every interpolated quantile. The final anomaly count still scans ALL
    # rows — a non-finite value compares > threshold in BOTH engines (each
    # orders NaN above all values), so it is consistently an anomaly.
    fin = ev.filter(finite_value())
    med = fin.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("median_value")
    )
    dev = fin.join(F.broadcast(med), "event_type").select(
        "event_type", (F.abs(F.col("value") - F.col("median_value"))).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad_value")
    )
    return (
        ev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "median_value", "mad_value")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(
                F.when(
                    F.abs(F.col("value") - F.col("median_value"))
                    > MAD_K * F.col("mad_value"),
                    1,
                )
            ).alias("n_anomalies"),
        )
    )


@register(
    "events_attribution_touch",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, epoch_ns(ts) AS tns,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_ns(ts), event_id) AS rna,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rnd
      FROM events WHERE ts IS NOT NULL
    )
    SELECT user_id,
           MAX(CASE WHEN rna = 1 THEN event_type END) AS first_touch,
           MAX(CASE WHEN rnd = 1 THEN event_type END) AS last_touch,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(tns) AS first_ts_ns,
           MAX(tns) AS last_ts_ns
    FROM o GROUP BY user_id
    """,
    category="aggregation/attribution",
    origin="EXT",
)
def events_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch attribution: per user, the event type of the
    chronologically first and last event plus lifetime bounds — the
    credit-assignment primitive behind marketing attribution and the batch
    twin of the reference's per-session "first frame opens, last frame
    closes" lifecycle (HS at `transf_server.cpp:154-199`, DONE at
    `transf_server.cpp:288-316`).

    Plan: ONE shuffle on user_id — ``min_by``/``max_by`` keyed on the
    (ts_ns, event_id) struct fold the argmin/argmax inside the hash
    aggregate with map-side partials, so no window sort and no second pass.
    The oracle needs two ROW_NUMBER windows + a conditional re-aggregate to
    say the same thing — the argmin-in-aggregate form is the one that
    survives 100 TB (per-key state is one (key, value) pair; a window form
    would sort every user's history). Ties are impossible: event_id is
    unique and tie-breaks equal timestamps in both engines."""
    # ts IS NOT NULL in BOTH dialects: an untimed event has no
    # chronological position — Spark's struct-min_by ranks a NULL ts_ns
    # LOWEST while the oracle's window orders it LAST (round-6 sweep)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    ordkey = F.struct("ts_ns", "event_id")
    return ev.groupBy("user_id").agg(
        F.min_by("event_type", ordkey).alias("first_touch"),
        F.max_by("event_type", ordkey).alias("last_touch"),
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_ns").alias("first_ts_ns"),
        F.max("ts_ns").alias("last_ts_ns"),
    )


@register(
    "events_gapfill_ffill",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, day, close_value FROM (
        SELECT user_id, epoch_ns(ts) // {NS_PER_DAY} AS day, value AS close_value,
               ROW_NUMBER() OVER (PARTITION BY user_id, epoch_ns(ts) // {NS_PER_DAY}
                                  ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1
    ),
    span AS (
      SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM daily GROUP BY 1
    ),
    grid AS (
      SELECT user_id, UNNEST(generate_series(mn, mx)) AS day FROM span
    ),
    j AS (
      SELECT g.user_id, g.day, d.close_value,
             d.close_value IS NULL AS is_gap
      FROM grid g LEFT JOIN daily d USING (user_id, day)
    )
    SELECT user_id, day,
           LAST_VALUE(close_value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
           is_gap
    FROM j
    """,
    category="window/time-series",
    origin="EXT",
)
def events_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill + forward-fill (resample to a daily grid): per
    user, one row per calendar day between their first and last active day;
    inactive days are materialized and carry the last observed daily close
    forward — the resampling step that precedes any ML feature window or
    day-over-day metric on irregular event data.

    The daily "close" is the value of the day's LAST event (max_by on the
    (ts_ns, event_id) struct — deterministic, no float summation, so the
    carried value is bit-identical in both engines). The day grid is built
    JVM-side with ``sequence(min_day, max_day)`` + explode — rows are
    *created* inside the engine, never collected. Forward fill is
    ``last(value, ignorenulls=True)`` over the running frame.

    Plan: one user_id-keyed shuffle for the daily close (argmax inside the
    hash aggregate), a per-user span aggregate on the already-daily rows,
    explode (no shuffle), then the join back and the fill window reuse the
    user_id partitioning. Grid size is bounded by active-span days — the
    fill never scans event volume, only the daily matrix. A pathological
    decade-idle user adds 3650 rows, not a hot partition."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "user_id",
            F.expr(f"ts_ns div {NS_PER_DAY}").alias("day"),
            "value",
            "ts_ns",
            "event_id",
        )
        .groupBy("user_id", "day")
        .agg(F.max_by("value", F.struct("ts_ns", "event_id")).alias("close_value"))
    )
    grid = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select("user_id", F.explode(F.sequence("mn", "mx")).alias("day"))
    )
    j = grid.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        "close_value",
        F.col("close_value").isNull().alias("is_gap"),
    )
    fill = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return j.select(
        "user_id",
        "day",
        F.last("close_value", ignorenulls=True).over(fill).alias("filled_value"),
        "is_gap",
    )


# Regression anchor: events begin 2024-01-01 (epoch day 19723); re-centering
# x = day − anchor keeps every component sum (Σx, Σx², Σxy) small-integer
# EXACT, so the slope/intercept doubles are single divisions of identical
# longs in both engines — bit-exact, unlike engine-native regr_slope whose
# incremental accumulation order is implementation-defined.
LINREG_ANCHOR_DAY = 19723


@register(
    "agg_linreg_daily_trend",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             epoch_ns(ts) // {NS_PER_DAY} - {LINREG_ANCHOR_DAY} AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY 1 HAVING COUNT(*) >= 2
    )
    SELECT event_type, n_days,
           CAST(n_days * sxy - sx * sy AS DOUBLE)
             / CAST(n_days * sxx - sx * sx AS DOUBLE) AS slope_per_day,
           (CAST(sy AS DOUBLE)
              - (CAST(n_days * sxy - sx * sy AS DOUBLE)
                 / CAST(n_days * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(n_days AS DOUBLE) AS intercept
    FROM s
    """,
    category="aggregation/regression",
    origin="EXT",
)
def agg_linreg_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares trend: for each event type, the
    slope and intercept of daily event volume regressed on the day index —
    the "is this metric growing?" primitive behind capacity forecasts and
    drift alarms.

    Both engines compute the SAME closed form from integer component sums
    (n, Σx, Σy, Σxy, Σx²) over (re-centered day, daily count) — every sum
    is exact long arithmetic, and slope/intercept are then identical IEEE
    expressions of identical longs, so the doubles hash bit-for-bit.
    Engine-native ``regr_slope`` is deliberately NOT used: its incremental
    (Welford-style) accumulation is order-dependent and differs across
    engines — the exact-integer-sums form is also the one that distributes
    (component sums are associative; the final division is a map over the
    per-group row).

    Plan: one (event_type, day) map-side-combined exchange collapses event
    volume to the daily matrix; the component-sum aggregate and closed-form
    division then touch only |types| × |days| rows. Overflow headroom:
    re-centered x < 10⁴ even for a 25-year series, so Σxy < 2⁶³ until daily
    counts exceed 10¹⁴ — beyond any real telemetry; the re-center is what
    buys that bound."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            (F.expr(f"ts_ns div {NS_PER_DAY}") - LINREG_ANCHOR_DAY).alias("x"),
        )
        .groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).filter(F.col("n_days") >= 2)  # a 1-day group has den == 0: no trend, not a NULL row
    num = (F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n_days").cast("double")
    return s.select(
        "event_type",
        "n_days",
        slope.alias("slope_per_day"),
        intercept.alias("intercept"),
    )


@register(
    "events_user_lifecycle",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    w AS (
      SELECT user_id, day,
             lag(day)  OVER (PARTITION BY user_id ORDER BY day) AS prev_day,
             lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day,
             MIN(day)  OVER (PARTITION BY user_id) AS first_day
      FROM act
    ),
    entries AS (
      SELECT day,
             CASE WHEN day = first_day THEN 1 ELSE 0 END AS is_new,
             CASE WHEN prev_day = day - 1 THEN 1 ELSE 0 END AS is_ret,
             CASE WHEN prev_day IS NOT NULL AND prev_day < day - 1 THEN 1 ELSE 0 END
               AS is_res,
             0 AS is_churn
      FROM w
      UNION ALL
      SELECT day + 1 AS day, 0, 0, 0, 1
      FROM w WHERE next_day IS NULL OR next_day > day + 1
    )
    SELECT day,
           CAST(SUM(is_new) AS BIGINT) AS n_new,
           CAST(SUM(is_ret) AS BIGINT) AS n_retained,
           CAST(SUM(is_res) AS BIGINT) AS n_resurrected,
           CAST(SUM(is_churn) AS BIGINT) AS n_churned
    FROM entries GROUP BY day
    """,
    category="aggregation/growth-accounting",
    origin="EXT",
)
def events_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth-accounting lifecycle census — the daily
    new/retained/resurrected/churned user counts every product warehouse
    derives from its event stream (the session-GC question of
    `transf_server.cpp:78-131` — "was this session active the next
    interval?" — asked per user per day):

    - new: first-ever active day;
    - retained: active today AND yesterday;
    - resurrected: active today, seen before, but not yesterday;
    - churned (attributed to day d): active on d-1, not active on d —
      emitted even past the last observed day (the standard convention:
      every active day eventually churns or retains).

    NULL user_id / NULL ts rows are excluded in BOTH dialects (NULL is not
    a user; NULL is an ordering key — the Spark-NULLS-FIRST vs
    DuckDB-NULLS-LAST window class).

    Plan at scale: ONE user_id exchange total — per user, the sorted
    distinct activity-day array is built by a map-side-combinable
    collect_set aggregate (bounded by the calendar: ≤ 365·years entries
    per user), and the new/retained/resurrected/churn classification of
    EVERY day is a pure array expression over it (the oracle states the
    same algebra with lag/lead windows — two formulations, one answer).
    The final day census is a second small exchange on ~calendar-sized
    keys. No self-join, no fact-table window."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    per_user = ev.select("user_id", F.to_date("ts").alias("day")).groupBy(
        "user_id"
    ).agg(F.array_sort(F.collect_set("day")).alias("ds"))
    return (
        per_user.select(F.explode(lifecycle_entries()).alias("e"))
        .select("e.*")
        .groupBy("day")
        .agg(
            F.sum("is_new").cast("long").alias("n_new"),
            F.sum("is_ret").cast("long").alias("n_retained"),
            F.sum("is_res").cast("long").alias("n_resurrected"),
            F.sum("is_churn").cast("long").alias("n_churned"),
        )
    )


# Lifecycle classification kernel over a sorted distinct-day array `ds`:
# per active day i (0-based): new ⇔ i = 0; retained ⇔ gap to the previous
# day is exactly 1; resurrected ⇔ gap > 1. Churn entries ride the same
# array: day+1 for every day whose successor is absent (element_at past
# the end is NULL under the pinned non-ANSI semantics, so the last day
# always churns). Kept as SQL text with a lazy builder — F.expr at module
# level would demand an active SparkContext at import/collection time —
# so the hypothesis property suite can drive the kernel on raw day arrays
# against a Python reference without staging events.
_LIFECYCLE_ENTRIES_SQL = """
    concat(
      transform(ds, (d, i) -> struct(
        d AS day,
        IF(i = 0, 1, 0) AS is_new,
        IF(i = 0, 0, IF(datediff(d, element_at(ds, i)) = 1, 1, 0)) AS is_ret,
        IF(i = 0, 0, IF(datediff(d, element_at(ds, i)) > 1, 1, 0)) AS is_res,
        0 AS is_churn)),
      filter(
        transform(ds, (d, i) -> IF(
          element_at(ds, i + 2) IS NULL
            OR datediff(element_at(ds, i + 2), d) > 1,
          struct(date_add(d, 1) AS day, 0 AS is_new, 0 AS is_ret,
                 0 AS is_res, 1 AS is_churn),
          CAST(NULL AS struct<day:date,is_new:int,is_ret:int,is_res:int,
                              is_churn:int>))),
        x -> x IS NOT NULL)
    )
    """


def lifecycle_entries():
    """Lazy Column builder for the lifecycle kernel (see the SQL above)."""
    return F.expr(_LIFECYCLE_ENTRIES_SQL)


# Canonical-props gate for the JSON extractor — shared with every other
# props-parsing query via functions/exprs.py (the scalar suite hit the
# same DuckDB raising-parser class in the round-9 sweep). See
# exprs.PROPS_CANON_RE for the full dialect-parity rationale.
_PROPS_CANON_RE = PROPS_CANON_RE


@register(
    "events_props_json_extract",
    oracle=f"""
    WITH x AS (
      SELECT event_type,
             {sql_props_k_gate("BIGINT")} AS k
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(k) AS BIGINT) AS n_with_k,
           CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k,
           MIN(k) AS min_k,
           MAX(k) AS max_k,
           CAST(SUM(k) AS BIGINT) AS sum_k
    FROM x GROUP BY event_type
    """,
    category="scalar/semi-structured",
    origin="EXT",
)
def events_props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON path extraction over the events ``props``
    column — the ubiquitous event-warehouse pattern (properties bags land
    as JSON strings; queries pull typed fields out) the scalar suites
    didn't cover. Per event type: coverage, extraction yield, and the
    numeric profile of ``$.k``.

    Dialect parity engineering (round-8 review finding): the two JSON
    parsers genuinely DISAGREE at the edges — Spark's ``get_json_object``
    is lenient (accepts single-quoted keys and trailing garbage, returns
    NULL only on hard failures) while DuckDB's ``json_extract_string``
    errors on anything non-strict, and the string→long casts split on
    fractional text (Spark truncates '1.5'→1, DuckDB TRY_CAST rounds→2).
    No guard built FROM the parsers can reconcile that, so the declared
    input contract is gated BEFORE either parser by one identical
    simple-feature regex (the PII-redaction device): only canonical
    integer-valued ``{"k": N}`` bags extract; anything else — malformed,
    lenient-but-nonstandard, fractional, extra keys — is NULL in BOTH
    dialects by the same test. The gate's integer arm is the strict JSON
    number grammar (no leading zeros — DuckDB's parser RAISES on
    ``{"k":007}`` even under TRY_CAST), and the oracle adds a
    ``json_valid`` guard so no gate regression can ever reach the raising
    parser. Plan at scale: the gate+extraction is a
    pure map fused into the scan reading only (event_type, props); the
    census is ONE aggregate on the tiny event-type domain (COUNT DISTINCT
    adds its standard two-phase expand — bounded by |types| ×
    |k-domain|)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.when(
        F.col("props").rlike(_PROPS_CANON_RE),
        F.get_json_object("props", "$.k").cast("long"),
    )
    x = ev.select("event_type", k.alias("k"))
    return x.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("k").alias("n_with_k"),
        F.count_distinct("k").alias("n_distinct_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.sum("k").cast("long").alias("sum_k"),
    )
