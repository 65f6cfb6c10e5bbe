"""Event-time window operators over ``events`` (SURVEY.md §2.8 T7 —
absent from the reference, required by the engine's streaming surface).

Each is registered as a *batch* plan so the DuckDB oracle can check the
exact window semantics; ``streaming.windows`` runs the same expressions
under ``readStream`` + watermark (rows checked by the streaming tests
— the logical plan is identical, which is the point of Structured
Streaming's unified batch/stream model).

Scale posture: a tumbling/sliding window agg is just a hash agg keyed
by (window, keys) — partial aggregation happens map-side, the shuffle
carries one row per (window × key × partition). Session windows
shuffle on the user key and sort within partitions (Spark plans
UpdatingSessionsExec); skewed users are the AQE skew-join analog —
salt or cap per-user event counts upstream if one user dominates.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from f1_realtime_data_pipeline_spark.operators.aggregations import (
    decimal_sum,
    decimal_sum_sql,
)
from f1_realtime_data_pipeline_spark.sources.parquet import read_events

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _register(name, fn, sql):
    QUERIES[name] = fn
    if sql is not None:
        ORACLE[name] = sql


def w_tumbling(spark, sf_dir):
    """1-hour tumbling windows × event_type: count + exact value sum.

    Explicit NULL-event-time drop (r8 NULL sweep, whole w_* window
    family): Spark's ``F.window`` silently EXCLUDES NULL-ts rows
    (streaming semantics — an event without a time cannot be
    windowed) while the oracle's ``date_trunc(NULL)`` would group
    them under a NULL window — a cross-engine divergence the
    NULL-free fixtures cannot witness. Both sides now filter
    ``ts IS NOT NULL`` so the drop is a documented classification,
    not an engine accident."""
    ev = read_events(spark, sf_dir).filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            decimal_sum("value", "sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_register(
    "w_tumbling",
    w_tumbling,
    f"""SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {decimal_sum_sql("value", "sum_value")}
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2, 3""",
)


def w_sliding(spark, sf_dir):
    """1-hour windows sliding every 30 min — every event lands in two
    overlapping windows (starts aligned to the slide). NULL event
    times drop explicitly on both sides (see :func:`w_tumbling`)."""
    ev = read_events(spark, sf_dir).filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


_register(
    "w_sliding",
    w_sliding,
    """WITH trunc30 AS (
  SELECT date_trunc('hour', ts)
         + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END
         AS slide_start
  FROM events
  WHERE ts IS NOT NULL
), starts AS (
  SELECT slide_start AS window_start FROM trunc30
  UNION ALL
  SELECT slide_start - INTERVAL 30 MINUTE AS window_start FROM trunc30
)
SELECT window_start,
       window_start + INTERVAL 1 HOUR AS window_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM starts
GROUP BY window_start""",
)


def w_session(spark, sf_dir):
    """Per-user session windows with a 30-minute inactivity gap.

    Spark semantics: an event at t extends the session to t + gap; a
    new session opens when the next event's t >= current end (i.e. gap
    or more after the previous event). The oracle reproduces exactly
    that with lag + cumulative-sum sessionization. NULL event times
    drop explicitly on both sides (see :func:`w_tumbling` — here the
    Spark side's ``session_window`` excludes them while the oracle's
    lag/cumsum would sessionize them, a worse silent divergence).
    """
    ev = read_events(spark, sf_dir).filter(F.col("ts").isNotNull())
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            decimal_sum("value", "sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


_register(
    "w_session",
    w_session,
    f"""WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WHERE ts IS NOT NULL
), sessions AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {decimal_sum_sql("value", "sum_value")}
FROM sessions
GROUP BY user_id, sid""",
)


def w_sessionize_lag(spark, sf_dir):
    """The batch sessionization idiom itself (lag + gap + cumsum) as a
    first-class operator — session ids attached to raw events, for
    pipelines that need per-event session context rather than the
    collapsed session rows of :func:`w_session`. NULL event times
    drop explicitly on both sides (see :func:`w_tumbling` — an
    unfiltered NULL ts would also ORDER differently per engine:
    Spark windows sort NULLS FIRST ascending, DuckDB NULLS LAST,
    shifting every session id in the partition)."""
    ev = read_events(spark, sf_dir).filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    new_sess = F.when(gap.isNull() | (gap >= 1800), 1).otherwise(0)
    return (
        ev.withColumn("new_sess", new_sess)
        .withColumn(
            "session_seq",
            F.sum("new_sess")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("int"),
        )
        .select("event_id", "user_id", "ts", "session_seq")
    )


_register(
    "w_sessionize_lag",
    w_sessionize_lag,
    """SELECT event_id, user_id, ts,
       CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_seq
FROM (
  SELECT event_id, user_id, ts,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WHERE ts IS NOT NULL
)""",
)

def w_asof_attribution(spark, sf_dir):
    """As-of join over the event stream: each purchase attributed to
    the user's most recent click at-or-before it (left-outer; null
    when the user never clicked before). Spark side = union +
    carry-forward window (operators.joins.asof_join); oracle = native
    DuckDB ASOF LEFT JOIN — two independent formulations of the same
    semantics.

    The click side deliberately plants NULLs (r7, VERDICT r6 #2): ts
    is nulled for event_id ≡ 0 (mod 5) — those rows must match
    NOTHING (a NULL timestamp never satisfies ts <= purchase_ts, and
    their disappearance shifts which click wins for the neighbors) —
    and click_value is nulled for event_id ≡ 0 (mod 3), so a matched
    row must carry its NULL verbatim rather than fabricate a value
    from an older click (the exact mixed-row bug the struct-carry
    rewrite of asof_join fixed). Both derivations are in-plan in both
    engines, so the DuckDB native ASOF exercises the same edges."""
    from f1_realtime_data_pipeline_spark.operators.joins import asof_join

    ev = read_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.when(F.col("event_id") % 5 != 0, F.col("ts")).alias("ts"),
        F.when(F.col("event_id") % 3 != 0, F.col("value")).alias("click_value"),
    )
    out = asof_join(
        purchases, clicks, on="user_id", ts_col="ts",
        value_cols=["click_value"], right_ts_alias="click_ts",
    )
    return out.select(
        "event_id", "user_id",
        F.col("ts").alias("purchase_ts"),
        "click_ts", "click_value",
    )


_register(
    "w_asof_attribution",
    w_asof_attribution,
    """SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
       c.ts AS click_ts, c.click_value
FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (
  SELECT user_id,
         CASE WHEN event_id % 5 <> 0 THEN ts END AS ts,
         CASE WHEN event_id % 3 <> 0 THEN value END AS click_value
  FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts""",
)

def w_interval_join(spark, sf_dir):
    """Batch form of the stream-stream interval join (attribution
    shape): every (click, purchase) pair per user with the purchase
    inside the hour after the click. Equi-join on user_id with a
    range post-filter — per-key candidate sets, never a global range
    scan; the streaming twin (streaming.windows.interval_self_join)
    runs the same condition with watermark-bounded state."""
    ev = read_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("ts").alias("purchase_ts")
    )
    return (
        clicks.join(purchases, "user_id")
        .filter(
            (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .select(
            "user_id",
            "click_ts",
            "purchase_ts",
            # microsecond difference floor-divided: truncating each
            # endpoint to seconds first (unix_timestamp) disagrees with
            # engines that keep fractions (epoch() in DuckDB)
            F.expr(
                "(unix_micros(purchase_ts) - unix_micros(click_ts)) DIV 1000000"
            ).alias("gap_seconds"),
        )
    )


_register(
    "w_interval_join",
    w_interval_join,
    """SELECT c.user_id, c.ts AS click_ts, p.ts AS purchase_ts,
       (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS gap_seconds
FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 1 HOUR"""
)

def w_funnel(spark, sf_dir):
    """FIRST-TOUCH conversion funnel signup → click → purchase: a
    user advances a stage when their GLOBAL first event of that type
    falls at-or-after the previous stage's first event (min-timestamp
    pivot per user — one shuffle, stage predicates as conditional
    counts). Note the semantics precisely (r6 review): a user whose
    first click precedes signup does NOT count at stage 2 even if
    they click again later — the strict "first event AFTER the
    previous stage" variant needs a per-user conditional min (min ts
    among events later than t_signup), which is a second pivot over
    the same single shuffle; this registered form is the common
    cheap first-touch approximation, and the oracle implements the
    identical expression."""
    ev = read_events(spark, sf_dir)
    per_user = (
        ev.filter(F.col("event_type").isin("signup", "click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
                "t_purchase"
            ),
        )
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & F.col("t_click").isNotNull() & (F.col("t_click") >= F.col("t_signup"))
    s3 = s2 & F.col("t_purchase").isNotNull() & (F.col("t_purchase") >= F.col("t_click"))
    return per_user.agg(
        F.sum(s1.cast("int")).cast("bigint").alias("n_signup"),
        F.sum(s2.cast("int")).cast("bigint").alias("n_signup_click"),
        F.sum(s3.cast("int")).cast("bigint").alias("n_full_funnel"),
    )


_register(
    "w_funnel",
    w_funnel,
    """WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  WHERE event_type IN ('signup', 'click', 'purchase')
  GROUP BY user_id
)
SELECT CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_signup,
       CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click IS NOT NULL
                      AND t_click >= t_signup THEN 1 ELSE 0 END) AS BIGINT)
         AS n_signup_click,
       CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click IS NOT NULL
                      AND t_click >= t_signup AND t_purchase IS NOT NULL
                      AND t_purchase >= t_click THEN 1 ELSE 0 END) AS BIGINT)
         AS n_full_funnel
FROM per_user""",
)

def w_json_props(spark, sf_dir):
    """Typed JSON-property extraction from the event payload
    (schema-on-read: props is a JSON string column) aggregated per
    event_type — get_json_object path navigation + cast, all JVM.
    try_cast (r8 ANSI sweep): malformed props.k → NULL (uncounted by
    COUNT(k)/ignored by SUM — the classify-drop shape) instead of an
    ANSI CAST_INVALID_INPUT job abort; TRY_CAST twin in the oracle."""
    ev = read_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").try_cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").cast("bigint").alias("n_with_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
        )
        .orderBy("event_type")
    )


_register(
    "w_json_props",
    w_json_props,
    """SELECT event_type,
       CAST(COUNT(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS n_with_k,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(MIN(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
       CAST(MAX(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type""",
)

def w_lateness_audit(spark, sf_dir):
    """Watermark lateness audit: which events would a 30-minute
    watermark have dropped? Using event_id as the arrival-order proxy
    (the generator emits in arrival order), an event is late when its
    event time sits more than the delay behind the running max event
    time at its arrival. The observability query you run BEFORE
    choosing a watermark delay (T6) — per-type late counts + share.

    r7 (VERDICT r6 #7): the running max now uses the DISTRIBUTED
    chunked prefix-max (operators.chunked_running_max — per-chunk
    window + broadcast prior-chunk prefix, the decomposition
    w_watermark_curve proved flat 0.96×/decade by measurement)
    instead of the single-task global-order window. Values are
    identical (max is associative), so the oracle keeps the plain
    global window — the hash match proves the decomposition."""
    from f1_realtime_data_pipeline_spark.operators.aggregations import (
        chunked_running_max,
    )

    ev = read_events(spark, sf_dir)
    with_wm = chunked_running_max(
        ev.select("event_id", "event_type", "ts"),
        order_col="event_id",
        val_col="ts",
        alias="max_seen",
    )
    late = F.col("ts") < F.col("max_seen") - F.expr("INTERVAL 30 MINUTES")
    return (
        with_wm.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(late.cast("int")).cast("bigint").alias("n_late"),
        )
        .withColumn(
            "late_share",
            F.col("n_late").cast("double") / F.col("n_events").cast("double"),
        )
        .orderBy("event_type")
    )


_register(
    "w_lateness_audit",
    w_lateness_audit,
    """WITH with_wm AS (
  SELECT event_id, event_type, ts,
         MAX(ts) OVER (ORDER BY event_id
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS max_seen
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN ts < max_seen - INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late,
       CAST(SUM(CASE WHEN ts < max_seen - INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS late_share
FROM with_wm
GROUP BY event_type
ORDER BY event_type""",
)



def w_retention(spark, sf_dir):
    """Cohort retention: users grouped by first-active day, activity
    counted at each day offset — the engagement table every analytics
    serving layer derives. Shuffles: distinct (user, day), the
    per-user min (both partial-agg first), one broadcast-able join of
    activity to the per-user cohort relation (at 100 TB: co-partition
    both sides on user_id — same key, one shuffle reused)."""
    ev = read_events(spark, sf_dir)
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    cohort = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(cohort, "user_id")
        .groupBy(
            "cohort_day", F.datediff("day", "cohort_day").cast("int").alias("offset_days")
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
    )


_register(
    "w_retention",
    w_retention,
    """WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), cohort AS (
  SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id
)
SELECT cohort_day,
       CAST(date_diff('day', cohort_day, day) AS INT) AS offset_days,
       CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_active
FROM days d JOIN cohort USING (user_id)
GROUP BY 1, 2""",
)


def w_type_transitions(spark, sf_dir):
    """Per-user event-type transition counts (the Markov-chain edge
    table): lag over (user, time) then count (prev, next) pairs. Tie
    order pinned by event_id so the lag is deterministic in any
    engine. One shuffle on user_id for the window sort, one partial
    agg on the pair."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").cast("bigint").alias("n_transitions"))
    )


_register(
    "w_type_transitions",
    w_type_transitions,
    """WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM seq WHERE prev_type IS NOT NULL
GROUP BY 1, 2""",
)


def w_trailing_spend(spark, sf_dir):
    """Bounded RANGE-frame window (r16): per customer, the trailing
    30-day spend and order count at every order — RANGE BETWEEN 29
    PRECEDING AND CURRENT ROW over an integer day key, the surface no
    other registered window exercises (every prior RANGE frame is
    UNBOUNDED PRECEDING; o_window_running is a ROWS frame). The frame
    is VALUE-bounded, so same-day peer orders all join the frame
    regardless of row order — deterministic under any partitioning,
    unlike a ROWS equivalent. Money is exact bigint cents.

    Shape at 100 TB: one window partitioned by customer (cardinality
    ≫ cores, no hot key in a retail-shaped corpus); day derivation is
    map-side integer arithmetic; nothing global."""
    from f1_realtime_data_pipeline_spark.sources.parquet import read_table

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).cast("bigint").alias("day"),
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("order_cents"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-29, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "day",
        "order_cents",
        F.sum("order_cents").over(w).cast("bigint").alias("trailing_30d_cents"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_orders_30d"),
    )


_register(
    "w_trailing_spend",
    w_trailing_spend,
    """WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(DATE_DIFF('day', DATE '1970-01-01',
              CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
         CAST(round(o_totalprice * 100) AS BIGINT) AS order_cents
  FROM orders
)
SELECT o_orderkey, o_custkey, day, order_cents,
       CAST(SUM(order_cents) OVER (PARTITION BY o_custkey ORDER BY day
            RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS trailing_30d_cents,
       CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY day
            RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_orders_30d
FROM o""",
)


def w_cusum_shift(spark, sf_dir):
    """Exact CUSUM changepoint detection over daily order volume per
    priority — the sequential drift monitor (Page's CUSUM) made
    window-expressible: the clamped recursion
    ``S_t = max(0, S_{t-1} + x_t − k)`` equals
    ``P_t − min_{j≤t} P_j`` where ``P`` is the prefix sum of
    ``x − k`` — a running sum plus a running min, two frames over the
    SAME per-priority window, no recursion and no UDF. The allowance
    ``k`` is the priority's own mean daily volume, derived in-plan in
    millicount fixed point (integer DIV — bit-stable cross-engine);
    alarm threshold h = 5·k (five allowance-units of accumulated
    drift). Scale: the aggregation grid is (priority × day) —
    domain-sized, not row-sized — and every window partitions by
    priority; nothing global, nothing floating-point."""
    from f1_realtime_data_pipeline_spark.sources.parquet import read_table

    o = read_table(spark, sf_dir, "orders")
    daily = (
        o.filter(F.col("o_orderdate").isNotNull())
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("DAY", F.col("o_orderdate")).alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wp = Window.partitionBy("priority")
    wo = wp.orderBy("day")
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # k_milli = (1000 * total) DIV days per priority, in-plan — pure
    # INTEGER division: a double route diverges per engine at the
    # cast (Spark truncates, DuckDB rounds — measured k off by one,
    # drifting the whole CUSUM by +1/day)
    daily = (
        daily.withColumn("__tot", F.sum("n").over(wp))
        .withColumn("__days", F.count(F.lit(1)).over(wp))
        .withColumn("k_milli", F.expr("(1000 * __tot) DIV __days"))
        .drop("__tot", "__days")
    )
    daily = daily.withColumn(
        "p", F.sum(F.lit(1000) * F.col("n") - F.col("k_milli")).over(wrun)
    )
    daily = daily.withColumn(
        "cusum_milli",
        F.col("p") - F.least(F.min("p").over(wrun), F.lit(0)),
    )
    return daily.select(
        "priority",
        "day",
        "n",
        F.col("cusum_milli").cast("bigint").alias("cusum_milli"),
        (F.col("cusum_milli") > 5 * F.col("k_milli"))
        .cast("int")
        .alias("shift_flag"),
    ).orderBy("priority", "day")


_register(
    "w_cusum_shift",
    w_cusum_shift,
    """WITH daily AS (
  SELECT o_orderpriority AS priority,
         date_trunc('day', o_orderdate) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_orderdate IS NOT NULL
  GROUP BY 1, 2
), k AS (
  SELECT *,
         (1000 * SUM(n) OVER (PARTITION BY priority))
             // (COUNT(*) OVER (PARTITION BY priority)) AS k_milli
  FROM daily
), pre AS (
  SELECT *,
         SUM(1000 * n - k_milli) OVER (
           PARTITION BY priority ORDER BY day
           ROWS UNBOUNDED PRECEDING) AS p
  FROM k
), cus AS (
  SELECT *,
         p - LEAST(MIN(p) OVER (
               PARTITION BY priority ORDER BY day
               ROWS UNBOUNDED PRECEDING), 0) AS cusum_milli
  FROM pre
)
SELECT priority, day, n,
       CAST(cusum_milli AS BIGINT) AS cusum_milli,
       CAST(CASE WHEN cusum_milli > 5 * k_milli THEN 1 ELSE 0 END AS INT)
           AS shift_flag
FROM cus ORDER BY priority, day""",
)


def w_interval_bucket(spark, sf_dir):
    """KEYLESS interval-containment join, bucket-decomposed — the
    scale form of "which purchases (any user) fall inside any
    incident window?" where no equi key links the sides.
    w_interval_join's shape leans on its user_id equi key; without
    one, the naive plan is a cross join with a range filter
    (|points| × |windows| candidates — the 100 TB killer). Here each
    window explodes into the HOUR buckets it covers (bounded: windows
    are user-day activity spans, ≤24 buckets) and each point carries
    its own hour bucket, so the join is an EQUI-join on the bucket
    key; a (window, point) pair matches in exactly ONE bucket — the
    point's own hour — so no dedup pass is needed. The oracle is the
    UNBUCKETED naive range join: a value-hash match PROVES the
    decomposition loses no pair (the d_prefix_join discipline).

    Windows: per (user ≡ 7 mod 50, day) activity span [min ts, max
    ts]. Points: every purchase event. Exact containment re-verified
    after the bucket join (the bucket overlap is necessary, not
    sufficient)."""
    ev = read_events(spark, sf_dir).filter(F.col("ts").isNotNull())
    wins = (
        ev.filter(F.pmod(F.col("user_id"), F.lit(50)) == 7)
        .groupBy(
            F.col("user_id").alias("win_user"),
            F.date_trunc("DAY", F.col("ts")).alias("__day"),
        )
        .agg(
            F.min("ts").alias("win_start"),
            F.max("ts").alias("win_end"),
        )
    )
    wbuckets = wins.select(
        "win_user",
        "win_start",
        "win_end",
        F.explode(
            F.sequence(
                F.date_trunc("HOUR", F.col("win_start")),
                F.date_trunc("HOUR", F.col("win_end")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bkt"),
    )
    pts = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.date_trunc("HOUR", F.col("ts")).alias("bkt"),
    )
    return (
        pts.join(wbuckets, "bkt")
        .filter(
            (F.col("p_ts") >= F.col("win_start"))
            & (F.col("p_ts") <= F.col("win_end"))
        )
        # rolled up per window: the pair enumeration grew ~125× per
        # decade at the fixture's densities (1.5k → 185k rows) while
        # the window relation grows linearly — and a lost pair still
        # hash-mismatches through the counts, so the completeness
        # proof survives the rollup
        .groupBy("win_user", "win_start")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.countDistinct("p_user").cast("bigint").alias("n_buyers"),
        )
        .orderBy("win_user", "win_start")
    )


_register(
    "w_interval_bucket",
    w_interval_bucket,
    """WITH wins AS (
  SELECT user_id AS win_user, date_trunc('day', ts) AS d,
         MIN(ts) AS win_start, MAX(ts) AS win_end
  FROM events WHERE user_id % 50 = 7 AND ts IS NOT NULL
  GROUP BY 1, 2
), pts AS (
  SELECT user_id AS p_user, ts AS p_ts
  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
)
SELECT win_user, win_start,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COUNT(DISTINCT p_user) AS BIGINT) AS n_buyers
FROM wins JOIN pts
  ON p_ts >= win_start AND p_ts <= win_end
GROUP BY win_user, win_start
ORDER BY win_user, win_start""",
)
