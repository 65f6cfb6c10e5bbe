"""CDF consumption extension (built r14, registered r15).

Round 13 put the manifest's change-data-feed PRODUCTION side under
the driver (``cdc_row_diff``: insert/delete/update classification;
``o_compaction_exec``: the maintenance lifecycle). Round 14 added the
consumption API — ``sources.manifest.read_row_diff_images`` returns
update PRE-images beside the three frames — and proved delta
maintenance end-to-end in pytest. This module registers the two
CONSUMPTION queries the staging note promised for r15:

- :func:`cdc_row_images` — the full four-frame image set under the
  value oracle (the pre-image frame is what r13's ``cdc_row_diff``
  could not show);
- :func:`cdc_incremental_agg` — the reason pre-images exist:
  a per-group (count, exact decimal sum) aggregate MAINTAINED from
  the v1 aggregate plus sign-weighted image deltas (+insert,
  +update_post, −update_pre, −delete), never re-reading v1's rows.
  The oracle recomputes the final state directly from the source
  table, so a mis-signed frame, a dropped group, or a double-counted
  update all surface as value mismatches.

Change script shared with ``cdc_row_diff`` (one source of the residue
classes — the constants below): a deterministic orders slice, class 4
inserted by MERGE, class 2 updated in place (+1.0 — exact IEEE at
fixture magnitudes), class 0 deleted, classes {1,3} carried over.

REGISTERED in r15 (``_QUERY_MODULES``), debuting inside the driver
window per the staging plan; parity also pinned by
tests/test_cdf_ext.py.

TOOLING WARNING (inherited from ``_scratch_table_dir``): merely
BUILDING ``cdc_row_images`` / ``cdc_incremental_agg`` executes the
full write/merge/delete lifecycle — do not add them to plan-building
tools (plan_audit's AUDIT list) without expecting side effects.
``p_table_checksum`` below is side-effect-free.

Scale posture: identical to cdc_row_diff — the lifecycle cost is the
committed writes; the diff itself is two snapshot reads at ANY table
size (cost ∝ the snapshots, never the history), and the maintenance
path reads only the images (cost ∝ the CHANGE volume — the entire
point of incremental aggregate maintenance at 100 TB: a 0.1% daily
delta updates the aggregate for 0.1% of the scan cost).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_realtime_data_pipeline_spark.operators.aggregations import (
    DECIMAL_ACC,
    cents,
    cents_sql,
)
from f1_realtime_data_pipeline_spark.sources.parquet import read_table

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _register(name, fn, sql):
    QUERIES[name] = fn
    if sql is not None:
        ORACLE[name] = sql


def _build_cdc_table(spark: SparkSession, sf_dir: str, prefix: str):
    """The cdc_row_diff change script — resolved through the shared
    build-once-per-(app, sf_dir) table (VERDICT r15 #3: the four cdc_*
    consumers previously each re-ran the write/merge/delete lifecycle
    at plan-construction time, ~23 s of duplicated fixture IO per
    bench run). The script is write-once/read-many, so every consumer
    reads bit-identical snapshots. ``prefix`` is retained for call-site
    readability only. Returns (table_path, v1, src). See
    cdc_row_diff's docstring for why the mutation is +1.0 and the dir
    is uuid-keyed."""
    from f1_realtime_data_pipeline_spark.plans.inventory_star import (
        shared_cdc_table,
    )

    return shared_cdc_table(spark, sf_dir)


def _images(spark, table, v1):
    from f1_realtime_data_pipeline_spark.sources import manifest as mf

    ins, dele, upre, upost = mf.read_row_diff_images(
        spark, table, v1, keys=["o_orderkey"]
    )
    return (
        (ins, "insert"),
        (dele, "delete"),
        (upre, "update_pre"),
        (upost, "update_post"),
    )


def cdc_row_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four-frame CDF image set, labeled. vs cdc_row_diff: the
    update PRE-image frame (original price, key present in both
    snapshots) is the addition — a delta consumer subtracts it."""
    table, v1, src = _build_cdc_table(spark, sf_dir, "cdfimg")
    parts = [
        df.withColumn("change_type", F.lit(tag))
        for df, tag in _images(spark, table, v1)
        if df is not None
    ]
    if not parts:
        return src.limit(0).withColumn("change_type", F.lit("insert"))
    out = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), parts)
    return out.select(
        "o_orderkey", "o_orderpriority", "o_totalprice", "change_type"
    )


_register(
    "cdc_row_images",
    cdc_row_images,
    """WITH src AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice
  FROM orders WHERE o_custkey % 10 = 3
)
SELECT o_orderkey, o_orderpriority, o_totalprice, 'insert' AS change_type
FROM src WHERE o_orderkey % 5 = 4
UNION ALL
SELECT o_orderkey, o_orderpriority, o_totalprice, 'delete' AS change_type
FROM src WHERE o_orderkey % 5 = 0
UNION ALL
SELECT o_orderkey, o_orderpriority, o_totalprice, 'update_pre' AS change_type
FROM src WHERE o_orderkey % 5 = 2
UNION ALL
SELECT o_orderkey, o_orderpriority, o_totalprice + 1 AS o_totalprice,
       'update_post' AS change_type
FROM src WHERE o_orderkey % 5 = 2""",
)


def cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority (count, exact decimal sum) MAINTAINED from the v1
    aggregate + sign-weighted image deltas — v1's rows are never
    re-read after their one aggregation. Groups whose maintained
    count reaches zero are dropped (the direct aggregate has no such
    row). Sums accumulate in DECIMAL (order-free), emitted as double
    — the decimal_sum contract."""
    from f1_realtime_data_pipeline_spark.sources import manifest as mf

    table, v1, _src = _build_cdc_table(spark, sf_dir, "cdfagg")

    def agg(df, sign):
        return df.groupBy("o_orderpriority").agg(
            (F.count(F.lit(1)) * sign).alias("dn"),
            (F.sum(F.col("o_totalprice").cast(DECIMAL_ACC)) * sign).alias("ds"),
        )

    # v1 == 0 means nothing was ever committed (resolve_snapshot's
    # (0, []) contract — an EMPTY source slice: the empty and onerow
    # robustness axes both produce it): maintain from an empty base
    # instead of time-traveling to a version that never existed.
    snap = mf.read_snapshot(spark, table, version=v1) if v1 else None
    base = agg(snap if snap is not None else _src.limit(0), 1)
    signs = {"insert": 1, "delete": -1, "update_pre": -1, "update_post": 1}
    deltas = [
        agg(df, signs[tag])
        for df, tag in _images(spark, table, v1)
        if df is not None
    ]
    merged = reduce(lambda a, b: a.unionByName(b), [base, *deltas])
    return (
        merged.groupBy("o_orderpriority")
        .agg(
            F.sum("dn").cast("bigint").alias("n_orders"),
            F.sum("ds").cast("double").alias("sum_price"),
        )
        .filter(F.col("n_orders") > 0)
        .orderBy("o_orderpriority")
    )


_register(
    "cdc_incremental_agg",
    cdc_incremental_agg,
    """WITH src AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice
  FROM orders WHERE o_custkey % 10 = 3
), final AS (
  SELECT o_orderpriority, o_totalprice FROM src WHERE o_orderkey % 5 IN (1, 3)
  UNION ALL
  SELECT o_orderpriority, o_totalprice + 1 FROM src WHERE o_orderkey % 5 = 2
  UNION ALL
  SELECT o_orderpriority, o_totalprice FROM src WHERE o_orderkey % 5 = 4
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS sum_price
FROM final GROUP BY o_orderpriority ORDER BY o_orderpriority""",
)


def cdc_incremental_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority (count, MAX price) maintained from images — the
    aggregate family ``cdc_incremental_agg`` deliberately does NOT
    cover, because MAX is not delta-maintainable under removals: a
    delete or update_pre that removes the current extremum cannot be
    "subtracted" from the old MAX. The production IVM discipline,
    implemented here:

    - groups touched ONLY by additive frames (insert, update_post)
      maintain incrementally: new_max = greatest(v1_max, adds_max) —
      v1's rows never re-read;
    - groups touched by ANY removal frame (delete, update_pre)
      RECOMPUTE from the current snapshot — but only those groups,
      via a semi-join pushdown (at 100 TB with a partitioned table,
      partition pruning makes this read ∝ the affected groups' rows,
      never the table);
    - counts maintain exactly for every group (the sign trick), and
      zero-count groups drop.

    ``recomputed_group`` exposes WHICH path each output row took, so
    the path split itself sits under the value oracle — a bug that
    recomputes everything, or nothing, hash-mismatches even when the
    values happen to agree. The grouping key is the change script's
    own residue class (``o_orderkey % 5``) DELIBERATELY: grouping by
    priority would put a removal in every group and leave the
    incremental path dead under the oracle; cohort grouping gives
    every maintenance path its own output row — cohorts 1/3 purely
    incremental from v1 (untouched), cohort 4 additive-only
    (inserts), cohort 2 recomputed (updates), cohort 0 dropped
    (all deleted)."""
    from f1_realtime_data_pipeline_spark.sources import manifest as mf

    table, v1, _src = _build_cdc_table(spark, sf_dir, "cdfmm")
    ck = F.pmod(F.col("o_orderkey"), F.lit(5)).cast("int").alias(
        "change_cohort"
    )
    snap = mf.read_snapshot(spark, table, version=v1) if v1 else None
    base = (snap if snap is not None else _src.limit(0)).groupBy(ck).agg(
        F.max("o_totalprice").alias("v1_max"),
        F.count(F.lit(1)).cast("bigint").alias("v1_n"),
    )
    frames = dict((tag, df) for df, tag in _images(spark, table, v1))
    empty = _src.limit(0)
    adds = (
        (frames.get("insert") or empty)
        .unionByName(frames.get("update_post") or empty)
        .groupBy(ck)
        .agg(
            F.max("o_totalprice").alias("add_max"),
            F.count(F.lit(1)).cast("bigint").alias("a_n"),
        )
    )
    rems = (
        (frames.get("delete") or empty)
        .unionByName(frames.get("update_pre") or empty)
        .groupBy(ck)
        .agg(F.count(F.lit(1)).cast("bigint").alias("r_n"))
    )
    # recompute ONLY the removal-affected groups, from the current
    # snapshot, group-pruned by the semi join
    cur = mf.read_snapshot(spark, table)
    recomputed = (
        (cur if cur is not None else empty)
        .select(ck, "o_totalprice")
        .join(
            F.broadcast(rems.select("change_cohort")),
            "change_cohort",
            "semi",
        )
        .groupBy("change_cohort")
        .agg(F.max("o_totalprice").alias("re_max"))
    )
    merged = (
        base.join(adds, "change_cohort", "full_outer")
        .join(rems, "change_cohort", "full_outer")
        .join(recomputed, "change_cohort", "full_outer")
    )
    return (
        merged.select(
            "change_cohort",
            (
                F.coalesce("v1_n", F.lit(0))
                + F.coalesce("a_n", F.lit(0))
                - F.coalesce("r_n", F.lit(0))
            ).cast("bigint").alias("n_orders"),
            F.when(F.col("r_n").isNotNull(), F.col("re_max"))
            .otherwise(F.greatest("v1_max", "add_max"))
            .cast("double")
            .alias("max_price"),
            F.when(F.col("r_n").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("recomputed_group"),
        )
        .filter(F.col("n_orders") > 0)
        .orderBy("change_cohort")
    )


_register(
    "cdc_incremental_minmax",
    cdc_incremental_minmax,
    """WITH src AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice
  FROM orders WHERE o_custkey % 10 = 3
), final AS (
  SELECT o_orderkey % 5 AS change_cohort, o_totalprice
  FROM src WHERE o_orderkey % 5 IN (1, 3)
  UNION ALL
  SELECT o_orderkey % 5 AS change_cohort, o_totalprice + 1
  FROM src WHERE o_orderkey % 5 = 2
  UNION ALL
  SELECT o_orderkey % 5 AS change_cohort, o_totalprice
  FROM src WHERE o_orderkey % 5 = 4
)
SELECT CAST(change_cohort AS INT) AS change_cohort,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
       CAST(CASE WHEN change_cohort = 2 THEN 1 ELSE 0 END AS INT)
           AS recomputed_group
FROM final GROUP BY change_cohort ORDER BY change_cohort""",
)


# ---------------------------------------------------------------------------
# order-free table checksum (snapshot validation)
#
# The operational companion of the CDC/diff surface: after a
# migration, a compaction, a CDF-maintained replica, or an engine
# swap, "are these two tables the same?" must not cost a sort or a
# row-by-row join. The standard answer is a COMMUTATIVE per-row hash
# fold — order-free, partition-free, incrementally recomputable per
# group. Two independent folds are kept because each is blind to a
# failure class the other catches: XOR cancels on any row appearing
# an EVEN number of times (a doubled+dropped pair is invisible), the
# modular SUM doesn't; the SUM alone is weaker per-bit, XOR isn't.
# Row hash = the md5-60bit house primitive over an explicit
# '|'-separated rendering, with the money column rendered through the
# exact cents integer (raw double→string formatting differs between
# engines — the rendering contract IS the checksum contract, stated
# here: key, cents, status, priority).
# ---------------------------------------------------------------------------

#: modulus for the additive fold: sums of 2^31-bounded terms stay in
#: BIGINT headroom to ~4·10^9 rows per group
CHECKSUM_MOD = 2**31


def p_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority order-free checksum of orders: row count + XOR
    fold + modular-sum fold over the 60-bit row hash."""
    o = read_table(spark, sf_dir, "orders")
    render = F.concat_ws(
        "|",
        F.col("o_orderkey"),
        cents("o_totalprice"),
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
    )
    h = F.conv(F.substring(F.md5(render), 1, 15), 16, 10).cast("bigint")
    return (
        o.select("o_orderpriority", h.alias("h"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.expr("bit_xor(h)").cast("bigint").alias("xor_hash"),
            F.expr(f"sum(h % {CHECKSUM_MOD})").cast("bigint").alias("sum_mod"),
        )
        .orderBy("o_orderpriority")
    )


_register(
    "p_table_checksum",
    p_table_checksum,
    f"""WITH h AS (
  SELECT o_orderpriority,
         CAST('0x' || substr(md5(concat_ws('|',
              o_orderkey, {cents_sql('o_totalprice')},
              o_orderstatus, o_orderpriority)), 1, 15) AS BIGINT) AS h
  FROM orders
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(h) AS BIGINT) AS xor_hash,
       CAST(SUM(h % {CHECKSUM_MOD}) AS BIGINT) AS sum_mod
FROM h GROUP BY o_orderpriority ORDER BY o_orderpriority""",
)
