"""Declarative data-quality constraint audit (r16, session 2).

The operational gate every production ingest runs between "files
landed" and "table served" (the reference pipeline loads Kafka rows
straight into Postgres with no validation pass —
/root/reference/spark_ingestion.py:116-125; this is the stage it
skips). Shape follows the Deequ/Great-Expectations model: a fixed
set of DECLARED constraints evaluated in as few passes as possible,
emitted as one small relation ``(check_name, n_checked,
n_violations, passed)`` that a scheduler can gate on.

Constraint classes covered (one representative each, all
engine-exact):

- completeness      — NULL count on a required column;
- uniqueness        — duplicate-key volume via count-distinct delta;
- referential       — orphan FK rows (anti-join to the dim's keys);
- range             — non-positive money values;
- set membership    — status outside the declared domain;
- pattern           — priority strings failing the ``N-WORD`` regex.

Scale posture: the five single-table checks fold into ONE conditional
aggregation over one scan of orders (count-distinct is the only
shuffle; everything else is a map-side conditional sum). The
referential check is a broadcast anti-join count against the
customer key set — at 100 TB the dim side is the small side by
construction, so nothing here adds a fact-side shuffle. Output is
|checks| rows regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_realtime_data_pipeline_spark.sources.parquet import read_table

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _register(name, fn, sql):
    QUERIES[name] = fn
    if sql is not None:
        ORACLE[name] = sql


#: declared domain for o_orderstatus (TPC-H) and the priority pattern
DQ_STATUS_DOMAIN = ("O", "F", "P")
DQ_PRIORITY_RE = "^[1-5]-[A-Z]+$"


def p_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-constraint audit over orders (+ customer for the FK check).
    Single-scan conditional aggregation for the five intra-table
    constraints; broadcast anti-join for the orphan count."""
    o = read_table(spark, sf_dir, "orders")
    n_rows = F.count(F.lit(1))

    def viol(cond):
        # COALESCE 0: SUM over an EMPTY table is NULL in both engines,
        # and the passed flag would go NULL in Spark but 0 under the
        # oracle's CASE — the contract is that an empty table PASSES
        # every check (0 checked, 0 violations).
        return F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))

    single = o.agg(
        n_rows.alias("n"),
        viol(F.col("o_custkey").isNull()).alias("v_complete"),
        (n_rows - F.countDistinct("o_orderkey")).alias("v_unique"),
        viol(F.col("o_totalprice") <= 0).alias("v_range"),
        viol(~F.col("o_orderstatus").isin(*DQ_STATUS_DOMAIN)).alias("v_set"),
        viol(
            ~F.col("o_orderpriority").rlike(DQ_PRIORITY_RE)
            | F.col("o_orderpriority").isNull()
        ).alias("v_pattern"),
    )
    custkeys = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    orphans = (
        o.select("o_custkey")
        .filter(F.col("o_custkey").isNotNull())
        .join(F.broadcast(custkeys), "o_custkey", "anti")
        .agg(F.count(F.lit(1)).alias("v_ref"))
    )
    wide = single.crossJoin(F.broadcast(orphans))
    checks = [
        ("completeness_custkey", "v_complete"),
        ("pattern_priority", "v_pattern"),
        ("range_totalprice_pos", "v_range"),
        ("referential_custkey", "v_ref"),
        ("set_orderstatus", "v_set"),
        ("unique_orderkey", "v_unique"),
    ]
    parts = [
        wide.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("bigint").alias("n_checked"),
            F.col(col).cast("bigint").alias("n_violations"),
            (F.col(col) == 0).cast("int").alias("passed"),
        )
        for name, col in checks
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("check_name")


_register(
    "p_dq_checks",
    p_dq_checks,
    """WITH base AS (
  SELECT COUNT(*) AS n,
         COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END),
                  0) AS v_complete,
         COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_unique,
         COALESCE(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END),
                  0) AS v_range,
         COALESCE(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                           THEN 1 ELSE 0 END), 0) AS v_set,
         COALESCE(SUM(CASE WHEN o_orderpriority IS NULL
                            OR NOT regexp_matches(o_orderpriority,
                                                  '^[1-5]-[A-Z]+$')
                           THEN 1 ELSE 0 END), 0) AS v_pattern
  FROM orders
), ref AS (
  SELECT COUNT(*) AS v_ref
  FROM orders o
  WHERE o.o_custkey IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM customer c
                    WHERE c.c_custkey = o.o_custkey)
), wide AS (
  SELECT * FROM base CROSS JOIN ref
), checks AS (
  SELECT 'completeness_custkey' AS check_name, n, v_complete AS v FROM wide
  UNION ALL
  SELECT 'pattern_priority', n, v_pattern FROM wide
  UNION ALL
  SELECT 'range_totalprice_pos', n, v_range FROM wide
  UNION ALL
  SELECT 'referential_custkey', n, v_ref FROM wide
  UNION ALL
  SELECT 'set_orderstatus', n, v_set FROM wide
  UNION ALL
  SELECT 'unique_orderkey', n, v_unique FROM wide
)
SELECT check_name,
       CAST(n AS BIGINT) AS n_checked,
       CAST(v AS BIGINT) AS n_violations,
       CAST(CASE WHEN v = 0 THEN 1 ELSE 0 END AS INT) AS passed
FROM checks ORDER BY check_name""",
)
