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

    # the FK flag folds into the same scan: broadcast-left-join the
    # dim's key set, then every constraint is one conditional sum in
    # ONE aggregation over ONE pass of orders (+ the customer scan) —
    # the separate anti-join branch re-read orders a second time
    custkeys = (
        read_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("o_custkey"))
        .distinct()
        .withColumn("__ref", F.lit(1))
    )
    flagged = o.join(F.broadcast(custkeys), "o_custkey", "left")
    wide = flagged.agg(
        n_rows.alias("n"),
        viol(F.col("o_custkey").isNull()).alias("v_complete"),
        (n_rows - F.countDistinct("o_orderkey")).alias("v_unique"),
        viol(F.col("o_totalprice") <= 0).alias("v_range"),
        viol(~F.col("o_orderstatus").isin(*DQ_STATUS_DOMAIN)).alias("v_set"),
        viol(
            ~F.col("o_orderpriority").rlike(DQ_PRIORITY_RE)
            | F.col("o_orderpriority").isNull()
        ).alias("v_pattern"),
        viol(
            F.col("o_custkey").isNotNull() & F.col("__ref").isNull()
        ).alias("v_ref"),
    )
    checks = [
        ("completeness_custkey", "v_complete"),
        ("pattern_priority", "v_pattern"),
        ("range_totalprice_pos", "v_range"),
        ("referential_custkey", "v_ref"),
        ("set_orderstatus", "v_set"),
        ("unique_orderkey", "v_unique"),
    ]
    # pivot the 1-row wide relation to |checks| rows with ONE explode —
    # a UNION of per-check selects re-executes the whole aggregation
    # (18 parquet scans for a 2-scan audit, measured in plan_audit)
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col("n").cast("bigint").alias("n_checked"),
                F.col(col).cast("bigint").alias("n_violations"),
            )
            for name, col in checks
        ]
    )
    return (
        wide.select(F.explode(entries).alias("x"))
        .select("x.*")
        .withColumn("passed", (F.col("n_violations") == 0).cast("int"))
        .orderBy("check_name")
    )


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


#: k-anonymity threshold and l-diversity minimum for the audit
KANON_K = 10
LDIV_L = 2


def p_kanon_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the customer table — the
    privacy gate a training-data release runs before shipping rows
    that carry quasi-identifiers. Equivalence classes are the
    (nationkey, mktsegment) QI combinations; the sensitive attribute
    is the account-balance sign. A class re-identifies when its size
    is below k (= KANON_K) and leaks when every member shares one
    sensitive value (distinct < LDIV_L — homogeneity attack). One
    aggregation; output is |QI domain| rows at any table size, so the
    audit is a map-side-combining groupBy with no scale hazard."""
    c = read_table(spark, sf_dir, "customer")
    return (
        c.groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("class_size"),
            F.countDistinct(
                F.when(F.col("c_acctbal") >= 0, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("distinct_sensitive"),
        )
        .withColumn(
            "meets_k", (F.col("class_size") >= KANON_K).cast("int")
        )
        .withColumn(
            "meets_l", (F.col("distinct_sensitive") >= LDIV_L).cast("int")
        )
        .orderBy("nationkey", "mktsegment")
    )


_register(
    "p_kanon_audit",
    p_kanon_audit,
    f"""SELECT c_nationkey AS nationkey,
       c_mktsegment AS mktsegment,
       CAST(COUNT(*) AS BIGINT) AS class_size,
       CAST(COUNT(DISTINCT CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS distinct_sensitive,
       CAST(CASE WHEN COUNT(*) >= {KANON_K} THEN 1 ELSE 0 END AS INT)
           AS meets_k,
       CAST(CASE WHEN COUNT(DISTINCT CASE WHEN c_acctbal >= 0
                                          THEN 1 ELSE 0 END) >= {LDIV_L}
                 THEN 1 ELSE 0 END AS INT) AS meets_l
FROM customer
GROUP BY c_nationkey, c_mktsegment
ORDER BY nationkey, mktsegment""",
)
