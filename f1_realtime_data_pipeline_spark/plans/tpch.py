"""TPC-H-style headline queries over the driver's star schema.

These are the engine's throughput workload (bench.py) and the
multi-join / multi-agg stress surface beyond the reference's four
serving queries. Adapted to the columns the driver's tables actually
have (FIXTURES.md §B); dates fit the generated 1995-2001 range.

Scale posture per query is noted in its docstring; common to all:
double sums go through the exact-decimal route
(``operators.aggregations``) so results are shuffle-order-independent
and oracle-stable; small dimensions are broadcast; filters sit directly
on scan columns so Catalyst pushes them into the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_realtime_data_pipeline_spark.operators.aggregations import (
    DECIMAL_ACC,
    cents,
    cents_sql,
    decimal_avg,
    decimal_avg_sql,
    decimal_sum,
    decimal_sum_sql,
    scaled_sum,
    scaled_sum_sql,
)

# exact cents-integer building blocks shared by the money expressions
# (see operators.aggregations.cents — keeps products bit-identical to
# the oracle, unlike rounding double products into decimals)
_EC = cents_sql("l_extendedprice")
_DC = cents_sql("l_discount")
_TC = cents_sql("l_tax")
_REV_CENTS_SQL = f"({_EC}) * (100 - ({_DC}))"
_CHARGE_CENTS_SQL = f"({_REV_CENTS_SQL}) * (100 + ({_TC}))"


def _rev_cents():
    return cents("l_extendedprice") * (100 - cents("l_discount"))


from f1_realtime_data_pipeline_spark.sources.parquet import read_table  # noqa: E402

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _register(name, fn, sql):
    QUERIES[name] = fn
    if sql is not None:
        ORACLE[name] = sql


def tpch_q1(spark, sf_dir):
    """Pricing summary report. One scan of lineitem, map-side partial
    aggregation into 4 groups — shuffle is 4 rows per partition."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    disc_cents = _rev_cents()
    charge_cents = disc_cents * (100 + cents("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            decimal_sum("l_quantity", "sum_qty"),
            decimal_sum("l_extendedprice", "sum_base_price"),
            scaled_sum(disc_cents, "sum_disc_price", 4),
            scaled_sum(charge_cents, "sum_charge", 6),
            decimal_avg("l_quantity", "avg_qty"),
            decimal_avg("l_extendedprice", "avg_price"),
            decimal_avg("l_discount", "avg_disc"),
            F.count("*").cast("bigint").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_register(
    "tpch_q1",
    tpch_q1,
    f"""SELECT l_returnflag, l_linestatus,
       {decimal_sum_sql("l_quantity", "sum_qty")},
       {decimal_sum_sql("l_extendedprice", "sum_base_price")},
       {scaled_sum_sql(_REV_CENTS_SQL, "sum_disc_price", 4)},
       {scaled_sum_sql(_CHARGE_CENTS_SQL, "sum_charge", 6)},
       {decimal_avg_sql("l_quantity", "avg_qty")},
       {decimal_avg_sql("l_extendedprice", "avg_price")},
       {decimal_avg_sql("l_discount", "avg_disc")},
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""",
)


def tpch_q3(spark, sf_dir):
    """Shipping-priority: 3-way join, customer side broadcast after its
    segment filter; lineitem⋈orders is the one real shuffle (AQE may
    still broadcast the filtered orders side at test scale)."""
    cutoff = "1998-06-15"
    c = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit(cutoff))
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit(cutoff))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(scaled_sum(_rev_cents(), "revenue", 4))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


_register(
    "tpch_q3",
    tpch_q3,
    f"""SELECT o_orderkey, o_orderdate,
       {scaled_sum_sql(_REV_CENTS_SQL, "revenue", 4)}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-06-15 00:00:00'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10""",
)


def tpch_q5(spark, sf_dir):
    """Local-supplier volume: 6-way join. region/nation/supplier are
    broadcast; the customer⋈orders⋈lineitem chain shuffles on the join
    keys; the c_nationkey = s_nationkey condition rides the lineitem
    join as a post-filter."""
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = read_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = read_table(spark, sf_dir, "supplier")
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(scaled_sum(_rev_cents(), "revenue", 4))
    )


_register(
    "tpch_q5",
    tpch_q5,
    f"""SELECT n_name,
       {scaled_sum_sql(_REV_CENTS_SQL, "revenue", 4)}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name""",
)


def tpch_q6(spark, sf_dir):
    """Forecast-revenue change: scan + tight filter + single global sum.
    The whole query is one codegen'd stage; filters push to parquet."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
        & F.col("l_discount").between(0.03, 0.05)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(scaled_sum(cents("l_extendedprice") * cents("l_discount"), "revenue", 4))


_register(
    "tpch_q6",
    tpch_q6,
    f"""SELECT {scaled_sum_sql(f"({_EC}) * ({_DC})", "revenue", 4)}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24""",
)


def tpch_q10(spark, sf_dir):
    """Returned-item reporting: top-20 customers by lost revenue.
    customer/nation broadcast; lineitem⋈orders shuffles; top-k is
    TakeOrderedAndProject with an explicit key tie-break."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-07-01"))
    )
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(scaled_sum(_rev_cents(), "revenue", 4))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


_register(
    "tpch_q10",
    tpch_q10,
    f"""SELECT c_custkey, c_name, n_name,
       {scaled_sum_sql(_REV_CENTS_SQL, "revenue", 4)}
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20""",
)


def tpch_q18(spark, sf_dir):
    """Large-volume customers: HAVING over an aggregate, then join back.
    The qualifying-orders set is small → broadcast back against orders;
    the exact-decimal HAVING threshold avoids FP boundary flapping."""
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DECIMAL_ACC)).alias("qty_acc"))
        .filter(F.col("qty_acc") > 150)
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            F.col("qty_acc").cast("double").alias("sum_qty"),
        )
    )
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(big), "o_orderkey")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


_register(
    "tpch_q18",
    tpch_q18,
    """WITH big AS (
  SELECT l_orderkey AS o_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(30,4))) > 150
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders JOIN big USING (o_orderkey)
JOIN customer ON o_custkey = c_custkey""",
)
