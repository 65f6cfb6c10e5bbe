"""TPC-H q2..q22 — the remaining query *shapes*, adapted to the
driver's reduced star schema (no partsupp / commitdate / receiptdate /
shipmode / container columns; see TESTDATA.md). Each query keeps its
TPC-H-distinctive operator structure — correlated arg-min subquery
(q2), EXISTS / NOT-EXISTS (q4, q21, q22), two-sided dimension pairs
(q7), conditional-aggregate ratios (q8, q12, q14), scalar-subquery
HAVING (q11), outer-join histogram (q13), view + arg-max (q15),
distinct-count with NOT IN (q16), correlated AVG threshold (q17),
OR-of-ANDs pushdown (q19), nested semi-joins (q20) — with filters
rewritten to the fixture value domains.

Determinism contract: money math rides exact cents integers
(operators.aggregations.cents / scaled_sum); every double division or
threshold compare is written with the identical operand sequence and
explicit CASTs in the DuckDB twin, so boundary comparisons cannot
diverge between engines (DuckDB parses bare ``0.2`` as DECIMAL, Spark
as double — always cast).

Scale posture: dimensions (part 2k, supplier 100, nation, region) are
broadcast everywhere; the only shuffles are on lineitem/orders join
and group keys. Correlated subqueries are written pre-decorrelated
(aggregate → join back) — the plan Catalyst would target anyway, and
the form that stays shuffle-bounded at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_realtime_data_pipeline_spark.operators.aggregations import (
    cents,
    cents_sql,
    decimal_sum,
    decimal_sum_sql,
    scaled_sum,
    scaled_sum_sql,
)
from f1_realtime_data_pipeline_spark.sources.parquet import read_table

_EC = cents_sql("l_extendedprice")
_DC = cents_sql("l_discount")
_REV_CENTS_SQL = f"({_EC}) * (100 - ({_DC}))"


def _rev_cents():
    return cents("l_extendedprice") * (100 - cents("l_discount"))


QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _register(name, fn, sql):
    QUERIES[name] = fn
    if sql is not None:
        ORACLE[name] = sql


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q2 — minimum-cost supplier (correlated arg-min subquery, decorrelated)
# ---------------------------------------------------------------------------


def tpch_q2(spark, sf_dir):
    """For each LARGE part of size >= 40, the EUROPE supplier with the
    minimum observed unit price (min over lineitem of extprice/qty —
    partsupp stand-in). Shape: per-(part,supp) aggregate → per-part min
    → equality join back (decorrelated correlated subquery), dims
    broadcast, order by acctbal desc."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") >= 40)
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    # r13 (k=100 probe, second-worst TPC-H scaler): push the part
    # predicate INTO the big aggregate as a semi-join — only LARGE
    # size≥40 parts survive the final join anyway, and per-part minima
    # are untouched by dropping other parts' rows, so the (partkey,
    # suppkey) aggregate now shuffles the qualifying slice instead of
    # all of lineitem. Measured at k=100: 52.6 s → 2.5 s (21×).
    cost = (
        li.join(
            F.broadcast(p.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_cost = cost.join(F.broadcast(eu_supp), cost.l_suppkey == eu_supp.s_suppkey)
    min_cost = eu_cost.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost"))
    return (
        eu_cost.join(F.broadcast(min_cost), "l_partkey")
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "min_cost")
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name").asc(), F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(100)
    )


_register(
    "tpch_q2",
    tpch_q2,
    """WITH cost AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eu_cost AS (
  SELECT cost.*, s_name, s_acctbal, n_name
  FROM cost
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), mc AS (
  SELECT l_partkey, MIN(unit_cost) AS min_cost FROM eu_cost GROUP BY l_partkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, min_cost
FROM eu_cost
JOIN mc USING (l_partkey)
JOIN part ON l_partkey = p_partkey
WHERE unit_cost = min_cost AND p_type = 'LARGE' AND p_size >= 40
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100""",
)


# ---------------------------------------------------------------------------
# q4 — order priority checking (EXISTS → left-semi join)
# ---------------------------------------------------------------------------


def tpch_q4(spark, sf_dir):
    """Orders in 1997H1 with at least one returned lineitem, counted by
    priority. EXISTS = left-semi join on orderkey (no duplication from
    multiple matching lines)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-07-01"))
    )
    ret = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(ret, o.o_orderkey == ret.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_register(
    "tpch_q4",
    tpch_q4,
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority""",
)


# ---------------------------------------------------------------------------
# q7 — volume shipping between two nations (two-sided dim pair filter)
# ---------------------------------------------------------------------------


def tpch_q7(spark, sf_dir):
    """Revenue flowing between NATION_1 and NATION_2 (either
    direction), by supplier-nation/customer-nation/ship-year. The OR
    pair predicate rides two broadcast nation joins."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(scaled_sum(_rev_cents(), "revenue", 4))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_register(
    "tpch_q7",
    tpch_q7,
    f"""SELECT supp_nation, cust_nation, l_year,
       {scaled_sum_sql(_REV_CENTS_SQL, "revenue", 4)}
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year""",
)


# ---------------------------------------------------------------------------
# q8 — market share (conditional-aggregate ratio per year)
# ---------------------------------------------------------------------------


def tpch_q8(spark, sf_dir):
    """NATION_3's share of AMERICA-customer ECONOMY-part revenue by
    order year. Numerator = conditional cents sum; the final divide is
    one double op over exact integers."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n_c = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = _rev_cents()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_c), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_s), s.s_nationkey == F.col("sn_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0))).alias(
                "_num"
            ),
            F.sum(rev).alias("_den"),
        )
        .select(
            "o_year",
            (F.col("_num").cast("double") / F.col("_den").cast("double")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


_register(
    "tpch_q8",
    tpch_q8,
    f"""SELECT o_year,
       CAST(_num AS DOUBLE) / CAST(_den AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         SUM(CASE WHEN n2.n_name = 'NATION_3' THEN {_REV_CENTS_SQL} ELSE 0 END) AS _num,
         SUM({_REV_CENTS_SQL}) AS _den
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN part     ON l_partkey = p_partkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY year(o_orderdate)
)
ORDER BY o_year""",
)


# ---------------------------------------------------------------------------
# q9 — product-type profit (expression over two fact-dim measures)
# ---------------------------------------------------------------------------


def tpch_q9(spark, sf_dir):
    """Profit (revenue minus retail cost of goods) on parts named
    '%widget%', by supplier nation and year. Cost stands in for the
    missing ps_supplycost; both terms stay in scale-4 cents so the sum
    is exact."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    n = _t(spark, sf_dir, "nation")
    amount = _rev_cents() - cents("p_retailprice") * cents("l_quantity")
    # r13 (k=100 probe): the selective joins run FIRST — the broadcast
    # part filter (~13% of parts match '%widget%') shrinks lineitem
    # before the one genuinely large join (orders on orderkey), so the
    # big shuffle's probe side carries the qualifying slice instead of
    # every lineitem row. Catalyst doesn't reorder joins without CBO
    # stats; the declared order IS the physical order here.
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(scaled_sum(amount, "sum_profit", 4))
        .orderBy("nation", F.col("o_year").desc())
    )


_AMOUNT_SQL = (
    f"({_REV_CENTS_SQL}) - ({cents_sql('p_retailprice')}) * ({cents_sql('l_quantity')})"
)

_register(
    "tpch_q9",
    tpch_q9,
    f"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       {scaled_sum_sql(_AMOUNT_SQL, "sum_profit", 4)}
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC""",
)


# ---------------------------------------------------------------------------
# q11 — important stock (HAVING against a scalar subquery)
# ---------------------------------------------------------------------------


def tpch_q11(spark, sf_dir):
    """Parts whose NATION_5-supplied revenue exceeds 0.0001 of the
    total. The scalar total is a 1-row broadcast crossjoin; the
    threshold compare casts both sides to double explicitly (DuckDB
    would otherwise compare in DECIMAL)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    part_val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(_rev_cents()).alias("value_cents"))
    )
    total = part_val.agg(F.sum("value_cents").alias("total_cents"))
    return (
        part_val.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_cents").cast("double")
            > F.col("total_cents").cast("double") * F.lit(0.0001)
        )
        .select(
            "l_partkey",
            (F.col("value_cents").cast("double") / F.lit(1e4)).alias("val"),
        )
        .orderBy(F.col("val").desc(), F.col("l_partkey").asc())
    )


_register(
    "tpch_q11",
    tpch_q11,
    f"""WITH part_val AS (
  SELECT l_partkey, SUM({_REV_CENTS_SQL}) AS value_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(value_cents AS DOUBLE) / 10000.0 AS val
FROM part_val
WHERE CAST(value_cents AS DOUBLE) >
      (SELECT CAST(SUM(value_cents) AS DOUBLE) FROM part_val) * CAST(0.0001 AS DOUBLE)
ORDER BY val DESC, l_partkey ASC""",
)


# ---------------------------------------------------------------------------
# q12 — priority-class counts (conditional aggregation over a join)
# ---------------------------------------------------------------------------


def tpch_q12(spark, sf_dir):
    """Lineitems shipped in 1997 split into high/low order priority per
    returnflag — the CASE-WHEN-count shape (shipmode stand-in)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_register(
    "tpch_q12",
    tpch_q12,
    """SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag""",
)


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution (outer join → histogram)
# ---------------------------------------------------------------------------


def tpch_q13(spark, sf_dir):
    """Distribution of per-customer order counts (open orders excluded)
    — left outer join so 0-order customers appear, then a second
    aggregation over the counts."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "P")
    # r13 (k=100 probe): pre-aggregate orders per custkey BEFORE the
    # left join — the map-side-combined groupBy moves ~|customers|
    # rows through the shuffle instead of all of orders through the
    # join (orderkey is never null, so count(*) per custkey + a
    # 0-coalesce for order-less customers is the identical value).
    per_cust_counts = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_cust = c.join(
        per_cust_counts, c.c_custkey == per_cust_counts.o_custkey, "left"
    ).select(F.coalesce("n", F.lit(0)).cast("bigint").alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_register(
    "tpch_q13",
    tpch_q13,
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderstatus <> 'P'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC""",
)


# ---------------------------------------------------------------------------
# q14 — promo revenue share (conditional ratio, LIKE-less variant)
# ---------------------------------------------------------------------------


def tpch_q14(spark, sf_dir):
    """Share of 1997H1 revenue from PROMO parts, as a percentage. Both
    sums are exact cents integers; one double multiply + divide at the
    end."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-07-01"))
    )
    p = _t(spark, sf_dir, "part")
    rev = _rev_cents()
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias("_promo"),
            F.sum(rev).alias("_total"),
        )
        .select(
            (
                F.col("_promo").cast("double") * F.lit(100.0)
                / F.col("_total").cast("double")
            ).alias("promo_revenue")
        )
    )


_register(
    "tpch_q14",
    tpch_q14,
    f"""SELECT CAST(_promo AS DOUBLE) * CAST(100.0 AS DOUBLE) / CAST(_total AS DOUBLE)
         AS promo_revenue
FROM (
  SELECT SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_CENTS_SQL} ELSE 0 END) AS _promo,
         SUM({_REV_CENTS_SQL}) AS _total
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
)""",
)


# ---------------------------------------------------------------------------
# q15 — top supplier (view + arg-max against a scalar)
# ---------------------------------------------------------------------------


def tpch_q15(spark, sf_dir):
    """Supplier(s) with maximum 1997H1 revenue. The max is exact (cents
    bigint) so the equality join cannot flap; revenue view is reused
    for both sides, as the TPC-H view intends."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-07-01"))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev_cents()).alias("rev_cents"))
    mx = rev.agg(F.max("rev_cents").alias("max_cents"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_cents") == F.col("max_cents"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_cents").cast("double") / F.lit(1e4)).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


_register(
    "tpch_q15",
    tpch_q15,
    f"""WITH rev AS (
  SELECT l_suppkey, SUM({_REV_CENTS_SQL}) AS rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev_cents AS DOUBLE) / 10000.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_cents = (SELECT MAX(rev_cents) FROM rev)
ORDER BY s_suppkey""",
)


# ---------------------------------------------------------------------------
# q16 — supplier counts by part attrs (distinct-count + NOT IN)
# ---------------------------------------------------------------------------


def tpch_q16(spark, sf_dir):
    """Distinct suppliers per (brand, type, size) over observed
    supply relationships (lineitem stand-in for partsupp), excluding
    Brand#1, small sizes, and negative-balance suppliers (the NOT IN
    → broadcast anti-join)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size") >= 10)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), F.col("p_brand").asc(), F.col("p_type").asc(),
            F.col("p_size").asc(),
        )
    )


_register(
    "tpch_q16",
    tpch_q16,
    """SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size >= 10
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""",
)


# ---------------------------------------------------------------------------
# q17 — small-quantity revenue (correlated AVG threshold, decorrelated)
# ---------------------------------------------------------------------------


def tpch_q17(spark, sf_dir):
    """Average yearly revenue lost if Brand#2 orders below 20% of that
    part's mean quantity were dropped. The per-part mean is exact-sum /
    count, compared in double with the identical op sequence on both
    engines."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2").select("p_partkey")
    li_p = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    avg_qty = li_p.groupBy("l_partkey").agg(
        (
            F.sum(cents("l_quantity")).cast("double")
            / F.lit(100.0)
            / F.count("*").cast("double")
        ).alias("avg_qty")
    ).select(F.col("l_partkey").alias("ak"), "avg_qty")
    return (
        li_p.join(F.broadcast(avg_qty), li_p.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (
                F.sum(cents("l_extendedprice")).cast("double") / F.lit(100.0) / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


_register(
    "tpch_q17",
    tpch_q17,
    f"""WITH li_p AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#2'
), aq AS (
  SELECT l_partkey AS ak,
         CAST(SUM({cents_sql("l_quantity")}) AS DOUBLE) / CAST(100.0 AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avg_qty
  FROM li_p GROUP BY l_partkey
)
SELECT CAST(SUM({cents_sql("l_extendedprice")}) AS DOUBLE) / CAST(100.0 AS DOUBLE)
         / CAST(7.0 AS DOUBLE) AS avg_yearly
FROM li_p JOIN aq ON l_partkey = ak
WHERE l_quantity < CAST(0.2 AS DOUBLE) * avg_qty""",
)


# ---------------------------------------------------------------------------
# q19 — OR-of-ANDs predicate (disjunctive pushdown)
# ---------------------------------------------------------------------------


def tpch_q19(spark, sf_dir):
    """Revenue under three disjunctive brand/size/quantity clauses —
    the predicate-pushdown stress: the OR tree sits on scan columns of
    both join sides."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    clause = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 11)
        | (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 20)
        & F.col("l_quantity").between(10, 20)
        | (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 30)
        & F.col("l_quantity").between(20, 30)
    )
    return joined.filter(clause).agg(scaled_sum(_rev_cents(), "revenue", 4))


_register(
    "tpch_q19",
    tpch_q19,
    f"""SELECT {scaled_sum_sql(_REV_CENTS_SQL, "revenue", 4)}
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 30)""",
)


# ---------------------------------------------------------------------------
# q20 — excess-supply suppliers (nested semi-join chain)
# ---------------------------------------------------------------------------


def tpch_q20(spark, sf_dir):
    """NATION_7 suppliers who shipped > 50 units of some 'small%' part
    in 1997 — IN(IN(...)) rewritten as aggregate → filter → semi-join
    chain; every intermediate is keyed and broadcastable."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(cents("l_quantity")).alias("qty_cents"))
        .filter(F.col("qty_cents") > 50 * 100)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name")
    )


_register(
    "tpch_q20",
    tpch_q20,
    f"""SELECT s_name, s_suppkey
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM({cents_sql("l_quantity")}) > 5000
  )
ORDER BY s_name""",
)


# ---------------------------------------------------------------------------
# q21 — sole failing supplier (EXISTS + NOT EXISTS, decorrelated)
# ---------------------------------------------------------------------------


def tpch_q21(spark, sf_dir):
    """Suppliers who alone returned goods on a multi-supplier finished
    order. The EXISTS(other supplier) / NOT EXISTS(other R-supplier)
    pair is decorrelated into ONE per-order aggregate — and (r13,
    found by the k=100 decade probe where this was the suite's worst
    scaler) the join-BACK is gone too: an order with exactly one
    distinct R-supplier names that supplier inside the same aggregate
    (``max(when(R, suppkey))`` — max of a singleton set IS the
    element), so the guilty counts come straight off the filtered
    aggregate. One lineitem scan, one orderkey shuffle, one suppkey
    shuffle, where the previous form re-scanned lineitem and shuffled
    it again to rejoin the stats. The orders filter joins WITHOUT a
    broadcast hint: at test scale AQE broadcasts the one-column side
    anyway, at 100 TB a forced broadcast of half of orders would be
    the bug — let the planner pick."""
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    li_f = li.join(o, li.l_orderkey == o.o_orderkey)
    r_supp = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    failing = (
        li_f.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(r_supp).alias("n_supp_r"),
            F.max(r_supp).alias("r_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_supp_r") == 1))
    )
    return (
        failing.groupBy("r_supp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .join(F.broadcast(s), F.col("r_supp") == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


_register(
    "tpch_q21",
    tpch_q21,
    """WITH li_f AS (
  SELECT l_orderkey, l_suppkey, l_returnflag
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), order_stats AS (
  SELECT l_orderkey AS ok,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_supp_r
  FROM li_f GROUP BY l_orderkey
)
SELECT s_name, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS numwait
FROM li_f
JOIN order_stats ON l_orderkey = ok
JOIN supplier ON l_suppkey = s_suppkey
WHERE l_returnflag = 'R' AND n_supp > 1 AND n_supp_r = 1
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100""",
)


# ---------------------------------------------------------------------------
# q22 — global-sales opportunity (NOT EXISTS + scalar AVG subquery)
# ---------------------------------------------------------------------------


def tpch_q22(spark, sf_dir):
    """Rich customers (balance above the positive-balance average) with
    no order since 2000, grouped by nation. Scalar AVG = exact cents
    sum / count; NOT EXISTS = anti-join on custkey. (Unscoped "never
    ordered" is vacuous on the fixtures — every customer orders — so
    the date scope keeps the anti-join discriminating.)"""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(cents("c_acctbal")).cast("double")
            / F.lit(100.0)
            / F.count("*").cast("double")
        ).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            decimal_sum("c_acctbal", "totacctbal"),
        )
        .orderBy("nationkey")
    )


_register(
    "tpch_q22",
    tpch_q22,
    f"""SELECT c_nationkey AS nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       {decimal_sum_sql("c_acctbal", "totacctbal")}
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM({cents_sql("c_acctbal")}) AS DOUBLE) / CAST(100.0 AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE)
    FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY nationkey""",
)
