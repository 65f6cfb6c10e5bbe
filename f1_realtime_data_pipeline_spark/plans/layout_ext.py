"""Data-layout & diagnostics surface (round 3): Z-order clustering
keys and join-key skew profiling — the table-layout tooling a 100 TB
deployment runs before choosing partitioning/bucketing, expressed as
ordinary oracle-checked queries over ``lineitem``.

Same contract as the other plan modules: DuckDB twin per query,
identical aliases, integer-exact arithmetic (bit ops and counts only —
nothing transcendental).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from f1_realtime_data_pipeline_spark.sources.parquet import read_table

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _register(name, fn, sql):
    QUERIES[name] = fn
    if sql is not None:
        ORACLE[name] = sql


#: bits interleaved per dimension (16+16 → a 32-bit Z value) and the
#: number of layout buckets the Z range is carved into
Z_BITS = 16
Z_BUCKETS = 64


def _morton(a, b):
    """Interleave the low Z_BITS of two ints: bit i of ``a`` lands at
    position 2i, of ``b`` at 2i+1. Plain shift/mask arithmetic — the
    same expression renders in both engines, so the layout key is
    oracle-exact."""
    z = F.lit(0).cast("bigint")
    for i in range(Z_BITS):
        z = (
            z
            + (F.shiftright(a, i).bitwiseAND(F.lit(1))).cast("bigint")
            * F.lit(1 << (2 * i)).cast("bigint")
            + (F.shiftright(b, i).bitwiseAND(F.lit(1))).cast("bigint")
            * F.lit(1 << (2 * i + 1)).cast("bigint")
        )
    return z


def _morton_sql(a: str, b: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({a} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({b} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def o_zorder_layout(spark, sf_dir):
    """Z-order (Morton) layout audit for ``lineitem`` clustered on
    (l_orderkey, l_partkey): interleave the low 16 bits of both keys,
    carve the Z range into ``Z_BUCKETS`` equal slices, and report each
    slice's min/max of BOTH dimensions plus its row count.

    Why this is a 100 TB operator: writing the table sorted by the Z
    value gives every file a narrow min/max envelope in EVERY
    interleaved dimension simultaneously — so parquet min/max skipping
    prunes scans for predicates on l_orderkey OR l_partkey, which a
    single-column sort only achieves for its leading column. The audit
    query is what you run to validate the envelope quality before
    committing the layout. Map-only except the final
    ``Z_BUCKETS``-row rollup.
    """
    li = read_table(spark, sf_dir, "lineitem")
    # scale each dimension to the full Z_BITS range from its OWN
    # min/max (a lazy 1-row aggregate broadcast into the plan, like
    # the similarity module's corpus-derived cell counts) — raw keys
    # occupy only their low bits, which would collapse the Z range and
    # leave most buckets empty at small SF
    rng = F.broadcast(
        li.agg(
            F.min("l_orderkey").alias("__ok_min"),
            F.max("l_orderkey").alias("__ok_max"),
            F.min("l_partkey").alias("__pk_min"),
            F.max("l_partkey").alias("__pk_max"),
        )
    )
    def scaled(col, lo, hi):
        # exact INTEGER floor division (r7 review): the earlier
        # subtract-modulo-then-double-divide form was exact only while
        # (key-min)·65535 stayed under 2^53 — true at fixture scale,
        # false at the 100 TB posture this module claims (TPC-H
        # orderkeys reach ~6e11 there; a rounded quotient shifts the
        # Morton bucket off the oracle's exact `//`). Column.__div__
        # has no integer form, so route through F.expr's DIV — 64-bit
        # exact end-to-end, the same fix read_events documents for
        # nanosecond epochs; operands are non-negative (col ≥ lo by
        # construction), where Spark DIV ≡ DuckDB `//`.
        span = f"GREATEST({hi} - {lo}, CAST(1 AS BIGINT))"
        num = f"(({col} - {lo}) * {(1 << Z_BITS) - 1})"
        return F.expr(f"CAST(({num}) DIV ({span}) AS INT)")

    with_rng = li.crossJoin(rng)
    a = scaled("l_orderkey", "__ok_min", "__ok_max")
    b = scaled("l_partkey", "__pk_min", "__pk_max")
    z = _morton(a, b)
    # z * Z_BUCKETS / 2^(2*Z_BITS) with power-of-two operands = a shift
    bucket = F.shiftright(z, 2 * Z_BITS - Z_BUCKETS.bit_length() + 1).cast("int")
    return (
        with_rng.select(
            bucket.alias("z_bucket"),
            F.col("l_orderkey").alias("ok"),
            F.col("l_partkey").alias("pk"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("ok").cast("bigint").alias("min_orderkey"),
            F.max("ok").cast("bigint").alias("max_orderkey"),
            F.min("pk").cast("bigint").alias("min_partkey"),
            F.max("pk").cast("bigint").alias("max_partkey"),
        )
    )


_A_SCALED = (
    f"(((l_orderkey - ok_min) * {(1 << Z_BITS) - 1})"
    f" // GREATEST(ok_max - ok_min, 1))"
)
_B_SCALED = (
    f"(((l_partkey - pk_min) * {(1 << Z_BITS) - 1})"
    f" // GREATEST(pk_max - pk_min, 1))"
)

_register(
    "o_zorder_layout",
    o_zorder_layout,
    f"""WITH rng AS (
  SELECT MIN(l_orderkey) AS ok_min, MAX(l_orderkey) AS ok_max,
         MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max
  FROM lineitem
), z AS (
  SELECT CAST({_morton_sql(_A_SCALED, _B_SCALED)}
              >> {2 * Z_BITS - Z_BUCKETS.bit_length() + 1} AS INT) AS z_bucket,
         l_orderkey, l_partkey
  FROM lineitem CROSS JOIN rng
)
SELECT z_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(l_orderkey) AS BIGINT) AS min_orderkey,
       CAST(MAX(l_orderkey) AS BIGINT) AS max_orderkey,
       CAST(MIN(l_partkey) AS BIGINT) AS min_partkey,
       CAST(MAX(l_partkey) AS BIGINT) AS max_partkey
FROM z
GROUP BY z_bucket""",
)


#: heavy hitters reported by the skew profile
SKEW_TOP_K = 5


def p_skew_profile(spark, sf_dir):
    """Join-key skew profile for ``lineitem.l_orderkey``: total rows,
    distinct keys, max group size, and the ``SKEW_TOP_K`` heaviest
    keys with their share of the table — the diagnostic that decides
    between a plain shuffle join, AQE skew handling, and explicit
    salting (the ``j_salted`` strategy). Integer counts and one final
    division only; the heavy-hitter rank breaks count ties on the key
    so the relation is deterministic.

    Scale shape: one partial-agg groupBy on the key; the heavy-hitter
    pick is ``orderBy().limit(K)`` — Spark's TakeOrderedAndProject,
    a per-partition top-K merged at the driver, so the KEY-DOMAIN
    relation (billions of distinct keys on a real fact) is never
    globally sorted or moved to one partition. The rank window runs
    AFTER the limit, over exactly K rows.
    """
    li = read_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count("*").cast("bigint").alias("cnt"))
    totals = per_key.agg(
        F.sum("cnt").cast("bigint").alias("total_rows"),
        F.count("*").cast("bigint").alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_group"),
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("l_orderkey").asc())
    top = (
        per_key.orderBy(F.col("cnt").desc(), F.col("l_orderkey").asc())
        .limit(SKEW_TOP_K)
        .withColumn("rnk", F.row_number().over(w).cast("int"))
    )
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            "rnk",
            F.col("l_orderkey").alias("heavy_key"),
            "cnt",
            "total_rows",
            "n_keys",
            "max_group",
            (F.col("cnt").cast("double") / F.col("total_rows")).alias("key_share"),
        )
    )


_register(
    "p_skew_profile",
    p_skew_profile,
    f"""WITH per_key AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem GROUP BY l_orderkey
), totals AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(MAX(cnt) AS BIGINT) AS max_group
  FROM per_key
), top AS (
  SELECT l_orderkey, cnt,
         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, l_orderkey ASC) AS INT) AS rnk
  FROM per_key
)
SELECT rnk, l_orderkey AS heavy_key, cnt, total_rows, n_keys, max_group,
       (CAST(cnt AS DOUBLE) / total_rows) AS key_share
FROM top CROSS JOIN totals
WHERE rnk <= {SKEW_TOP_K}""",
)


#: compaction planning: target bytes per output file (toy-scale value;
#: a lakehouse uses 128 MB-1 GB — the arithmetic is identical)
COMPACT_TARGET_BYTES = 64 * 1024


def o_compaction_plan(spark, sf_dir):
    """Small-file compaction planner over ``documents`` by source —
    the query a lakehouse OPTIMIZE runs before rewriting: per source,
    total bytes (n_chars as the byte proxy the fixture carries), row
    count, the file count needed at COMPACT_TARGET_BYTES per file
    (ceil via integer arithmetic — (b + t - 1) DIV t, never a float
    cast), and rows per file. Aggregates to the source domain, one
    partial+final hash agg — nothing corpus-sized leaves the scan."""
    docs = read_table(spark, sf_dir, "documents")
    t = COMPACT_TARGET_BYTES
    agg = docs.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("total_bytes"),
        F.count("*").cast("bigint").alias("n_rows"),
    )
    planned = agg.withColumn(
        "n_files",
        F.greatest(
            F.lit(1).cast("bigint"),
            F.expr(f"CAST((total_bytes + {t - 1}) DIV {t} AS BIGINT)"),
        ),
    )
    return planned.select(
        "source",
        "total_bytes",
        "n_rows",
        "n_files",
        F.expr("CAST((n_rows + n_files - 1) DIV n_files AS BIGINT)").alias(
            "rows_per_file"
        ),
    )


_register(
    "o_compaction_plan",
    o_compaction_plan,
    f"""WITH agg AS (
  SELECT source,
         CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM documents GROUP BY source
), planned AS (
  SELECT source, total_bytes, n_rows,
         greatest(1, (total_bytes + {COMPACT_TARGET_BYTES - 1}) // {COMPACT_TARGET_BYTES}) AS n_files
  FROM agg
)
SELECT source, total_bytes, n_rows,
       CAST(n_files AS BIGINT) AS n_files,
       CAST((n_rows + n_files - 1) // n_files AS BIGINT) AS rows_per_file
FROM planned""",
)
