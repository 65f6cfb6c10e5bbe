"""Temporal-dimension + view-maintenance extension (r16, session 2).

Four lakehouse primitives a warehouse built on the reference's
CDC/upsert surface (/root/reference/spark_ingestion.py:116-125 is the
psycopg2 upsert loop this repo's manifest/MERGE path replaces) would
reach for next, each oracle-paired:

- :func:`cdc_scd2_build` — Slowly-Changing-Dimension Type-2: collapse
  a keyed change history into validity intervals
  ``[effective_from, effective_to)`` + ``is_current`` via one
  key-partitioned window. The temporal-dim building block the
  reference's last-wins upsert (sources/tables.py:35
  ``upsert_last_wins``) deliberately discards.
- :func:`cdc_scd2_asof` — the point-in-time (as-of) lookup against
  that dimension: each fact row joined to the version valid AT ITS
  OWN timestamp, not the current one — the feature-store /
  training-data-leakage-prevention join. Spark side rides
  ``operators.joins.asof_join`` (union + carry-forward window — one
  shuffle, no interval blow-up); the oracle is the INDEPENDENT
  interval-predicate formulation (``ef <= ts AND (et IS NULL OR
  ts < et)``), so the two derivations cross-check each other.
- :func:`cdc_ivm_join` — incremental maintenance of a JOIN view by
  signed delta algebra: ``ΔV = ΔA⋈B + A⋈ΔB + ΔA⋈ΔB`` with
  sign-product multiplicities, folded onto the stored base aggregate.
  Completes the IVM family: cdc_incremental_agg maintains a
  single-table aggregate, cdc_incremental_minmax the non-subtractable
  class; this is the two-table class every enriched MV needs.
- :func:`j_bloom_prune` — runtime-filter semi-join pruning made
  explicit: a bloom filter built from the dim side's join keys
  (bit_or-folded words), broadcast as ONE map literal, probed by the
  fact scan; output tabulates (bloom_pass × true_member) so the
  false-positive volume — and the no-false-negative invariant — sit
  under the value oracle. The portable twin of Spark's
  ``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`` rewrite,
  with a deterministic integer hash family so DuckDB reproduces the
  filter bit-for-bit.

Scale posture, per query:
- scd2_build: one hash shuffle on the dim key, window within
  partition, no global sort — at 100 TB the change history is
  partitioned by key and each partition sorts locally.
- scd2_asof: the union trick is one shuffle + one
  sort-within-partitions pass, state linear in rows; never the
  O(facts × versions) interval join the oracle uses (fine for DuckDB
  at sf0.01; a scale-killer on a cluster).
- ivm_join: every delta term joins ONLY changed rows (cost ∝ change
  volume); the dim side and both delta relations broadcast. The base
  term is the stored MV in production — recomputed here only so the
  oracle can see the whole equation (same posture as
  cdc_incremental_agg's v1 aggregate, cdf_ext.py).
- bloom_prune: filter build is |dim-keys| rows folded to
  ceil(bits/62) words; the probe is a map-side expression against one
  broadcast literal — zero shuffle added to the fact scan. Filter
  SIZE derives from the dim key count in-plan (~10 bits/key — see
  BLOOM_BITS_PER_KEY), holding the FP rate flat as the dim grows.

Hash-arithmetic bounds (engine-portable BIGINT, no overflow):
``key * C_i`` with C_i < 2^32 requires key < 2^31 — TPC-H custkeys
reach 1.5·10^8 at sf1000, within bound; the multiply stays under
2^63 and ``% P`` (P = 2^61-1) keeps every later term positive.
Words hold 62 bits each so ``1 << (pos % 62)`` never touches the
BIGINT sign bit (two's-complement shift semantics differ per engine
ONLY at bit 63 — stay below it).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from f1_realtime_data_pipeline_spark.operators.aggregations import DECIMAL_ACC
from f1_realtime_data_pipeline_spark.operators.joins import asof_join
from f1_realtime_data_pipeline_spark.sources.parquet import read_table

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _register(name, fn, sql):
    QUERIES[name] = fn
    if sql is not None:
        ORACLE[name] = sql


# ---------------------------------------------------------------------------
# SCD Type-2 build
# ---------------------------------------------------------------------------

#: dim slice: one customer in 40 keeps the oracle interval join cheap
#: while leaving ~10 versions per key (orders/customer ≈ 10 in TPC-H)
SCD2_SLICE_MOD, SCD2_SLICE_RES = 40, 7


def _scd2_source(spark: SparkSession, sf_dir: str, parity: int | None):
    """The change history feeding the SCD2 build: the orders slice,
    optionally restricted to one orderkey parity (the asof query
    builds the dim from even orderkeys and probes with odd ones).
    Deduped to ONE change per (key, ts) — at equal timestamps "the"
    as-of match is ambiguous in every engine (operators/joins.py:141),
    so the dedup is part of the dimension contract, not a test
    convenience: max orderkey wins, the house last-wins tie-break."""
    o = read_table(spark, sf_dir, "orders").filter(
        F.pmod(F.col("o_custkey"), F.lit(SCD2_SLICE_MOD)) == SCD2_SLICE_RES
    )
    if parity is not None:
        o = o.filter(F.pmod(F.col("o_orderkey"), F.lit(2)) == parity)
    wdedup = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("__rn", F.row_number().over(wdedup))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


_SCD2_SRC_SQL = """
  SELECT * FROM (
    SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
           o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                              ORDER BY o_orderkey DESC) AS __rn
    FROM orders WHERE o_custkey % 40 = 7 {parity}
  ) WHERE __rn = 1
"""


def _scd2_dim(src: DataFrame) -> DataFrame:
    """The SCD2 version-interval window over an (already deduped)
    change-history relation — shared by the full build and the
    incremental merge's touched-key rebuild."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return src.select(
        F.col("o_custkey").alias("cust_id"),
        F.row_number().over(w).cast("int").alias("version_n"),
        F.col("o_orderdate").alias("effective_from"),
        F.lead("o_orderdate").over(w).alias("effective_to"),
        F.when(F.lead("o_orderdate").over(w).isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_current"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("attr_price"),
    )


def cdc_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension from the per-customer order history:
    each change becomes a version row with
    ``[effective_from, effective_to)`` validity (effective_to = next
    change's timestamp, NULL while current). One window over the
    key partition — the standard bitemporal build."""
    return _scd2_dim(_scd2_source(spark, sf_dir, parity=None))


_register(
    "cdc_scd2_build",
    cdc_scd2_build,
    f"""WITH src AS ({_SCD2_SRC_SQL.format(parity="")})
SELECT o_custkey AS cust_id,
       CAST(ROW_NUMBER() OVER w AS INT) AS version_n,
       o_orderdate AS effective_from,
       LEAD(o_orderdate) OVER w AS effective_to,
       CAST(CASE WHEN LEAD(o_orderdate) OVER w IS NULL
                 THEN 1 ELSE 0 END AS INT) AS is_current,
       o_orderpriority AS priority,
       o_totalprice AS attr_price
FROM src
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
)


def cdc_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup: odd-orderkey facts joined to the version
    of the even-orderkey SCD2 dimension valid at each fact's own
    timestamp (left-outer; facts before the key's first version stay
    unmatched). Spark = asof_join's union/carry-forward (one shuffle);
    oracle = the interval-predicate join — independent derivations."""
    w = Window.partitionBy("cust_id").orderBy("effective_from")
    dim = _scd2_source(spark, sf_dir, parity=0).select(
        F.col("o_custkey").alias("cust_id"),
        F.col("o_orderdate").alias("effective_from"),
        F.col("o_orderpriority").alias("dim_priority"),
    )
    dim = dim.withColumn(
        "dim_version", F.row_number().over(w).cast("int")
    ).withColumnRenamed("effective_from", "ts")
    facts = _scd2_source(spark, sf_dir, parity=1).select(
        F.col("o_orderkey").alias("fact_id"),
        F.col("o_custkey").alias("cust_id"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_totalprice").alias("fact_price"),
    )
    out = asof_join(
        facts,
        dim,
        on="cust_id",
        ts_col="ts",
        value_cols=["dim_version", "dim_priority"],
    )
    return out.select(
        "fact_id", "cust_id", "ts", "fact_price", "dim_version", "dim_priority"
    )


_register(
    "cdc_scd2_asof",
    cdc_scd2_asof,
    f"""WITH dsrc AS ({_SCD2_SRC_SQL.format(parity="AND o_orderkey % 2 = 0")}),
dim AS (
  SELECT o_custkey AS cust_id,
         o_orderdate AS ef,
         LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS et,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS INT)
             AS dim_version,
         o_orderpriority AS dim_priority
  FROM dsrc
),
fsrc AS ({_SCD2_SRC_SQL.format(parity="AND o_orderkey % 2 = 1")})
SELECT f.o_orderkey AS fact_id,
       f.o_custkey AS cust_id,
       f.o_orderdate AS ts,
       f.o_totalprice AS fact_price,
       d.dim_version,
       d.dim_priority
FROM fsrc f
LEFT JOIN dim d
  ON f.o_custkey = d.cust_id
 AND d.ef <= f.o_orderdate
 AND (d.et IS NULL OR f.o_orderdate < d.et)""",
)


#: merge cut: history strictly before is the "stored" dim, at/after
#: is the arriving change batch. The fixture's order dates span
#: 1995-01..2001-08; a LATE cut keeps the batch small so BOTH merge
#: paths carry real volume — at 2001-03-01, half the slice's keys are
#: untouched (anti-join passthrough) and half rebuild (sf0.01:
#: 19 of 38 touched; sf0.001: 3 of 4) — an early cut touched every
#: key and left the passthrough path dead under the oracle
SCD2_MERGE_CUT = "2001-03-01"


def cdc_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance: apply a change batch to a stored
    dimension WITHOUT rebuilding untouched keys. Keys absent from the
    batch pass their stored version rows through verbatim (anti join);
    keys present in the batch rebuild from their full history (semi
    join prunes the rebuild input to the touched keys — at 100 TB with
    the history partitioned by key, that read is ∝ the touched keys'
    rows, never the table). The oracle is the FULL rebuild over the
    whole slice — the incremental path must be row-identical to it,
    which is the entire correctness claim of merge-style SCD2 loaders:
    versions within an untouched key never shift, and a touched key's
    'current' row closes exactly where the batch's first change opens."""
    src = _scd2_source(spark, sf_dir, parity=None)
    cut = F.lit(SCD2_MERGE_CUT).cast("timestamp")
    base = src.filter(F.col("o_orderdate") < cut)
    delta = src.filter(F.col("o_orderdate") >= cut)
    touched = delta.select("o_custkey").distinct()
    stored = _scd2_dim(base)
    untouched_rows = stored.join(
        F.broadcast(touched.withColumnRenamed("o_custkey", "cust_id")),
        "cust_id",
        "anti",
    )
    rebuilt = _scd2_dim(src.join(F.broadcast(touched), "o_custkey", "semi"))
    return untouched_rows.unionByName(rebuilt)


_register(
    "cdc_scd2_merge",
    cdc_scd2_merge,
    # the full-rebuild oracle: identical to cdc_scd2_build's twin —
    # the value-level statement that incremental == full
    ORACLE["cdc_scd2_build"],
)


# ---------------------------------------------------------------------------
# join-view incremental maintenance (signed delta algebra)
# ---------------------------------------------------------------------------


def cdc_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain ``V = SELECT segment, COUNT(*), SUM(price) FROM A ⋈ B``
    under changes to BOTH sides without rejoining the full tables:

    change script (arithmetic, side-effect-free):
      A (orders):   insert the orderkey%7==0 rows; update %7==3
                    rows' price by +1.0 (exact IEEE at fixture
                    magnitudes — the cdc_row_diff convention).
      B (customer): custkey%11==5 rows move segment → 'MOVED'.

    maintained form: base = agg(A_old ⋈ B_old) — the stored MV in
    production, recomputed here so the oracle sees the whole
    equation — plus the three signed delta terms
    ``ΔA⋈B_old + A_old⋈ΔB + ΔA⋈ΔB`` where ΔX carries +1/−1 row
    signs (update = −pre +post) and each joined row contributes its
    sign PRODUCT. Groups whose maintained count hits zero drop.
    The oracle recomputes ``agg(A_new ⋈ B_new)`` directly — a
    mis-signed term, a missed cross-delta row, or a double-counted
    update all hash-mismatch. Sums fold in DECIMAL (order-free),
    emitted as double — the decimal_sum contract."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    k7 = F.pmod(F.col("o_orderkey"), F.lit(7))
    k11 = F.pmod(F.col("c_custkey"), F.lit(11))

    def arow(df, price_col, sign):
        return df.select(
            F.col("o_custkey").alias("custkey"),
            price_col.alias("price"),
            F.lit(sign).alias("sa"),
        )

    a_old = arow(o.filter(k7 != 0), F.col("o_totalprice"), 1)

    def _entry(val, sign):
        return F.struct(val.alias("v"), F.lit(sign).alias("s"))

    # each delta relation derives from ONE scan: the signed
    # contributions (insert = +post; update = +post −pre) explode out
    # of a single filtered pass instead of a 3-branch UNION that
    # re-reads the table per branch. The deltas are then PERSISTED —
    # they are ∝ the change volume (the thing IVM keeps small), and
    # each feeds two join terms.
    delta_a = (
        o.filter(k7.isin(0, 3))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.explode(
                F.when(
                    k7 == 0, F.array(_entry(F.col("o_totalprice"), 1))
                ).otherwise(
                    F.array(
                        _entry(F.col("o_totalprice") + 1.0, 1),
                        _entry(F.col("o_totalprice"), -1),
                    )
                )
            ).alias("x"),
        )
        .select("custkey", F.col("x.v").alias("price"), F.col("x.s").alias("sa"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def brow(df, seg_col, sign):
        return df.select(
            F.col("c_custkey").alias("custkey"),
            seg_col.alias("segment"),
            F.lit(sign).alias("sb"),
        )

    b_old = brow(c, F.col("c_mktsegment"), 1)
    delta_b = (
        c.filter(k11 == 5)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.explode(
                F.array(
                    _entry(F.lit("MOVED"), 1),
                    _entry(F.col("c_mktsegment"), -1),
                )
            ).alias("x"),
        )
        .select("custkey", F.col("x.v").alias("segment"), F.col("x.s").alias("sb"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def term(a, b):
        return a.join(F.broadcast(b), "custkey").select(
            "segment", "price", (F.col("sa") * F.col("sb")).alias("sign")
        )

    merged = (
        term(a_old, b_old)  # stored MV base (see docstring)
        .unionAll(term(delta_a, b_old))  # ΔA ⋈ B_old
        .unionAll(term(a_old, delta_b))  # A_old ⋈ ΔB
        .unionAll(term(delta_a, delta_b))  # ΔA ⋈ ΔB
    )
    return (
        merged.groupBy("segment")
        .agg(
            F.sum("sign").cast("bigint").alias("n_orders"),
            F.sum(F.col("sign") * F.col("price").cast(DECIMAL_ACC))
            .cast("double")
            .alias("sum_price"),
        )
        .filter(F.col("n_orders") > 0)
        .orderBy("segment")
    )


_register(
    "cdc_ivm_join",
    cdc_ivm_join,
    """WITH a_new AS (
  SELECT o_custkey,
         o_totalprice
           + CASE WHEN o_orderkey % 7 = 3 THEN 1.0 ELSE 0 END AS price
  FROM orders
), b_new AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 11 = 5 THEN 'MOVED'
              ELSE c_mktsegment END AS segment
  FROM customer
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(price AS DECIMAL(30,4))) AS DOUBLE) AS sum_price
FROM a_new JOIN b_new ON o_custkey = c_custkey
GROUP BY segment ORDER BY segment""",
)


# ---------------------------------------------------------------------------
# explicit bloom-filter semi-join pruning
# ---------------------------------------------------------------------------

#: words hold 62 usable bits (bit 62+ never set — two's-complement
#: shift portability, see module docstring)
BLOOM_WORD_BITS = 62
#: filter SIZE is DERIVED from the dim's key count in-plan:
#: bits = max(62, ceil(10·n / 62)·62) — ~10 bits/key at k=3 hashes
#: ≈ 1.7 % FP. A FIXED size is the scale bug the decade probe caught:
#: pinned at 4092 bits the filter saturated at 10× the dim (sf0.1:
#: 88k false positives vs 29.5k true — ~75 % FP, the filter pruned
#: nothing). Derivation mirrors e_knn_join_derived's in-plan plane
#: count: the oracle recomputes it from COUNT(*) so one static SQL
#: string is exact at every SF.
BLOOM_BITS_PER_KEY = 10
#: legacy fixed floor, still the minimum (and the empty-dim size)
BLOOM_BITS = 62 * 66  # 4092
#: Knuth / xxhash-style odd multipliers, all < 2^32
BLOOM_HASHES = ((2654435761, 1), (2246822519, 2), (3266489917, 3))
BLOOM_P = (1 << 61) - 1  # Mersenne prime 2^61-1


def _bloom_pos(key, c, d, m):
    """Position of hash (c, d) for ``key`` in an ``m``-bit filter;
    ``m`` may be a derived Column (the registered sizing) or an int."""
    m_col = F.lit(m) if isinstance(m, int) else m
    return F.pmod(
        F.pmod(F.col(key) * F.lit(c) + F.lit(d), F.lit(BLOOM_P)), m_col
    )


def _bit_mask(pos):
    """``1 << (pos % 62)`` with a COLUMN shift amount —
    ``F.shiftleft``'s numBits parameter only takes a Python int."""
    return F.call_function(
        "shiftleft",
        F.lit(1).cast("bigint"),
        F.pmod(pos, F.lit(BLOOM_WORD_BITS)).cast("int"),
    )


def j_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter runtime pruning, tabulated: build a filter SIZED
    from the BUILDING-segment customers' key count (~10 bits/key,
    derived in-plan — see BLOOM_BITS_PER_KEY), probe every order's
    o_custkey, and cross-tabulate bloom_pass × true_member (true
    membership via a broadcast semi-join flag). The (pass=0,
    member=1) cell must be EMPTY — blooms never false-negative — and
    the (1,0) cell is the measured FP volume the sizing buys, which
    the derived size keeps ~constant-RATE as the dim grows (the
    fixed-size filter saturated a decade up). Probe cost: one
    broadcast map literal + pure column arithmetic on the scan; no
    shuffle added."""
    # persisted: the key set feeds the size derivation, the filter
    # build, and the true-membership flag (three consumers, one scan)
    dimkeys = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    anchor = dimkeys.agg(F.count(F.lit(1)).alias("__n")).select(
        F.expr(
            f"greatest(CAST({BLOOM_WORD_BITS} AS BIGINT), "
            f"((__n * {BLOOM_BITS_PER_KEY} + {BLOOM_WORD_BITS - 1}) "
            f"DIV {BLOOM_WORD_BITS}) * {BLOOM_WORD_BITS})"
        ).alias("m_bits")
    )
    # filter build: 3 positions per key out of ONE pass (explode, not
    # a 3-branch union that re-scans per hash) -> word/bit -> bit_or
    pos = dimkeys.crossJoin(F.broadcast(anchor)).select(
        F.explode(
            F.array(
                *[
                    _bloom_pos("k", c, d, F.col("m_bits"))
                    for c, d in BLOOM_HASHES
                ]
            )
        ).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / BLOOM_WORD_BITS).cast("bigint").alias("word"),
            _bit_mask(F.col("pos")).alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    bloom = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word", "bits"))
        ).alias("bloom_map")
    ).crossJoin(F.broadcast(anchor))
    facts = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    )
    probed = facts.crossJoin(F.broadcast(bloom))
    checks = []
    for c, d in BLOOM_HASHES:
        p = _bloom_pos("k", c, d, F.col("m_bits"))
        word = (p / BLOOM_WORD_BITS).cast("bigint")
        mask = _bit_mask(p)
        hit = (
            F.coalesce(
                F.element_at(F.col("bloom_map"), word), F.lit(0)
            ).bitwiseAND(mask)
            != 0
        )
        checks.append(hit)
    bloom_pass = (checks[0] & checks[1] & checks[2]).cast("int")
    flagged = probed.withColumn("bloom_pass", bloom_pass).join(
        F.broadcast(dimkeys.withColumn("__m", F.lit(1))), "k", "left"
    )
    return (
        flagged.select(
            "bloom_pass",
            F.coalesce("__m", F.lit(0)).cast("int").alias("true_member"),
            "k",
        )
        .groupBy("bloom_pass", "true_member")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("k").cast("bigint").alias("n_keys"),
        )
        .orderBy("bloom_pass", "true_member")
    )


_BLOOM_POS_SQL = (
    "(({k} * {c} + {d}) % 2305843009213693951) % mb.m_bits"
)


def _bloom_probe_sql(k: str) -> tuple[str, str, str]:
    return tuple(
        _BLOOM_POS_SQL.format(k=k, c=c, d=d) for c, d in BLOOM_HASHES
    )


_P1, _P2, _P3 = _bloom_probe_sql("o.k")
_D1, _D2, _D3 = _bloom_probe_sql("k")

_register(
    "j_bloom_prune",
    j_bloom_prune,
    f"""WITH dimkeys AS (
  SELECT DISTINCT c_custkey AS k FROM customer
  WHERE c_mktsegment = 'BUILDING'
), mb AS (
  SELECT GREATEST(CAST(62 AS BIGINT),
                  ((COUNT(*) * {BLOOM_BITS_PER_KEY} + 61) // 62) * 62)
             AS m_bits
  FROM dimkeys
), pos AS (
  SELECT {_D1} AS p FROM dimkeys CROSS JOIN mb
  UNION ALL
  SELECT {_D2} AS p FROM dimkeys CROSS JOIN mb
  UNION ALL
  SELECT {_D3} AS p FROM dimkeys CROSS JOIN mb
), bloom AS (
  SELECT CAST(p // 62 AS BIGINT) AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 62 AS INT)) AS bits
  FROM pos GROUP BY 1
), probed AS (
  SELECT o.k AS k,
         CASE WHEN (COALESCE(b1.bits, 0)
                    & (CAST(1 AS BIGINT) << CAST({_P1} % 62 AS INT))) != 0
               AND (COALESCE(b2.bits, 0)
                    & (CAST(1 AS BIGINT) << CAST({_P2} % 62 AS INT))) != 0
               AND (COALESCE(b3.bits, 0)
                    & (CAST(1 AS BIGINT) << CAST({_P3} % 62 AS INT))) != 0
              THEN 1 ELSE 0 END AS bloom_pass,
         CASE WHEN dk.k IS NOT NULL THEN 1 ELSE 0 END AS true_member
  FROM (SELECT o_custkey AS k FROM orders) o
  CROSS JOIN mb
  LEFT JOIN bloom b1 ON b1.word = {_P1} // 62
  LEFT JOIN bloom b2 ON b2.word = {_P2} // 62
  LEFT JOIN bloom b3 ON b3.word = {_P3} // 62
  LEFT JOIN dimkeys dk ON dk.k = o.k
)
SELECT CAST(bloom_pass AS INT) AS bloom_pass,
       CAST(true_member AS INT) AS true_member,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS n_keys
FROM probed GROUP BY 1, 2 ORDER BY 1, 2""",
)


#: nearest-asof tolerance: 100 days in seconds — the slice's orders
#: sit ~8 months apart per customer, so matched and unmatched facts
#: both occur at every SF
ASOF_NEAREST_TOL_S = 100 * 86400


def w_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of with tolerance (pandas
    ``merge_asof(direction='nearest')``): odd-orderkey facts matched
    to the CLOSEST even-orderkey dim change in either direction
    within 100 days; ties at equal distance take the earlier
    (backward) row. Spark = one union + two carry windows
    (operators.joins.asof_join_nearest); oracle = the independent
    tolerance-bounded interval join ranked by (distance, ts) —
    two formulations of the same semantics."""
    from f1_realtime_data_pipeline_spark.operators.joins import (
        asof_join_nearest,
    )

    dim = _scd2_source(spark, sf_dir, parity=0).select(
        F.col("o_custkey").alias("cust_id"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderpriority").alias("dim_priority"),
    )
    facts = _scd2_source(spark, sf_dir, parity=1).select(
        F.col("o_orderkey").alias("fact_id"),
        F.col("o_custkey").alias("cust_id"),
        F.col("o_orderdate").alias("ts"),
    )
    out = asof_join_nearest(
        facts,
        dim,
        on="cust_id",
        ts_col="ts",
        value_cols=["dim_priority"],
        tolerance_s=ASOF_NEAREST_TOL_S,
    )
    return out.select(
        "fact_id", "cust_id", "ts", "dim_priority", "matched_ts",
        "match_dir", "dist_s",
    )


_register(
    "w_asof_nearest",
    w_asof_nearest,
    f"""WITH dsrc AS ({_SCD2_SRC_SQL.format(parity="AND o_orderkey % 2 = 0")}),
dim AS (
  SELECT o_custkey AS cust_id, o_orderdate AS dts,
         o_orderpriority AS dim_priority
  FROM dsrc
),
fsrc AS ({_SCD2_SRC_SQL.format(parity="AND o_orderkey % 2 = 1")}),
ranked AS (
  SELECT f.o_orderkey AS fact_id, f.o_custkey AS cust_id,
         f.o_orderdate AS ts, d.dim_priority, d.dts AS matched_ts,
         CASE WHEN d.dts IS NULL THEN NULL
              WHEN d.dts <= f.o_orderdate THEN 'b' ELSE 'f' END
             AS match_dir,
         CAST(abs(CAST(epoch(f.o_orderdate) AS BIGINT)
                  - CAST(epoch(d.dts) AS BIGINT)) AS BIGINT) AS dist_s,
         ROW_NUMBER() OVER (
           PARTITION BY f.o_orderkey
           ORDER BY abs(CAST(epoch(f.o_orderdate) AS BIGINT)
                        - CAST(epoch(d.dts) AS BIGINT)), d.dts
         ) AS __rn
  FROM fsrc f
  LEFT JOIN dim d
    ON f.o_custkey = d.cust_id
   AND abs(CAST(epoch(f.o_orderdate) AS BIGINT)
           - CAST(epoch(d.dts) AS BIGINT)) <= {ASOF_NEAREST_TOL_S}
)
SELECT fact_id, cust_id, ts, dim_priority, matched_ts,
       match_dir, dist_s
FROM ranked WHERE __rn = 1""",
)
