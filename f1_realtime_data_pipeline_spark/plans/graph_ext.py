"""Graph-analytics extension surface (built r14, registered r15).

Link-graph authority signals for a training-data pipeline: a
crawl-derived corpus ranks hosts/documents by link authority before
sampling (Common Crawl publishes its host ranking as exactly this
computation), and dedup-cluster exemplar choice can use the same
primitive. The fixtures carry no crawl graph, so the queries derive
the **co-purchase bipartite graph** from the TPC-H star: customer c
and supplier s are linked iff some order of c contains a lineitem
supplied by s — the classic two-mode affiliation graph, exercised in
both directions so rank flows customer→supplier→customer.

REGISTERED in r15 (``__spark_entry__._QUERY_MODULES``), debuting
inside the driver window per the staging plan (the r14 window was at
capacity; registering outside it would have broken the
0-never-checked freshness invariant). tests/test_graph.py keeps the
same DuckDB comparison as a pytest-side gate.

Node-id encoding: ``custkey*2`` / ``suppkey*2+1`` — disjoint id
spaces in one BIGINT column, decoded by parity in the output. All
rank arithmetic is the BIGINT fixed-point contract documented in
``operators.graph`` (deterministic across engines and partitionings).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_realtime_data_pipeline_spark.operators.graph import (
    DAMPING_PCT,
    HITS_SCALE,
    RANK_SCALE,
    hits,
    pagerank,
)
from f1_realtime_data_pipeline_spark.operators.materialize import (
    record_stage_plan,
)
from f1_realtime_data_pipeline_spark.sources.parquet import read_table

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _register(name, fn, sql):
    QUERIES[name] = fn
    if sql is not None:
        ORACLE[name] = sql


#: PageRank iterations for the registered query — enough that every
#: node's rank has both a customer→supplier and a supplier→customer
#: hop folded in (bipartite: odd/even hops alternate sides), small
#: enough that the unrolled DuckDB twin stays readable.
PR_ITERS = 3
PR_TOPK = 20

#: the damped base every node holds regardless of in-edges
_PR_BASE = (100 - DAMPING_PCT) * RANK_SCALE // 100


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customer↔supplier co-purchase edges, both directions."""
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    one_dir = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return one_dir.unionAll(
        one_dir.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def g_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 co-purchase PageRank: which customers/suppliers sit at
    the densest part of the purchase graph after 3 damped rounds."""
    ranks = pagerank(_copurchase_edges(spark, sf_dir), iters=PR_ITERS)
    return (
        ranks.select(
            "node",
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("kind"),
            F.expr("node DIV 2").alias("entity_key"),
            "rank",
        )
        .orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(PR_TOPK)
    )


def _pr_iteration_sql(prev: str, out: str) -> str:
    """One unrolled PageRank round — THE single source of the oracle's
    update rule, so the three rounds cannot drift apart."""
    return f"""{out} AS (
  SELECT n.node,
         CAST({_PR_BASE} + ({DAMPING_PCT} * COALESCE(inf.inflow, 0)) // 100
              AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank // d.out_deg) AS inflow
    FROM edges e
    JOIN {prev} r ON e.src = r.node
    JOIN deg d ON e.src = d.src
    GROUP BY e.dst
  ) inf ON n.node = inf.node
)"""


_PR_SQL = f"""WITH one_dir AS (
  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), edges AS (
  SELECT src, dst FROM one_dir
  UNION ALL
  SELECT dst AS src, src AS dst FROM one_dir
), deg AS (
  SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src
), nodes AS (
  SELECT DISTINCT node
  FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
), r0 AS (
  SELECT node, CAST({RANK_SCALE} AS BIGINT) AS rank FROM nodes
), {_pr_iteration_sql("r0", "r1")},
{_pr_iteration_sql("r1", "r2")},
{_pr_iteration_sql("r2", "r3")}
SELECT node,
       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       node // 2 AS entity_key,
       rank
FROM r3
ORDER BY rank DESC, node ASC
LIMIT {PR_TOPK}"""

_register("g_pagerank", g_pagerank, _PR_SQL)


def g_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree profile of the co-purchase graph, per side: node count,
    min/max/avg degree (avg in exact permille via integer DIV) — the
    skew diagnostic run BEFORE an iterative job to size its loop
    (a power-law hub means salting or hub-splitting the rank join)."""
    e = _copurchase_edges(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    return (
        deg.groupBy(
            F.when(F.col("src") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("kind")
        )
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("d").alias("min_deg"),
            F.max("d").alias("max_deg"),
            F.expr("(sum(d) * 1000) DIV count(*)").alias("avg_deg_permille"),
        )
        .orderBy("kind")
    )


def g_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PageRank on the DIRECTED one-way co-purchase graph
    (customer→supplier only) with dangling-mass redistribution
    (VERDICT r14 #8 — the probability-preserving variant as an
    oracle-checked query, not just a flag).

    Every supplier is dangling here (no out-edges), so the
    redistribution term is live in every round — the strongest
    fixture this star schema offers for the variant: with the default
    drop-the-mass contract the suppliers' entire mass would vanish
    each round; with redistribution it returns to the graph as an
    equal per-node share before damping."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    one_dir = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(one_dir, iters=PR_ITERS, redistribute_dangling=True)
    return (
        ranks.select(
            "node",
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("kind"),
            F.expr("node DIV 2").alias("entity_key"),
            "rank",
        )
        .orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(PR_TOPK)
    )


def _pr_dangling_iteration_sql(prev: str, out: str) -> str:
    """One unrolled redistribution round: the per-node dangling share
    is (Σ rank over nodes with no out-edges) DIV N, added to inflow
    BEFORE damping — the single source of the update rule, matching
    operators.graph.pagerank(redistribute_dangling=True)."""
    return f"""{out} AS (
  SELECT n.node,
         CAST({_PR_BASE} + ({DAMPING_PCT} * (COALESCE(inf.inflow, 0)
              + dsh.share)) // 100 AS BIGINT) AS rank
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank // d.out_deg) AS inflow
    FROM edges e
    JOIN {prev} r ON e.src = r.node
    JOIN deg d ON e.src = d.src
    GROUP BY e.dst
  ) inf ON n.node = inf.node
  CROSS JOIN (
    SELECT COALESCE(SUM(CASE WHEN d2.src IS NULL THEN r.rank END), 0)
           // (SELECT COUNT(*) FROM nodes) AS share
    FROM {prev} r LEFT JOIN deg d2 ON r.node = d2.src
  ) dsh
)"""


_PR_DANGLING_SQL = f"""WITH edges AS (
  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), deg AS (
  SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src
), nodes AS (
  SELECT DISTINCT node
  FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
), r0 AS (
  SELECT node, CAST({RANK_SCALE} AS BIGINT) AS rank FROM nodes
), {_pr_dangling_iteration_sql("r0", "r1")},
{_pr_dangling_iteration_sql("r1", "r2")},
{_pr_dangling_iteration_sql("r2", "r3")}
SELECT node,
       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       node // 2 AS entity_key,
       rank
FROM r3
ORDER BY rank DESC, node ASC
LIMIT {PR_TOPK}"""

_register("g_pagerank_dangling", g_pagerank_dangling, _PR_DANGLING_SQL)


#: seed cohort for the personalized query: every 100th customer — a
#: deterministic ~1% sample standing in for a curated seed list (in a
#: crawl pipeline: the trusted-domain list; in entity expansion: the
#: known-good entities)
PPR_SEED_MOD = 100


def g_ppr_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PERSONALIZED PageRank on the co-purchase graph: teleport
    mass restarts only at the seed cohort (custkey % 100 == 0), so
    rank measures proximity to the seeds — the related-entity /
    crawl-frontier expansion primitive (suppliers serving the seed
    customers rank first, then customers sharing those suppliers).
    Same fixed-point arithmetic; the seed flag rides the node relation
    (operators/graph.py::pagerank(seeds=...))."""
    edges = _copurchase_edges(spark, sf_dir)
    seeds = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % PPR_SEED_MOD == 0)
        .select((F.col("c_custkey") * 2).alias("node"))
    )
    ranks = pagerank(edges, iters=PR_ITERS, seeds=seeds)
    return (
        ranks.filter(F.col("rank") > 0)
        .select(
            "node",
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("kind"),
            F.expr("node DIV 2").alias("entity_key"),
            "rank",
        )
        .orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(PR_TOPK)
    )


def _ppr_iteration_sql(prev: str, out: str) -> str:
    """One unrolled personalized round: the base term is paid only to
    seed nodes — the single source of the update rule."""
    return f"""{out} AS (
  SELECT n.node,
         CAST(n.is_seed * {_PR_BASE}
              + ({DAMPING_PCT} * COALESCE(inf.inflow, 0)) // 100
              AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank // d.out_deg) AS inflow
    FROM edges e
    JOIN {prev} r ON e.src = r.node
    JOIN deg d ON e.src = d.src
    GROUP BY e.dst
  ) inf ON n.node = inf.node
)"""


_PPR_SQL = f"""WITH one_dir AS (
  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), edges AS (
  SELECT src, dst FROM one_dir
  UNION ALL
  SELECT dst AS src, src AS dst FROM one_dir
), deg AS (
  SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src
), seedset AS (
  SELECT c_custkey * 2 AS node FROM customer
  WHERE c_custkey % {PPR_SEED_MOD} = 0
), nodes AS (
  SELECT node,
         CASE WHEN node IN (SELECT node FROM seedset) THEN 1 ELSE 0 END
           AS is_seed
  FROM (SELECT DISTINCT node
        FROM (SELECT src AS node FROM edges
              UNION ALL SELECT dst FROM edges))
), r0 AS (
  SELECT node, CAST(is_seed * {RANK_SCALE} AS BIGINT) AS rank FROM nodes
), {_ppr_iteration_sql("r0", "r1")},
{_ppr_iteration_sql("r1", "r2")},
{_ppr_iteration_sql("r2", "r3")}
SELECT node,
       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       node // 2 AS entity_key,
       rank
FROM r3
WHERE rank > 0
ORDER BY rank DESC, node ASC
LIMIT {PR_TOPK}"""

_register("g_ppr_seeded", g_ppr_seeded, _PPR_SQL)


#: per-customer supplier fanout cap for the common-neighbor join — the
#: occupancy-cap discipline the LSH/clique families use: a co-occurrence
#: self-join explodes quadratically on hub customers (C suppliers → C²
#: pairs), so each customer contributes at most CAP deterministically
#: chosen suppliers (smallest suppkey — stable, engine-portable). The
#: cap IS the documented semantics (capped common-neighbors), mirrored
#: exactly in the SQL twin; degrees use the capped edge set so the
#: Jaccard stays internally consistent.
CN_FANOUT_CAP = 40
CN_TOPK = 20


def g_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 supplier pairs by shared-customer Jaccard (exact ppm) —
    the item-item collaborative-similarity primitive ("suppliers
    bought by the same customers"), and the graph-side counterpart of
    the embedding family's cosine near-dup.

    Plan: cap each customer's supplier list (see ``CN_FANOUT_CAP``),
    self-join the capped edge list on the customer key with ``a < b``
    (each unordered pair once), count shared customers per pair, then
    join per-supplier capped degrees and fold Jaccard into one integer
    expression — shared·10⁶ DIV (deg_a + deg_b − shared). At 100 TB
    the cap bounds the explode at CAP²/2 pairs per customer and the
    pair aggregation combines map-side; no all-pairs path exists."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    from pyspark.sql import Window

    e = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_suppkey").alias("supp"),
        )
        .distinct()
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("cust").orderBy("supp")
            ),
        )
        .filter(F.col("__rn") <= CN_FANOUT_CAP)
        .drop("__rn")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = e.groupBy("supp").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    l, r = e.alias("l"), e.alias("r")
    shared = (
        l.join(r, (F.col("l.cust") == F.col("r.cust")) & (F.col("l.supp") < F.col("r.supp")))
        .groupBy(
            F.col("l.supp").alias("supp_a"), F.col("r.supp").alias("supp_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared"))
    )
    da = deg.select(F.col("supp").alias("supp_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("supp").alias("supp_b"), F.col("deg").alias("deg_b"))
    return (
        shared.join(F.broadcast(da), "supp_a")
        .join(F.broadcast(db), "supp_b")
        .select(
            "supp_a",
            "supp_b",
            "shared",
            "deg_a",
            "deg_b",
            F.expr("(shared * 1000000) DIV (deg_a + deg_b - shared)")
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
        .orderBy(
            F.col("jaccard_ppm").desc(),
            F.col("shared").desc(),
            F.col("supp_a").asc(),
            F.col("supp_b").asc(),
        )
        .limit(CN_TOPK)
    )


_register(
    "g_common_neighbors",
    g_common_neighbors,
    f"""WITH raw AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), e AS (
  SELECT cust, supp FROM (
    SELECT cust, supp,
           ROW_NUMBER() OVER (PARTITION BY cust ORDER BY supp) AS rn
    FROM raw
  ) WHERE rn <= {CN_FANOUT_CAP}
), deg AS (
  SELECT supp, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY supp
), shared AS (
  SELECT a.supp AS supp_a, b.supp AS supp_b,
         CAST(COUNT(*) AS BIGINT) AS shared
  FROM e a JOIN e b ON a.cust = b.cust AND a.supp < b.supp
  GROUP BY 1, 2
)
SELECT s.supp_a, s.supp_b, s.shared,
       da.deg AS deg_a, db.deg AS deg_b,
       CAST((s.shared * 1000000) // (da.deg + db.deg - s.shared)
            AS BIGINT) AS jaccard_ppm
FROM shared s
JOIN deg da ON s.supp_a = da.supp
JOIN deg db ON s.supp_b = db.supp
ORDER BY jaccard_ppm DESC, shared DESC, supp_a ASC, supp_b ASC
LIMIT {CN_TOPK}""",
)


_register(
    "g_degree_stats",
    g_degree_stats,
    """WITH one_dir AS (
  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), edges AS (
  SELECT src, dst FROM one_dir
  UNION ALL
  SELECT dst AS src, src AS dst FROM one_dir
), deg AS (
  SELECT src, COUNT(*) AS d FROM edges GROUP BY src
)
SELECT CASE WHEN src % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       COUNT(*) AS n_nodes,
       MIN(d) AS min_deg,
       MAX(d) AS max_deg,
       CAST((SUM(d) * 1000) // COUNT(*) AS BIGINT) AS avg_deg_permille
FROM deg
GROUP BY 1
ORDER BY kind""",
)


# ---------------------------------------------------------------------------
# HITS hubs & authorities (r16): Kleinberg's alternating fixed point
# on the DIRECTED bipartite co-purchase graph — customers are hubs
# ("buys from good suppliers"), suppliers are authorities ("bought by
# good customers"). The link-analysis complement of g_pagerank: same
# loop discipline (edges persisted once, |side|-row shuffles, one
# 1-row scalar broadcast per half-round for the L∞ normalization),
# operator in operators/graph.py:hits. The oracle unrolls the three
# rounds with the update rule generated by ONE helper per half-step,
# so the rounds cannot drift apart.
# ---------------------------------------------------------------------------

HITS_ITERS = 3
HITS_TOPK = 10


def g_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 hub customers and top-10 authority suppliers after 3
    L∞-normalized HITS rounds, BIGINT fixed point (exact in both
    engines — see operators.graph.hits for the determinism
    contract)."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    one_dir = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    scores = hits(one_dir, iters=HITS_ITERS)
    hubs = (
        scores.filter(F.col("node") % 2 == 0)
        .select(
            F.lit("hub").alias("kind"),
            F.expr("node DIV 2").cast("bigint").alias("entity_key"),
            F.col("hub").alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("entity_key").asc())
        .limit(HITS_TOPK)
    )
    auths = (
        scores.filter(F.col("node") % 2 == 1)
        .select(
            F.lit("authority").alias("kind"),
            F.expr("node DIV 2").cast("bigint").alias("entity_key"),
            F.col("auth").alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("entity_key").asc())
        .limit(HITS_TOPK)
    )
    return hubs.unionAll(auths).orderBy(
        F.col("kind").asc(), F.col("score").desc(), F.col("entity_key").asc()
    )


def _hits_round_sql(prev_auth: str, hub_out: str, auth_out: str) -> str:
    """One unrolled HITS round (two half-steps) — the single source of
    the oracle's update rule."""
    return f"""{hub_out}_raw AS (
  SELECT e.src AS node, CAST(SUM(a.score) AS BIGINT) AS raw
  FROM e JOIN {prev_auth} a ON e.dst = a.node GROUP BY e.src
), {hub_out} AS (
  SELECT node, CAST((raw * {HITS_SCALE})
         // (SELECT MAX(raw) FROM {hub_out}_raw) AS BIGINT) AS score
  FROM {hub_out}_raw
), {auth_out}_raw AS (
  SELECT e.dst AS node, CAST(SUM(h.score) AS BIGINT) AS raw
  FROM e JOIN {hub_out} h ON e.src = h.node GROUP BY e.dst
), {auth_out} AS (
  SELECT node, CAST((raw * {HITS_SCALE})
         // (SELECT MAX(raw) FROM {auth_out}_raw) AS BIGINT) AS score
  FROM {auth_out}_raw
)"""


_HITS_SQL = f"""WITH e AS (
  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), a0 AS (
  SELECT DISTINCT dst AS node, CAST({HITS_SCALE} AS BIGINT) AS score FROM e
), {_hits_round_sql("a0", "h1", "a1")},
{_hits_round_sql("a1", "h2", "a2")},
{_hits_round_sql("a2", "h3", "a3")},
hr AS (
  SELECT 'hub' AS kind, CAST(node // 2 AS BIGINT) AS entity_key, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, node ASC) AS rn
  FROM h3
), ar AS (
  SELECT 'authority' AS kind, CAST(node // 2 AS BIGINT) AS entity_key, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, node ASC) AS rn
  FROM a3
)
SELECT kind, entity_key, score FROM (
  SELECT * FROM hr WHERE rn <= {HITS_TOPK}
  UNION ALL
  SELECT * FROM ar WHERE rn <= {HITS_TOPK}
)
ORDER BY kind ASC, score DESC, entity_key ASC"""

_register("g_hits", g_hits, _HITS_SQL)


# ---------------------------------------------------------------------------
# triangle counting / global clustering (r16)
# ---------------------------------------------------------------------------

#: project a supplier-supplier edge only when the pair shares at least
#: this many (capped) customers — the same density knob every
#: co-occurrence projection needs so hub customers don't densify the
#: projected graph into a clique.
TRI_MIN_SHARED = 2

#: keep each node's TRI_KNN_K most-similar partners (shared desc, id
#: asc) — the top-K similarity graph. Projected degree is bounded by
#: 2K REGARDLESS of corpus density (TPC-H's uniform incidence would
#: otherwise project a near-complete graph), the same reason
#: production similarity graphs are kNN graphs.
TRI_KNN_K = 8


def _knn_sim_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier top-K similarity graph: undirected (a < b) edges,
    persisted — each supplier keeps its TRI_KNN_K most-similar
    partners (shared capped customers desc, id asc) among pairs with
    >= TRI_MIN_SHARED shared customers. Shared by g_triangles and
    g_kcore_trim (one projection definition, two consumers)."""
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    e = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_suppkey").alias("supp"),
        )
        .distinct()
        .withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy("cust").orderBy("supp")),
        )
        .filter(F.col("__rn") <= CN_FANOUT_CAP)
        .drop("__rn")
        # persisted (r16 optimization round): the co-occurrence
        # self-join below references this capped incidence relation on
        # BOTH sides — unpersisted, the orders⋈lineitem + distinct +
        # fanout-cap window ran once per side (g_common_neighbors
        # already caches its identical incidence; the kNN projection
        # now matches). ≤ CN_FANOUT_CAP rows per customer; lifecycle
        # via ContextCleaner on plan GC.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    l, r = e.alias("l"), e.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.cust") == F.col("r.cust"))
            & (F.col("l.supp") < F.col("r.supp")),
        )
        .groupBy(F.col("l.supp").alias("a"), F.col("r.supp").alias("b"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= TRI_MIN_SHARED)
    )
    sym = pairs.select(
        F.col("a").alias("v"), F.col("b").alias("w"), "shared"
    ).unionAll(
        pairs.select(F.col("b").alias("v"), F.col("a").alias("w"), "shared")
    )
    topk = (
        sym.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("v").orderBy(
                    F.col("shared").desc(), F.col("w").asc()
                )
            ),
        )
        .filter(F.col("__rn") <= TRI_KNN_K)
        .select("v", "w")
    )
    return (
        topk.select(
            F.least("v", "w").alias("a"), F.greatest("v", "w").alias("b")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def g_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the supplier
    TOP-K SIMILARITY graph: candidate pairs share >= TRI_MIN_SHARED
    capped customers, and each supplier keeps only its TRI_KNN_K
    most-similar partners (shared desc, id asc) — the kNN-graph
    projection every production similarity graph uses, bounding
    projected degree at 2K regardless of corpus density (an absolute
    shared-count edge rule projects TPC-H's uniform incidence into a
    near-complete graph: measured 166M triangles / 36 s at sf0.1;
    this form is 1000x smaller and density-invariant). The
    graph-density primitive (community structure, spam-ring
    detection) missing from the PageRank/HITS family.

    Counting uses DEGREE-ORDERED ORIENTATION (the classic O(m^1.5)
    bound): each undirected edge is directed from its lower-(deg, id)
    endpoint, wedges are generated only from out-neighbor pairs —
    out-degree under this orientation is O(sqrt(m)) — and each
    triangle closes exactly once via a join back to the undirected
    edge set. No vertex ever enumerates its full neighborhood
    unordered, so hub suppliers cannot explode the wedge join; the
    upstream CN_FANOUT_CAP bounds the projection itself (the
    g_common_neighbors contract).

    Output one row: (n_nodes, n_edges, n_wedges, n_triangles,
    closed_ppm) with closed_ppm = 3*10^6*triangles DIV wedges
    (wedges = sum over v of C(deg_v, 2)) — all integer-exact. The
    three 1-row aggregates meet in scalar crossjoins (the allowlisted
    broadcast-anchor pattern)."""
    und = _knn_sim_edges(spark, sf_dir)
    inc = und.select(F.col("a").alias("v")).unionAll(
        und.select(F.col("b").alias("v"))
    )
    deg = inc.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    ed = und.join(
        deg.select(F.col("v").alias("a"), F.col("deg").alias("dega")), "a"
    ).join(deg.select(F.col("v").alias("b"), F.col("deg").alias("degb")), "b")
    fwd = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedge = o1.join(
        o2,
        (F.col("o1.u") == F.col("o2.u")) & (F.col("o1.v") < F.col("o2.v")),
    ).select(F.col("o1.v").alias("x"), F.col("o2.v").alias("y"))
    tri = wedge.join(
        und, (F.col("x") == F.col("a")) & (F.col("y") == F.col("b"))
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    nodes = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.coalesce(F.sum(F.expr("deg * (deg - 1) DIV 2")), F.lit(0))
        .cast("bigint")
        .alias("n_wedges"),
    )
    edges_c = und.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        nodes.crossJoin(edges_c)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.expr(
                "CAST(CASE WHEN n_wedges = 0 THEN 0 "
                "ELSE (3000000 * n_triangles) DIV n_wedges END AS BIGINT)"
            ).alias("closed_ppm"),
        )
    )


def _knn_sim_edges_sql() -> str:
    """CTE chain ending in ``und (a, b)`` — the DuckDB twin of
    :func:`_knn_sim_edges`."""
    return f"""raw AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), e AS (
  SELECT cust, supp FROM (
    SELECT cust, supp,
           ROW_NUMBER() OVER (PARTITION BY cust ORDER BY supp) AS rn
    FROM raw
  ) WHERE rn <= {CN_FANOUT_CAP}
), pairs AS MATERIALIZED (
  SELECT a.supp AS a, b.supp AS b, COUNT(*) AS shared
  FROM e a JOIN e b ON a.cust = b.cust AND a.supp < b.supp
  GROUP BY 1, 2 HAVING COUNT(*) >= {TRI_MIN_SHARED}
), sym AS (
  SELECT a AS v, b AS w, shared FROM pairs
  UNION ALL
  SELECT b AS v, a AS w, shared FROM pairs
), topk AS (
  SELECT v, w FROM (
    SELECT v, w,
           ROW_NUMBER() OVER (PARTITION BY v
               ORDER BY shared DESC, w ASC) AS rn
    FROM sym
  ) WHERE rn <= {TRI_KNN_K}
), und AS MATERIALIZED (
  SELECT DISTINCT LEAST(v, w) AS a, GREATEST(v, w) AS b FROM topk
)"""


_register(
    "g_triangles",
    g_triangles,
    f"""WITH {_knn_sim_edges_sql()}, deg AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und
  ) GROUP BY v
), oriented AS (
  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
              THEN u.a ELSE u.b END AS u,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
              THEN u.b ELSE u.a END AS v
  FROM und u JOIN deg da ON da.v = u.a JOIN deg db ON db.v = u.b
), wedge AS (
  SELECT o1.v AS x, o2.v AS y
  FROM oriented o1 JOIN oriented o2 ON o1.u = o2.u AND o1.v < o2.v
), tri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM wedge w JOIN und t ON t.a = w.x AND t.b = w.y
), nodes AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(COALESCE(SUM(deg * (deg - 1) // 2), 0) AS BIGINT) AS n_wedges
  FROM deg
), edges_c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM und
)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       CAST(CASE WHEN n_wedges = 0 THEN 0
            ELSE (3000000 * n_triangles) // n_wedges END AS BIGINT)
           AS closed_ppm
FROM nodes, edges_c, tri""",
)


# ---------------------------------------------------------------------------
# k-core trim (r16)
# ---------------------------------------------------------------------------

#: peel nodes with degree below this from the kNN similarity graph —
#: set between the fixture graph's min degree (8 — every node picks
#: its own top-8) and its mean (~13): K=9 peels a live cascade at
#: every SF without emptying the graph (K=12 emptied sf0.01 by round
#: 3; K=6 removed nothing).
KCORE_K = 9
KCORE_ROUNDS = 3


def g_kcore_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative k-core peeling on the supplier top-K similarity graph
    (KCORE_ROUNDS rounds, unrolled — the HITS/PageRank fixed-depth
    oracle pattern): each round drops every node whose CURRENT degree
    is < KCORE_K, then the edges touching it; the removal cascades.
    The standard pre-filter before community/triangle analysis (peel
    the sparse periphery so the dense core is what gets mined), and
    the graph-side analogue of the dedup pipeline's低-quality trim.

    Output one row per round: (round, n_removed, n_edges_after) —
    n_removed counts nodes peeled THAT round (isolated nodes vanish
    with their last edge and are never re-counted).

    Scale shape: per round one degree aggregate (map-side combine,
    |V|-row result) and one double semi-join of edges against the
    keep set — the same |V|-row-shuffle-per-round discipline as the
    registered PageRank loop; each round's edge set is persisted once
    and feeds the next round plus its own count. Production runs
    data-dependent rounds to a fixpoint; the registered form pins the
    depth so the DuckDB twin unrolls exactly."""
    edges = _knn_sim_edges(spark, sf_dir)
    per_round = []
    for rnd in range(1, KCORE_ROUNDS + 1):
        inc = edges.select(F.col("a").alias("v")).unionAll(
            edges.select(F.col("b").alias("v"))
        )
        deg = inc.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= KCORE_K).select("v")
        removed = deg.filter(F.col("deg") < KCORE_K).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_removed")
        )
        # localCheckpoint, not persist: each round's plan otherwise
        # stacks every prior round's lineage and replanning grows
        # superlinearly (measured: round 3 at 13 s vs 2 s with the cut
        # — the same lesson as the connected-components loop).
        edges = (
            edges.join(keep.withColumnRenamed("v", "a"), "a")
            .join(keep.withColumnRenamed("v", "b"), "b")
            .select("a", "b")
            .localCheckpoint()
        )
        per_round.append(
            removed.crossJoin(
                edges.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_edges_after")
                )
            ).select(
                F.lit(rnd).cast("int").alias("round"),
                "n_removed",
                "n_edges_after",
            )
        )
    out = per_round[0]
    for df in per_round[1:]:
        out = out.unionAll(df)
    return out.orderBy("round")


def _kcore_round_sql(rnd: int) -> str:
    """One unrolled peel round — the single source of the oracle's
    update rule (e{rnd-1} -> deg/keep/rm/e{rnd}/ec{rnd})."""
    p, c = rnd - 1, rnd
    return f"""deg{c} AS (
  SELECT v, COUNT(*) AS deg FROM (
    SELECT a AS v FROM e{p} UNION ALL SELECT b FROM e{p}
  ) GROUP BY v
), keep{c} AS (
  SELECT v FROM deg{c} WHERE deg >= {KCORE_K}
), rm{c} AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_removed
  FROM deg{c} WHERE deg < {KCORE_K}
), e{c} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{p} e
  JOIN keep{c} ka ON ka.v = e.a
  JOIN keep{c} kb ON kb.v = e.b
), ec{c} AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges_after FROM e{c}
)"""


def _kcore_sql() -> str:
    rounds = ",\n".join(_kcore_round_sql(r) for r in range(1, KCORE_ROUNDS + 1))
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INTEGER) AS round, rm{r}.n_removed,"
        f" ec{r}.n_edges_after FROM rm{r}, ec{r}"
        for r in range(1, KCORE_ROUNDS + 1)
    )
    return f"""WITH {_knn_sim_edges_sql()}, e0 AS (
  SELECT a, b FROM und
),
{rounds}
{selects}
ORDER BY round"""


_register("g_kcore_trim", g_kcore_trim, _kcore_sql())


#: synchronous LPA rounds — fixed depth so the oracle unrolls exactly
#: (production runs to label stability, the kcore/pagerank pattern)
LPA_ROUNDS = 3


def g_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (Raghavan LPA) on the supplier
    top-K similarity graph — community detection, the third consumer
    of the shared kNN projection (triangles and k-core are the other
    two). Distinct from the connected-components canonicalizers: CC's
    min-label rule converges to one label per component; LPA adopts
    each node's MOST FREQUENT neighbor label (tie → smallest), so
    dense sub-communities keep distinct labels inside one component.

    Every update is synchronous from the PREVIOUS round's labels
    (asynchronous LPA is execution-order-dependent — unusable under
    a cross-engine value oracle); the frequency count + (count DESC,
    label ASC) pick is exact integer arithmetic, so three unrolled
    rounds are bit-reproducible in both engines.

    Scale shape: per round one (v, label)-keyed count aggregate
    (map-side combine) and one rn=1 window pick that plans as a
    map-side WindowGroupLimit (≤1 row per (v, partition) crosses the
    exchange — measured faster than a max(struct) SortAggregate, see
    the in-loop note) — the registered PageRank loop discipline
    (per-round state is the |V|-row label relation, never the edge
    list); labels localCheckpointed per round (lineage-stacking
    lesson, measured on the k-core loop). Output: (node, community)
    after LPA_ROUNDS."""
    from pyspark.sql import Window

    edges = _knn_sim_edges(spark, sf_dir)
    inc = (
        edges.select(F.col("a").alias("v"), F.col("b").alias("nbr"))
        .unionAll(
            edges.select(F.col("b").alias("v"), F.col("a").alias("nbr"))
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = inc.select("v").distinct().withColumn("label", F.col("v"))
    w = Window.partitionBy("v").orderBy(
        F.col("c").desc(), F.col("label").asc()
    )
    for _ in range(LPA_ROUNDS):
        cand = (
            inc.join(
                labels.withColumnRenamed("v", "nbr"), "nbr"
            )
            .groupBy("v", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # DELIBERATELY a window, not a max(struct) aggregate (r17
        # optimization round, VERDICT r16 #5 sweep): the rn=1 filter
        # already plans as WindowGroupLimit BEFORE the exchange
        # (Spark 3.5+ top-k pushdown — map-side partial argmax), so
        # the plan moves ≤1 row per (v, partition) exactly like a
        # partial aggregate; the tried max(struct(c, -label, label))
        # conversion planned as SortAggregate (struct buffers are not
        # hash-aggregable) and measured 3.0 -> 5.6 s on an interleaved
        # A/B. Plan evidence: plans/r17/g_label_prop_before.txt
        # (lpa_round stages).
        labels = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("v", "label")
        )
        record_stage_plan("lpa_round", labels)
        labels = labels.localCheckpoint()
    return labels.select(
        F.col("v").cast("bigint").alias("node"),
        F.col("label").cast("bigint").alias("community"),
    ).orderBy("node")


def _lpa_round_sql(rnd: int) -> str:
    p, c = rnd - 1, rnd
    return f"""l{c} AS MATERIALIZED (
  SELECT v, label FROM (
    SELECT i.v, l.label, COUNT(*) AS cnt,
           ROW_NUMBER() OVER (PARTITION BY i.v
                              ORDER BY COUNT(*) DESC, l.label ASC) AS rn
    FROM inc i JOIN l{p} l ON l.v = i.nbr
    GROUP BY i.v, l.label
  ) WHERE rn = 1
)"""


def _lpa_sql() -> str:
    rounds = ",\n".join(_lpa_round_sql(r) for r in range(1, LPA_ROUNDS + 1))
    return f"""WITH {_knn_sim_edges_sql()}, inc AS MATERIALIZED (
  SELECT a AS v, b AS nbr FROM und
  UNION ALL
  SELECT b AS v, a AS nbr FROM und
), l0 AS (
  SELECT DISTINCT v, v AS label FROM inc
),
{rounds}
SELECT CAST(v AS BIGINT) AS node, CAST(label AS BIGINT) AS community
FROM l{LPA_ROUNDS} ORDER BY node"""


_register("g_label_prop", g_label_prop, _lpa_sql())
