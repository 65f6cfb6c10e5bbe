"""Similarity search over embedding columns (ANN extension surface).

Two paths, same output shape (query_id, neighbor_id, rnk, cosine):

- :func:`knn_bruteforce` — exact top-k: crossjoin queries × corpus,
  fold-based cosine (functions.vector), per-query top-k window. The
  correctness baseline; O(Q·N·d).
- :func:`knn_lsh` — sign-LSH bucketed: hash every vector into one of
  256 hyperplane-sign buckets, equi-join on bucket, top-k within the
  candidates. The scale path: the shuffle is on an int bucket key, and
  recall is tunable by planes/bands (document-level recall tested in
  tests/test_similarity.py).
- :func:`cosine_neardup_pairs` — embedding near-dup for the dedup
  suite: all pairs above a cosine threshold.

At 100 TB the brute-force variant survives as the re-rank stage: IVF
or LSH prunes candidates, brute-force scores them. Neither path ever
collects to the driver; the top-k is a window, not a sort-limit on the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from f1_realtime_data_pipeline_spark.functions.vector import (
    LSH_TABLES,
    cosine,
    cosine_sql,
    lsh_bucket,
    lsh_bucket_sql,
    lsh_table_bucket,
    lsh_table_bucket_sql,
)


def knn_bruteforce(
    embeddings: DataFrame,
    n_queries: int = 16,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for the first ``n_queries`` vectors (by id)."""
    q = embeddings.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "cosine")
    )


def knn_bruteforce_sql(n_queries: int = 16, k: int = 5) -> str:
    cos = cosine_sql("q.embedding", "c.embedding")
    return f"""WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {cos} AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < {n_queries}
)
SELECT query_id, neighbor_id, rnk, cosine FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= {k}"""


def lsh_buckets(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Every vector's sign-LSH bucket (deterministic hyperplanes)."""
    return embeddings.select(
        F.col(id_col).alias("vec_id"), lsh_bucket(F.col(vec_col)).alias("bucket")
    )


LSH_BUCKETS_SQL = f"""SELECT vec_id, {lsh_bucket_sql("embedding")} AS bucket
FROM embeddings"""


def knn_lsh(
    embeddings: DataFrame,
    n_queries: int = 16,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: multi-table sign-LSH candidates, exact re-rank.

    Each vector lands in ``LSH_TABLES`` buckets (one per 4-plane
    table); a pair is a candidate if it collides in ANY table —
    per-pair recall 1-(1-p^4)^L vs p^8 for a single 8-plane table.
    Candidates equi-join on (table, bucket) — an int-pair shuffle key,
    never a crossjoin; the exact cosine touches candidates only.
    Queries whose buckets hold < k candidates return fewer rows — the
    recall/speed trade the (tables, planes) knobs control."""
    tabs = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_table_bucket(F.col(vec_col), t).alias("bkt"),
                    )
                    for t in range(LSH_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("vid", "v", F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt"))
    q = tabs.filter(F.col("vid") < n_queries).select(
        F.col("vid").alias("query_id"), F.col("v").alias("qv"), "tbl", "bkt"
    )
    c = tabs.select(F.col("vid").alias("neighbor_id"), F.col("v").alias("cv"), "tbl", "bkt")
    cand = (
        q.join(c, ["tbl", "bkt"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn("cosine", cosine(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "cosine")
    )


def knn_lsh_sql(n_queries: int = 16, k: int = 5) -> str:
    cos = cosine_sql("q.embedding", "c.embedding")
    per_table = "\n  UNION ALL\n  ".join(
        f"SELECT vec_id, embedding, {t} AS tbl, {lsh_table_bucket_sql('embedding', t)} AS bkt"
        " FROM embeddings"
        for t in range(LSH_TABLES)
    )
    return f"""WITH tabs AS (
  {per_table}
), cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM tabs q JOIN tabs c
    ON q.tbl = c.tbl AND q.bkt = c.bkt AND q.vec_id <> c.vec_id
  WHERE q.vec_id < {n_queries}
), scored AS (
  SELECT cand.query_id, cand.neighbor_id, {cos} AS cosine
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.query_id
  JOIN embeddings c ON c.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, rnk, cosine FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= {k}"""


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs: cosine >= threshold, doc_a < doc_b.
    Brute-force all-pairs here; the LSH bucket join is the drop-in
    candidate generator at scale (same verify expression)."""
    a = embeddings.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def cosine_neardup_pairs_sql(threshold: float = 0.9) -> str:
    cos = cosine_sql("a.embedding", "b.embedding")
    return f"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {cos} >= {threshold}"""
