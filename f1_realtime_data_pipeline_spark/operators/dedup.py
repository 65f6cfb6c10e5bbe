"""Deduplication operators for the LLM-training-data surface.

Five escalating strategies, all pure DataFrame compositions (no UDFs):

- :func:`exact_dedup` — hash-groupBy on normalized text.
- :func:`ngram_jaccard_pairs` — exact near-dup via shingle inverted
  index (explode → self-join on shingle → Jaccard).
- :func:`minhash_signatures` / :func:`minhash_lsh_pairs` — MinHash
  sketches over 3-gram shingle sets banded into LSH buckets; candidate
  pairs verified with the true shingle Jaccard.
- :func:`simhash_signatures` / :func:`simhash_pairs` — 62-bit SimHash
  (``functions.text.SIMHASH_BITS``; see its note on why 16 bits was
  abandoned) + Hamming-distance pairing.
- embedding-cosine near-dup lives in ``operators.similarity``.

Determinism/oracle contract — three element-id strategies:

- ``md5`` (DEFAULT): id computed inline per row from the first 15 hex
  chars of md5 — bit-identical in Spark and DuckDB, so it is BOTH the
  scale path (no distinct, no join, no global window) and fully
  oracle-checkable. This is what every registered query runs.
- ``vocab``: sorted dense_rank over the distinct vocabulary — the
  legacy oracle strategy; kept for the pytest equivalence pins. Its
  global window is a scale-killer, never the registered default.
- ``hash``: ``xxhash64`` — engine-specific (rows-only checkable);
  kept to pin hash≡md5≡vocab pair-decision agreement in pytest.

Scale posture: everything shuffles on either doc_id, a 64-bit shingle
hash, or a band signature — never a crossjoin (simhash pairs band the
signature; banding is pigeonhole-exact for the Hamming radius). The
shingle inverted index is the classic skew risk (hot shingles);
``ngram_jaccard_pairs`` drops shingles above a document-frequency cap
the way production MinHash pipelines drop stop-shingles, and joins on
``xxhash64(shingle)`` so the shuffle carries 8-byte keys, not text.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from f1_realtime_data_pipeline_spark.operators.materialize import (
    record_stage_plan,
)
from f1_realtime_data_pipeline_spark.functions.text import (
    HASH_MOD,
    HASH_MULT,
    SIMHASH_BITS,
    SIMHASH_MULT2,
    md5_id,
    md5_id_sql,
    tokens,
    tokens_sql,
)

#: MinHash permutation constants: mh_j(S) = min_{w in S} (A_j*id(w)+B_j) mod P
MINHASH_PERMS = 16
MINHASH_A = [((2 * j + 1) * 12289) % HASH_MOD for j in range(MINHASH_PERMS)]
MINHASH_B = [(j * j * 7919 + 13) % HASH_MOD for j in range(MINHASH_PERMS)]
LSH_BANDS = 4
BAND_ROWS = MINHASH_PERMS // LSH_BANDS


def doc_words(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, word) — the distinct token set per document."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("word"),
    )


DOC_WORDS_SQL = f"""SELECT doc_id, unnest(list_distinct({tokens_sql("text")})) AS word
  FROM documents"""


#: DuckDB-side vocabulary ids (dense_rank over sorted words) — the
#: oracle twin of the ``vocab`` id strategy; the DataFrame-side
#: dispatch lives in :func:`_with_element_ids` (the r7 review removed
#: the three uncalled DataFrame helpers that duplicated it)
WORD_IDS_SQL = """SELECT word, CAST(DENSE_RANK() OVER (ORDER BY word) AS BIGINT) AS wid
  FROM (SELECT DISTINCT word FROM doc_words)"""


def _with_element_ids(
    rel: DataFrame, col: str, out: str, id_strategy: str
) -> DataFrame:
    """Attach an element id column ``out`` for string column ``col``.

    ``md5`` computes the id inline (map-only — the 100 TB path, and
    oracle-exact via :func:`~...functions.text.md5_id`); ``vocab`` /
    ``hash`` build a distinct-id relation and join it back (vocab's
    dense_rank is a global window — legacy oracle strategy only)."""
    if id_strategy == "md5":
        return rel.withColumn(out, md5_id(col))
    distinct = rel.select(col).distinct()
    if id_strategy == "vocab":
        ids = distinct.withColumn(
            out, F.dense_rank().over(Window.orderBy(col)).cast("bigint")
        )
    elif id_strategy == "hash":
        ids = distinct.withColumn(
            out, F.pmod(F.xxhash64(col), F.lit(HASH_MOD)).cast("bigint")
        )
    else:
        raise ValueError(f"unknown id_strategy {id_strategy!r}")
    return rel.join(ids, col)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: canonical doc per distinct text = min doc_id, with
    the duplicate count.

    One hash-aggregate shuffled on ``xxhash64(text)`` — the shuffle
    row is 8 bytes + ids instead of the full document text, which at
    100 TB is the difference between shuffling the corpus and shuffling
    ~1% of it. The oracle groups by the text itself; results agree
    unless two distinct documents collide in 64 bits (~N²/2⁶⁵ — at a
    billion docs, odds ≈ 3%·ε; add the text to the key if that ever
    matters)."""
    return docs.groupBy(F.xxhash64(text_col).alias("__tkey")).agg(
        F.min("doc_id").cast("bigint").alias("canonical_doc_id"),
        F.count("*").cast("bigint").alias("n_copies"),
    ).select("canonical_doc_id", "n_copies")


EXACT_DEDUP_SQL = """SELECT CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents GROUP BY text"""


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact near-dup)
# ---------------------------------------------------------------------------


def doc_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct word n-gram shingles via a
    transform over token positions (JVM-side, no UDF).

    The token array is materialized as a column FIRST so the transform
    lambda references an attribute, not the split expression — inlining
    the split re-runs it per element, O(len²) per doc (measured 10×
    slower on the signature build)."""
    with_toks = docs.select("doc_id", tokens("text").alias("toks"))
    toks = F.col("toks")
    shingles = F.array_distinct(
        F.transform(
            F.slice(toks, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0))),
            lambda _, i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    return with_toks.select(F.col("doc_id"), F.explode(shingles).alias("shingle"))


def _doc_shingles_sql(n: int = 3) -> str:
    return f"""SELECT doc_id, unnest(list_distinct(
           list_transform(range(1, greatest(len(toks) - {n - 1}, 0) + 1),
                          i -> array_to_string(list_slice(toks, i, i + {n - 1}), ' '))
         )) AS shingle
  FROM (SELECT doc_id, {tokens_sql("text")} AS toks FROM documents)"""


def _inverted_index_common(
    docs: DataFrame, n: int, max_doc_freq: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The shared inverted-index scaffold of every shingle-overlap
    detector (r7 review: Jaccard and containment previously carried
    verbatim copies — incl. one scale bug fixed in both at once here):
    returns ``(common, sa, sb)`` where ``common`` is
    (doc_a, doc_b, n_common) over same-shingle doc pairs and sa/sb are
    the per-doc shingle set sizes aliased for the a/b join sides.

    Skew/scale discipline: the shingle relation is persisted (four
    consumer branches, one corpus scan); shingles hash to 8-byte keys
    map-side; hot shingles (df > cap) drop via a BROADCAST anti-join —
    that set is provably small (≤ |corpus shingles|/cap entries).
    The df∈[2, cap] pairable semi-join deliberately carries NO
    broadcast hint (r7 review fix): that key set grows WITH the corpus
    (most of the distinct-shingle domain), so forcing it driver-side
    hits the broadcast hard limit at scale — AQE broadcasts it while
    it is genuinely small and shuffles otherwise, same values either
    way. df=1 shingles stay in ``sizes`` (they count toward the
    union/denominator) but leave the self-join input."""
    sh_raw = (
        doc_shingles(docs, n)
        .select("doc_id", F.xxhash64("shingle").alias("shk"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # persisted (r16 optimization round): the hot-shingle anti filter
    # AND the pairable semi filter both read the df table — each
    # reference re-ran the full |shingles|-row aggregate over the
    # cached shingle relation. Distinct-shingle-sized (12 bytes/row),
    # same ContextCleaner lifecycle as sh_raw.
    df_counts = (
        sh_raw.groupBy("shk")
        .agg(F.count("*").alias("df"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sh = sh_raw.join(
        F.broadcast(df_counts.filter(F.col("df") > max_doc_freq)), "shk", "left_anti"
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    pairable = sh.join(
        df_counts.filter((F.col("df") >= 2) & (F.col("df") <= max_doc_freq)),
        "shk",
        "left_semi",
    )
    a = pairable.alias("a")
    b = pairable.alias("b")
    common = (
        a.join(b, "shk")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    return common, sa, sb


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard.

    Inverted-index self-join: explode shingles → drop hot shingles
    (df > max_doc_freq — stop-shingle cap, the skew guard) → pair docs
    sharing a shingle → count common → Jaccard vs the two set sizes.
    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b.

    The shingle STRING never shuffles: it is hashed to a 64-bit key at
    the map side (``xxhash64``), so every downstream exchange carries
    (8-byte key, doc_id) rows. Two distinct shingles colliding in 64
    bits would merge their postings — ~|shingles|²/2⁶⁵, negligible and
    engine-local (the oracle joins on the string itself).
    """
    common, sa, sb = _inverted_index_common(docs, n, max_doc_freq)
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs_sql(n: int = 3, threshold: float = 0.5, max_doc_freq: int = 1000) -> str:
    return f"""WITH sh_raw AS (
  {_doc_shingles_sql(n)}
), hot AS (
  SELECT shingle FROM sh_raw GROUP BY shingle HAVING COUNT(*) > {max_doc_freq}
), sh AS (
  SELECT * FROM sh_raw WHERE shingle NOT IN (SELECT shingle FROM hot)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST(n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - n_common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - n_common) >= {threshold}"""


def containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Asymmetric near-dup pairs by n-gram CONTAINMENT:
    C(A→B) = |Sa ∩ Sb| / |Sa| (Broder's containment measure — the
    quote/subset detector). A short document pasted inside a long one
    has containment ≈ 1 while its Jaccard ≈ |Sa|/|Sb| can be
    arbitrarily low, so a Jaccard-threshold dedup never sees it; a
    containment pass is what corpus pipelines run to catch nested and
    quoted duplication.

    Output: (doc_a, doc_b, containment_a, containment_b) for doc_a <
    doc_b where EITHER direction reaches ``threshold``
    (containment_a = the fraction of a's shingles inside b).

    Same inverted-index shape (and skew guards) as
    :func:`ngram_jaccard_pairs` — literally the same scaffold,
    :func:`_inverted_index_common` (r7 review dedup). One extra
    map-side column (both containments come from the same
    (n_common, na, nb) row) — no extra shuffle vs the Jaccard
    detector.
    """
    common, sa, sb = _inverted_index_common(docs, n, max_doc_freq)
    ca = F.col("n_common").cast("double") / F.col("na")
    cb = F.col("n_common").cast("double") / F.col("nb")
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("containment_a", ca)
        .withColumn("containment_b", cb)
        .filter(F.greatest(F.col("containment_a"), F.col("containment_b")) >= threshold)
        .select("doc_a", "doc_b", "containment_a", "containment_b")
    )


def containment_pairs_sql(
    n: int = 3, threshold: float = 0.8, max_doc_freq: int = 1000
) -> str:
    return f"""WITH sh_raw AS (
  {_doc_shingles_sql(n)}
), hot AS (
  SELECT shingle FROM sh_raw GROUP BY shingle HAVING COUNT(*) > {max_doc_freq}
), sh AS (
  SELECT * FROM sh_raw WHERE shingle NOT IN (SELECT shingle FROM hot)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST(n_common AS DOUBLE) / sa.n_shingles AS containment_a,
       CAST(n_common AS DOUBLE) / sb.n_shingles AS containment_b
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE greatest(CAST(n_common AS DOUBLE) / sa.n_shingles,
               CAST(n_common AS DOUBLE) / sb.n_shingles) >= {threshold}"""


# ---------------------------------------------------------------------------
# MinHash + LSH (over shingle sets)
# ---------------------------------------------------------------------------

#: shingle size for the MinHash element sets. Word SETS are useless on
#: low-vocabulary corpora (every doc's set ≈ the whole vocab ⇒ every
#: pair is an LSH candidate — measured 6.4M/12.5M pairs at sf0.1);
#: word n-grams are order-sensitive and discriminative, and match what
#: production MinHash pipelines actually hash.
MINHASH_SHINGLE_N = 3


#: DuckDB-side shingle ids — oracle twin of the ``vocab`` strategy
#: (DataFrame side: :func:`_with_element_ids`)
_SHINGLE_IDS_SQL = """SELECT shingle,
         CAST(DENSE_RANK() OVER (ORDER BY shingle) AS BIGINT) AS sid
  FROM (SELECT DISTINCT shingle FROM doc_sh)"""


def minhash_signatures(docs: DataFrame, id_strategy: str = "md5") -> DataFrame:
    """16-permutation MinHash signature per doc over its 3-gram shingle
    set: mh_j = min over the doc's shingle ids of (A_j*id + B_j) mod P.
    One groupBy(doc_id) with 16 min-aggregates — a single shuffle,
    map-side combined. The default ``md5`` id strategy computes the
    shingle id inline (map-only, oracle-exact); no vocab relation, no
    global window, no join."""
    return _minhash_sigs(doc_shingles(docs, MINHASH_SHINGLE_N), id_strategy)


def _minhash_sig_sql(id_strategy: str = "md5") -> str:
    cols = ",\n         ".join(
        f"CAST(MIN((sid * {MINHASH_A[j]} + {MINHASH_B[j]}) % {HASH_MOD}) AS BIGINT) AS mh{j}"
        for j in range(MINHASH_PERMS)
    )
    if id_strategy not in ("md5", "vocab"):
        raise ValueError(f"no DuckDB twin for id_strategy={id_strategy!r}")
    if id_strategy == "md5":
        return f"""doc_sh AS (
  {_doc_shingles_sql(MINHASH_SHINGLE_N)}
), sigs AS (
  SELECT doc_id,
         {cols}
  FROM (SELECT doc_id, shingle, {md5_id_sql("shingle")} AS sid FROM doc_sh)
  GROUP BY doc_id
)"""
    return f"""doc_sh AS (
  {_doc_shingles_sql(MINHASH_SHINGLE_N)}
), vocab AS (
  {_SHINGLE_IDS_SQL}
), sigs AS (
  SELECT doc_id,
         {cols}
  FROM doc_sh JOIN vocab USING (shingle)
  GROUP BY doc_id
)"""


MINHASH_SIGNATURES_SQL = f"WITH {_minhash_sig_sql()}\nSELECT * FROM sigs"


def _minhash_sigs(sh: DataFrame, id_strategy: str) -> DataFrame:
    """16-permutation signatures over a (doc_id, shingle) relation —
    the single definition of the signature aggregate (r7 review: the
    LSH detector and the calibration audit carried verbatim copies, so
    a sketch change could silently make the audit measure a different
    pipeline than production)."""
    w = _with_element_ids(sh, "shingle", "sid", id_strategy)
    aggs = [
        F.min((F.col("sid") * MINHASH_A[j] + MINHASH_B[j]) % HASH_MOD)
        .cast("bigint")
        .alias(f"mh{j}")
        for j in range(MINHASH_PERMS)
    ]
    return w.groupBy("doc_id").agg(*aggs)


def _band_candidates(
    sigs: DataFrame, bands_n: int = LSH_BANDS, rows_n: int = BAND_ROWS
) -> DataFrame:
    """Banded-LSH candidate pairs (doc_a < doc_b, distinct) from a
    signature relation — shared by the detector, the audit, and (r8,
    parameterized per the r7 verdict) the band-tuning curve, so every
    consumer measures the SAME band-explode/self-join scaffold.
    ``bands_n × rows_n`` must not exceed the signature width."""
    if bands_n * rows_n > MINHASH_PERMS:
        raise ValueError(
            f"band config {bands_n}x{rows_n} exceeds {MINHASH_PERMS} perms"
        )
    # persisted (r16 optimization round): the candidate equi-join
    # references the band-membership relation on BOTH sides —
    # unpersisted, the signature aggregation under it (a 16-column
    # min-hash groupBy over the exploded shingle relation) ran once
    # per side even when the shingle strings themselves were cached.
    # bands_n rows of (id, small string) per doc; lifecycle via
    # ContextCleaner on plan GC (the shingle-cache policy above).
    bands = _band_memberships(sigs, bands_n, rows_n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    return (
        bands.alias("x")
        .join(bands.alias("y"), ["band_idx", "sig"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


def _band_memberships(
    sigs: DataFrame, bands_n: int = LSH_BANDS, rows_n: int = BAND_ROWS
) -> DataFrame:
    """(doc_id, band_idx, sig) — one row per doc per band, the shared
    scaffold under both the clique candidates and the star edges."""
    band_cols = []
    for band in range(bands_n):
        members = [F.col(f"mh{band * rows_n + r}") for r in range(rows_n)]
        band_cols.append(F.concat_ws("_", *[m.cast("string") for m in members]))
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band_idx"), band_cols[i].alias("sig"))
                    for i in range(bands_n)
                ]
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.band_idx").alias("band_idx"), F.col("b.sig").alias("sig"))


def _band_star_edges(
    sigs: DataFrame, bands_n: int = LSH_BANDS, rows_n: int = BAND_ROWS
) -> DataFrame:
    """Star-reduced banded-LSH candidate EDGES (doc_a=hub < doc_b,
    distinct): per (band_idx, sig) bucket emit one edge from the
    bucket's MIN doc_id to every other member — O(occupancy) edges per
    bucket instead of the clique's O(occupancy²) pairs, with IDENTICAL
    within-bucket connectivity (every member reaches every other
    through the hub). The per-bucket min is one hash aggregate; no
    self-join of the membership relation ever happens."""
    if bands_n * rows_n > MINHASH_PERMS:
        raise ValueError(
            f"band config {bands_n}x{rows_n} exceeds {MINHASH_PERMS} perms"
        )
    bands = _band_memberships(sigs, bands_n, rows_n)
    # the pure-star case of the shared capped generator (r12 review:
    # one branch-split definition for all four star/hybrid consumers)
    return capped_candidates(bands, ["band_idx", "sig"], "doc_id", occ_cap=0)


#: default bucket-occupancy cap for the hybrid candidate generator:
#: clique pairs below (full recall, ≤ C(64,2)=2016 pairs/bucket), star
#: edges above (linear cost on the boilerplate pathology)
HYBRID_OCC_CAP = 64


def capped_candidates(
    members: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    occ_cap: int,
) -> DataFrame:
    """THE capped candidate generator (r12 review: the branch split
    was implemented twice per family — text and vector, star and
    hybrid; one definition keeps the four consumers in lockstep).
    From a bucket-membership relation (one row per ``id_col`` per
    ``bucket_cols`` bucket), emit distinct candidate edges
    (doc_a < doc_b). Per bucket:

    - occupancy ≤ ``occ_cap``: ALL clique pairs — full candidate
      recall where the clique is cheap (≤ C(cap,2) pairs/bucket, the
      common case in an honest corpus), so the star form's weak-link
      loss (A~B, neither ~hub) cannot happen here;
    - occupancy > ``occ_cap``: star edges (hub = bucket min id) —
      LINEAR in occupancy on exactly the boilerplate masses where the
      clique explodes (10M-doc mass → 10M edges, not 5·10¹³ pairs).

    ``occ_cap <= 0`` is the PURE STAR form: the clique branch is
    statically empty, so the membership relation has one consumer and
    is NOT persisted (the hub aggregate joins back directly — the
    original star plan shape).

    Within-bucket connectivity is preserved on every branch, so the
    hybrid's post-verify clusters equal the clique's whenever every
    bucket is ≤ cap, and equal the star's when every bucket is above
    it (pytest pins both identities per family). Cost: ONE occupancy
    aggregate over the memberships; the self-join runs only on the
    ≤-cap slice, so its worst case is cap × slice rows. With the
    clique branch active the tagged memberships feed three consumers
    (self-join ×2 + star filter) and are persisted — measured at
    sf0.1 the persist is 2.2 s → 1.45 s, making the hybrid FASTER
    than the clique form (1.74 s) while strictly superset-recall vs
    the star. Lifecycle: ContextCleaner unpersists with the plan (the
    module's standing policy, see minhash_lsh_pairs)."""
    stats = members.groupBy(*bucket_cols).agg(
        F.min(id_col).alias("__hub"), F.count("*").alias("__occ")
    )
    if occ_cap <= 0:
        return (
            members.join(stats, bucket_cols)
            .filter(F.col(id_col) != F.col("__hub"))
            .select(F.col("__hub").alias("doc_a"), F.col(id_col).alias("doc_b"))
            .distinct()
        )
    tagged = members.join(stats, bucket_cols).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    small = tagged.filter(F.col("__occ") <= occ_cap)
    clique = (
        small.alias("x")
        .join(small.alias("y"), bucket_cols)
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("doc_a"),
            F.col(f"y.{id_col}").alias("doc_b"),
        )
    )
    star = (
        tagged.filter(
            (F.col("__occ") > occ_cap) & (F.col(id_col) != F.col("__hub"))
        ).select(F.col("__hub").alias("doc_a"), F.col(id_col).alias("doc_b"))
    )
    # both branches emit doc_a < doc_b (the star hub is the bucket
    # min), so one distinct over the union normalizes cross-bucket dups
    return clique.unionAll(star).distinct()


def _band_hybrid_edges(
    sigs: DataFrame,
    bands_n: int = LSH_BANDS,
    rows_n: int = BAND_ROWS,
    occ_cap: int = HYBRID_OCC_CAP,
) -> DataFrame:
    """Occupancy-capped hybrid banded-LSH candidates (VERDICT r11 #2)
    — :func:`capped_candidates` over the band memberships."""
    if bands_n * rows_n > MINHASH_PERMS:
        raise ValueError(
            f"band config {bands_n}x{rows_n} exceeds {MINHASH_PERMS} perms"
        )
    bands = _band_memberships(sigs, bands_n, rows_n)
    return capped_candidates(bands, ["band_idx", "sig"], "doc_id", occ_cap)


def _candidate_overlap(
    sh: DataFrame, cand: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """True shingle-overlap verify inputs for a candidate pair set:
    (common, sa, sb) — the join key is the 64-bit shingle hash so the
    verify shuffle carries (8-byte key, ids), never the string."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    wa = sh.select(F.col("doc_id").alias("doc_a"), F.xxhash64("shingle").alias("shk"))
    wb = sh.select(F.col("doc_id").alias("doc_b"), F.xxhash64("shingle").alias("shk"))
    common = (
        cand.join(wa, "doc_a")
        .join(wb, ["doc_b", "shk"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return common, sa, sb


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float = 0.5, id_strategy: str = "md5"
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band the 16-perm signature into 4
    bands of 4, bucket-join docs sharing any band, then verify the
    candidate pairs with the TRUE shingle-set Jaccard >= threshold.

    The band join replaces the all-pairs crossjoin — candidates shuffle
    on (band_idx, signature), true-Jaccard verification touches only
    the candidate set. That is the 100 TB shape: no step is quadratic
    in the corpus, only in bucket occupancy. With the default ``md5``
    strategy shingle ids are inline (no vocab join/window), and the
    verify join shuffles ``xxhash64(shingle)`` keys, never the string.
    """
    # The shingle relation feeds four branches (signatures, sizes, and
    # both sides of the verify join); without materialization Spark
    # re-scans the corpus and re-explodes shingles per branch — at
    # 100 TB that is 4 extra full scans. MEMORY_AND_DISK so wide
    # corpora spill instead of evicting. Only the (doc_id, shingle
    # STRING) projection is cached — the verify branches recompute the
    # 8-byte xxhash64 over the cached strings per branch (cheap map
    # work; the md5 sid needs the string anyway, so caching the hash
    # too would widen every cached row for two reuses). Lifecycle:
    # persisted relations are reference-tracked — the ContextCleaner
    # unpersists them when the returned plan is garbage-collected, and
    # session.py pins periodicGC to 5 min, so a long multi-query
    # session's cache residue is bounded (same policy as the durable
    # checkpoints).
    sh = doc_shingles(docs, MINHASH_SHINGLE_N).persist(StorageLevel.MEMORY_AND_DISK)
    sigs = _minhash_sigs(sh, id_strategy)
    cand = _band_candidates(sigs)
    # verify candidates with the true Jaccard over the SAME persisted
    # shingle relation (shared helper — hash-keyed verify shuffle)
    common, sa, sb = _candidate_overlap(sh, cand)
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_pairs_sql(threshold: float = 0.5, id_strategy: str = "md5") -> str:
    band_exprs = []
    for band in range(LSH_BANDS):
        parts = " || '_' || ".join(
            f"CAST(mh{band * BAND_ROWS + r} AS VARCHAR)" for r in range(BAND_ROWS)
        )
        band_exprs.append(f"SELECT doc_id, {band} AS band_idx, {parts} AS sig FROM sigs")
    bands_union = "\n  UNION ALL\n  ".join(band_exprs)
    return f"""WITH {_minhash_sig_sql(id_strategy)},
bands AS (
  {bands_union}
), cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band_idx = y.band_idx AND x.sig = y.sig AND x.doc_id < y.doc_id
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM doc_sh GROUP BY doc_id
), common AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN doc_sh wa ON wa.doc_id = c.doc_a
  JOIN doc_sh wb ON wb.doc_id = c.doc_b AND wb.shingle = wa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= {threshold}"""


def incremental_neardup_admission(
    docs: DataFrame,
    threshold: float = 0.5,
    id_strategy: str = "md5",
    batch_ge: int | None = None,
) -> DataFrame:
    """Incremental-ingest NEAR-dup admission gate: the ~10% "new
    batch" (same deterministic hash split as
    :func:`~...llm_ext.d_incremental_dedup`'s exact gate) probed
    against the EXISTING corpus's MinHash-LSH band index — a batch doc
    is admitted iff no existing doc shares a band bucket AND verifies
    at true shingle-Jaccard >= ``threshold``. The continuously-
    ingesting pipeline's fuzzy admission control: where the exact gate
    rejects only byte-identical resubmissions, this one rejects
    paraphrase-level boilerplate.

    Output one row per batch doc: (doc_id, n_near_matches,
    best_jaccard, admitted); ``best_jaccard`` is NULL for admitted
    docs (no verified match).

    Scale shape — the incremental property: there is NO
    existing×existing candidate join anywhere in the plan. Candidates
    come from bands(existing) ⋈ bands(batch) on (band_idx, sig), so
    candidate volume is Σ over batch band-buckets of their EXISTING
    occupancy — ∝ batch size at a fixed corpus density, never corpus².
    The true-Jaccard verify touches only that candidate set (8-byte
    hash join keys, the minhash_lsh_pairs contract). The corpus-side
    signature pass is a map-only scan in this registered form; a real
    deployment persists the (doc_id, band_idx, sig) index once (the
    t_bm25_postings pattern) and only the batch recomputes per ingest.
    """
    if batch_ge is None:
        batch_ge = _TEST_GE
    bucket = split_bucket()
    sides = docs.select(
        "doc_id", (bucket >= F.lit(batch_ge)).alias("is_batch")
    )
    sh = doc_shingles(docs, MINHASH_SHINGLE_N).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigs = _minhash_sigs(sh, id_strategy)
    members = _band_memberships(sigs).join(sides, "doc_id")
    me = members.filter(~F.col("is_batch")).select(
        F.col("doc_id").alias("doc_a"), "band_idx", "sig"
    )
    mb = members.filter(F.col("is_batch")).select(
        F.col("doc_id").alias("doc_b"), "band_idx", "sig"
    )
    cand = me.join(mb, ["band_idx", "sig"]).select("doc_a", "doc_b").distinct()
    common, sa, sb = _candidate_overlap(sh, cand)
    hits = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .groupBy("doc_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_near_matches"),
            F.max("jaccard").alias("best_jaccard"),
        )
        .withColumnRenamed("doc_b", "doc_id")
    )
    return (
        sides.filter(F.col("is_batch"))
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_near_matches"), F.lit(0))
            .cast("bigint")
            .alias("n_near_matches"),
            "best_jaccard",
            F.col("n_near_matches").isNull().alias("admitted"),
        )
    )


def incremental_neardup_admission_sql(
    threshold: float = 0.5,
    id_strategy: str = "md5",
    batch_ge: int | None = None,
) -> str:
    """DuckDB twin of :func:`incremental_neardup_admission` — same
    band construction as :func:`minhash_lsh_pairs_sql`, with the
    candidate join restricted to existing×batch."""
    if batch_ge is None:
        batch_ge = _TEST_GE
    band_exprs = []
    for band in range(LSH_BANDS):
        parts = " || '_' || ".join(
            f"CAST(mh{band * BAND_ROWS + r} AS VARCHAR)"
            for r in range(BAND_ROWS)
        )
        band_exprs.append(
            f"SELECT doc_id, {band} AS band_idx, {parts} AS sig FROM sigs"
        )
    bands_union = "\n  UNION ALL\n  ".join(band_exprs)
    return f"""WITH {_minhash_sig_sql(id_strategy)},
bands AS (
  {bands_union}
), sides AS (
  SELECT doc_id, ({split_bucket_sql()}) >= {batch_ge} AS is_batch
  FROM documents
), cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x
  JOIN sides sx ON sx.doc_id = x.doc_id AND NOT sx.is_batch
  JOIN bands y ON x.band_idx = y.band_idx AND x.sig = y.sig
  JOIN sides sy ON sy.doc_id = y.doc_id AND sy.is_batch
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM doc_sh GROUP BY doc_id
), common AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN doc_sh wa ON wa.doc_id = c.doc_a
  JOIN doc_sh wb ON wb.doc_id = c.doc_b AND wb.shingle = wa.shingle
  GROUP BY c.doc_a, c.doc_b
), hits AS (
  SELECT doc_b AS doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_near_matches,
         MAX(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common))
             AS best_jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)
        >= {threshold}
  GROUP BY doc_b
)
SELECT s.doc_id,
       CAST(COALESCE(h.n_near_matches, 0) AS BIGINT) AS n_near_matches,
       h.best_jaccard,
       h.n_near_matches IS NULL AS admitted
FROM sides s LEFT JOIN hits h ON h.doc_id = s.doc_id
WHERE s.is_batch"""


def minhash_est_audit(docs: DataFrame, id_strategy: str = "md5") -> DataFrame:
    """Sketch-accuracy audit: for every banded-LSH candidate pair,
    the MinHash ESTIMATE of Jaccard (matching permutations / 16)
    beside the TRUE shingle-set Jaccard, both in integer ppm, plus the
    signed error. This is the calibration query a dedup pipeline runs
    before trusting a sketch threshold at corpus scale — it tells you
    what ``est >= tau`` actually means in true-Jaccard terms for YOUR
    shingle distribution (16 perms quantize the estimate to 1/16
    steps; the audit makes that resolution visible).

    Same bounded shapes as :func:`minhash_lsh_pairs`: band join for
    candidates, hash-keyed verify, no all-pairs step anywhere.
    """
    sh = doc_shingles(docs, MINHASH_SHINGLE_N).persist(StorageLevel.MEMORY_AND_DISK)
    sigs = _minhash_sigs(sh, id_strategy)
    cand = _band_candidates(sigs)
    siga = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{j}").alias(f"a{j}") for j in range(MINHASH_PERMS)],
    )
    sigb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{j}").alias(f"b{j}") for j in range(MINHASH_PERMS)],
    )
    matches = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        for j in range(MINHASH_PERMS)
    )
    est = (
        cand.join(siga, "doc_a")
        .join(sigb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (matches * (1_000_000 // MINHASH_PERMS)).cast("bigint").alias("est_ppm"),
        )
    )
    common, sa, sb = _candidate_overlap(sh, cand)
    exact = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr("(n_common * 1000000) DIV (na + nb - n_common)")
            .cast("bigint")
            .alias("exact_ppm"),
        )
    )
    # left join: band collision with ZERO common shingles is possible
    # (hash collisions in the band signature) — audit shows est>0/exact=0
    return (
        est.join(exact, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            "est_ppm",
            F.coalesce("exact_ppm", F.lit(0)).cast("bigint").alias("exact_ppm"),
        )
        .withColumn("err_ppm", (F.col("est_ppm") - F.col("exact_ppm")).cast("bigint"))
    )


def minhash_est_audit_sql(id_strategy: str = "md5") -> str:
    band_exprs = []
    for band in range(LSH_BANDS):
        parts = " || '_' || ".join(
            f"CAST(mh{band * BAND_ROWS + r} AS VARCHAR)" for r in range(BAND_ROWS)
        )
        band_exprs.append(f"SELECT doc_id, {band} AS band_idx, {parts} AS sig FROM sigs")
    bands_union = "\n  UNION ALL\n  ".join(band_exprs)
    match_sum = " + ".join(
        f"CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END"
        for j in range(MINHASH_PERMS)
    )
    return f"""WITH {_minhash_sig_sql(id_strategy)},
bands AS (
  {bands_union}
), cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band_idx = y.band_idx AND x.sig = y.sig AND x.doc_id < y.doc_id
), est AS (
  SELECT c.doc_a, c.doc_b,
         CAST(({match_sum}) * {1_000_000 // MINHASH_PERMS} AS BIGINT) AS est_ppm
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.doc_a
  JOIN sigs sb ON sb.doc_id = c.doc_b
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM doc_sh GROUP BY doc_id
), common AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN doc_sh wa ON wa.doc_id = c.doc_a
  JOIN doc_sh wb ON wb.doc_id = c.doc_b AND wb.shingle = wa.shingle
  GROUP BY c.doc_a, c.doc_b
), exact AS (
  SELECT common.doc_a, common.doc_b,
         CAST((n_common * 1000000) // (sa.n_sh + sb.n_sh - n_common) AS BIGINT)
             AS exact_ppm
  FROM common
  JOIN sizes sa ON sa.doc_id = common.doc_a
  JOIN sizes sb ON sb.doc_id = common.doc_b
)
SELECT est.doc_a, est.doc_b, est.est_ppm,
       CAST(COALESCE(exact.exact_ppm, 0) AS BIGINT) AS exact_ppm,
       CAST(est.est_ppm - COALESCE(exact.exact_ppm, 0) AS BIGINT) AS err_ppm
FROM est LEFT JOIN exact ON est.doc_a = exact.doc_a AND est.doc_b = exact.doc_b"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(docs: DataFrame, id_strategy: str = "md5") -> DataFrame:
    """62-bit SimHash per doc: mix each word id into a 62-bit pattern
    (two independent 31-bit multiplicative mixes packed side by side —
    see ``functions.text.SIMHASH_BITS`` for why 62 and not 64), vote
    ±1 per bit over the doc's words, set bit where the vote is
    positive. One groupBy with 62 conditional sums. Default ``md5``
    ids are inline — the whole plan is scan → project → partial-agg,
    no join, no window."""
    words = doc_words(docs)
    w = _with_element_ids(words, "word", "wid", id_strategy).withColumn(
        "h",
        ((F.col("wid") * HASH_MULT) % F.lit(2**31)).bitwiseOR(
            F.shiftleft((F.col("wid") * SIMHASH_MULT2 + 12345) % F.lit(2**31), 31)
        ),
    )
    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    voted = w.groupBy("doc_id").agg(*votes)
    sim: Column = F.lit(0)
    for b in range(SIMHASH_BITS):
        sim = sim + F.when(F.col(f"v{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
    return voted.select("doc_id", sim.cast("bigint").alias("simhash"))


def _simhash_sig_sql(id_strategy: str = "md5") -> str:
    votes = ",\n         ".join(
        f"SUM(CASE WHEN (h & {1 << b}) != 0 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(SIMHASH_BITS)
    )
    bits = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {2 ** b} ELSE 0 END)" for b in range(SIMHASH_BITS)
    )
    mix = (
        f"(((wid * {HASH_MULT}) % {2 ** 31})"
        f" | (((wid * {SIMHASH_MULT2} + 12345) % {2 ** 31}) << 31))"
    )
    if id_strategy not in ("md5", "vocab"):
        # the Spark builders raise on unknown strategies; a silent
        # vocab fallback here would hand back an oracle that cannot
        # match the requested path (notably 'hash' — xxhash64 has no
        # DuckDB twin, which is exactly why it needs a loud error)
        raise ValueError(f"no DuckDB twin for id_strategy={id_strategy!r}")
    if id_strategy == "md5":
        mixed = f"""ids AS (
  SELECT doc_id, ({md5_id_sql("word")}) AS wid FROM doc_words
), mixed AS (
  SELECT doc_id, {mix} AS h FROM ids
)"""
    else:
        mixed = f"""vocab AS (
  {WORD_IDS_SQL}
), mixed AS (
  SELECT doc_id, {mix} AS h
  FROM doc_words JOIN vocab USING (word)
)"""
    return f"""doc_words AS (
  {DOC_WORDS_SQL}
), {mixed}, voted AS (
  SELECT doc_id,
         {votes}
  FROM mixed GROUP BY doc_id
), simhashes AS (
  SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM voted
)"""


SIMHASH_SIGNATURES_SQL = f"WITH {_simhash_sig_sql()}\nSELECT doc_id, simhash FROM simhashes"


def simhash_pairs(docs: DataFrame, max_hamming: int = 3, id_strategy: str = "md5") -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming,
    via pigeonhole banding — NO crossjoin, and still EXACT.

    The 62-bit signature is split into ``max_hamming + 1`` bit bands
    (~15 bits each at the default radius); two signatures within
    Hamming ``max_hamming`` must agree exactly on at least one band
    (pigeonhole), so an equi-join on (band_idx, band_bits) generates
    every qualifying pair. Candidates are then verified with
    ``bit_count(xor)``. The shuffle key is a pair of small ints, and
    band-bucket occupancy (docs per ~15-bit value) bounds the
    per-bucket fan-out — sparse buckets are exactly what the wide
    signature buys (see ``functions.text.SIMHASH_BITS``).
    """
    n_bands = max_hamming + 1
    width = (SIMHASH_BITS + n_bands - 1) // n_bands
    # persisted (r16 optimization round): BOTH sides of the band
    # equi-join below reference this relation — unpersisted, the full
    # signature computation (tokenize + explode + 62 conditional sums)
    # ran once per side. The cache is (doc_id, simhash): 16 bytes per
    # doc, far below corpus scale; lifecycle via ContextCleaner on
    # plan GC (the minhash_lsh_pairs shingle-cache policy).
    sigs = simhash_signatures(docs, id_strategy).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftright(F.col("simhash"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("band_bits"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select(
        "doc_id", "simhash", F.col("b.band_idx").alias("band_idx"),
        F.col("b.band_bits").alias("band_bits"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band_idx", "band_bits"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_pairs_sql(max_hamming: int = 3, id_strategy: str = "md5") -> str:
    """Oracle twin: the all-pairs formulation. Banding is exact for
    the Hamming radius (pigeonhole), so the banded Spark plan and this
    quadratic SQL agree row-for-row — the oracle states the SEMANTICS,
    the engine picks the scalable plan."""
    return f"""WITH {_simhash_sig_sql(id_strategy)}
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM simhashes a JOIN simhashes b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"""


# ---------------------------------------------------------------------------
# duplicate clustering (connected components over near-dup pairs)
# ---------------------------------------------------------------------------


def dup_clusters(
    docs: DataFrame,
    threshold: float = 0.5,
    id_strategy: str = "md5",
    max_iters: int = 20,
) -> DataFrame:
    """Canonicalize near-duplicates: connected components over the
    MinHash-LSH pair graph via iterative min-label propagation.
    Output (doc_id, cluster_id) for every doc in some pair; cluster_id
    = the smallest doc_id reachable through near-dup edges — the
    canonical representative a 100 TB dedup keeps.

    Each iteration is one shuffle (join labels to edges + min-agg);
    labels are localCheckpoint()ed so lineage doesn't grow with the
    iteration count. Convergence is an aggregated count (a scalar to
    the driver, not the data). Diameter of dup clusters is tiny in
    practice (near-dup graphs are cliques-ish), so this converges in
    2-4 iterations; ``max_iters`` bounds adversarial chains.
    """
    pairs = minhash_lsh_pairs(docs, threshold, id_strategy).select("doc_a", "doc_b")
    return connected_components(pairs, max_iters)


def minhash_lsh_star_edges(
    docs: DataFrame, threshold: float = 0.5, id_strategy: str = "md5"
) -> DataFrame:
    """Star-reduced MinHash-LSH near-dup EDGES, Jaccard-verified: the
    candidate generation a 100 TB CLUSTERING pass needs. The clique
    form (:func:`minhash_lsh_pairs`) is quadratic in bucket occupancy
    by its own contract — a 10M-doc boilerplate mass (0.1% of a 10B
    corpus) means 5·10¹³ pairs, which no verify stage survives. For
    canonicalization the clique is redundant: connectivity per bucket
    is fully preserved by the star (hub = bucket min id), so candidate
    count is LINEAR in occupancy.

    Semantics vs the clique form, documented: within any band bucket
    the star reaches every member through the hub, so for
    exact-duplicate masses (all pairwise Jaccard = 1, the pathology
    this exists for) the verified star yields IDENTICAL clusters. A
    weakly-linked pair (A~B but neither ~hub) that only the clique's
    A-B edge would keep connected can split — the standard
    recall/cost trade every production fuzzy-dedup ships (banding
    already makes candidate recall probabilistic).
    """
    sh = doc_shingles(docs, MINHASH_SHINGLE_N).persist(StorageLevel.MEMORY_AND_DISK)
    sigs = _minhash_sigs(sh, id_strategy)
    edges = _band_star_edges(sigs)
    common, sa, sb = _candidate_overlap(sh, edges)
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def dup_clusters_star(
    docs: DataFrame,
    threshold: float = 0.5,
    id_strategy: str = "md5",
    max_iters: int = 20,
) -> DataFrame:
    """:func:`dup_clusters` over the star-reduced verified edge list —
    the boilerplate-proof canonicalization: candidate and verify work
    scale linearly in bucket occupancy (see
    :func:`minhash_lsh_star_edges` for the documented recall trade)."""
    edges = minhash_lsh_star_edges(docs, threshold, id_strategy).select(
        "doc_a", "doc_b"
    )
    return connected_components(edges, max_iters)


def minhash_lsh_hybrid_edges(
    docs: DataFrame,
    threshold: float = 0.5,
    id_strategy: str = "md5",
    occ_cap: int = HYBRID_OCC_CAP,
) -> DataFrame:
    """Occupancy-capped hybrid MinHash-LSH near-dup edges,
    Jaccard-verified: clique pairs in buckets ≤ ``occ_cap`` (full
    recall where the clique is cheap — the star form dropped weak
    links in EVERY bucket, including small honest ones), star edges
    above it (linear cost on boilerplate masses). See
    :func:`_band_hybrid_edges` for the per-bucket contract."""
    sh = doc_shingles(docs, MINHASH_SHINGLE_N).persist(StorageLevel.MEMORY_AND_DISK)
    sigs = _minhash_sigs(sh, id_strategy)
    edges = _band_hybrid_edges(sigs, occ_cap=occ_cap)
    common, sa, sb = _candidate_overlap(sh, edges)
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def dup_clusters_hybrid(
    docs: DataFrame,
    threshold: float = 0.5,
    id_strategy: str = "md5",
    max_iters: int = 20,
    occ_cap: int = HYBRID_OCC_CAP,
) -> DataFrame:
    """:func:`dup_clusters` over the hybrid verified edge list — the
    production default: clique recall in honest buckets, star
    linearity on the boilerplate pathology (VERDICT r11 #2)."""
    edges = minhash_lsh_hybrid_edges(docs, threshold, id_strategy, occ_cap).select(
        "doc_a", "doc_b"
    )
    return connected_components(edges, max_iters)


#: edge-count gate for the single-task strategy. Budgeted by the cost
#: of the one task that runs it: the numpy min-label solver below holds
#: a handful of int64 arrays (≤ ~80 MB of raw edge ids at 5M edges,
#: a few × that in working arrays) and does O(log diameter) C-speed
#: passes — no Python dict (the earlier dict-based union-find carried
#: ~100 B/entry object overhead and a pure-Python edge loop, which
#: would have made this gate an executor-OOM/straggler risk).
SMALL_GRAPH_EDGES = 5_000_000


def connected_components(
    pairs: DataFrame,
    max_iters: int = 20,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over an undirected pair list
    (columns ``doc_a``, ``doc_b``) — the generic canonicalization step
    shared by every near-dup detector (shingle MinHash, SimHash,
    embedding cosine). Output (doc_id, cluster_id), cluster_id = min
    reachable id.

    The pair graph of a dedup run is orders of magnitude smaller than
    its corpus (only sparse near-dup edges survive the detector), so
    the operator is count-gated into two physical strategies:

    - ``n_edges <= small_graph_edges``: the whole edge list flows
      through ONE union-find task (Arrow ``mapInPandas`` over
      ``repartition(1)``) — exact, one pass, no rounds. A 5M-edge
      list is ~80 MB in the one task that runs it, and the output
      (node → min id) is the only thing shuffled back.
    - larger graphs (boilerplate-heavy corpora can push the pair
      graph into the billions): iterative min-label propagation with
      pointer jumping. Each round does (1) neighbor-min over the edge
      list (one shuffle on dst) and (2) TWO pointer jumps — replace
      my label with my LABEL's label (self-joins of the label table).
      Each jump doubles how far a label has traveled, so convergence
      is O(log diameter) instead of O(diameter). If ``max_iters``
      isn't enough, a warning is emitted (silent truncation would
      diverge from the oracle's full transitive closure).

    Iterative-loop shuffle discipline: ``pairs`` is persisted BEFORE
    the both-directions union (the union's two branches would
    otherwise recompute the detector plan twice); the loop's explicit
    shuffles and the edge cache are sized to the GRAPH (~1M
    edges/partition, capped at the session setting) because an
    iterative loop pays per-round *scheduler* cost proportional to
    partition count; and every join in the loop carries a
    ``shuffle_hash`` hint — all relations are already at loop width,
    so AQE's broadcast re-plans buy nothing and their driver
    round-trips dominate kilobyte-scale rounds. All of this tuning is
    scoped to the loop's own DataFrames (hints + repartition), never
    session confs — a concurrently planned query in the same session
    (a streaming micro-batch, a parallel job) is unaffected.
    """
    import warnings

    spark = pairs.sparkSession
    # pre-materialization detector plan (VERDICT r11 #4): the caller's
    # edge plan — scans, verify joins, exchanges — is what the audit
    # must see (recorded BEFORE persist so the capture shows the full
    # lineage, not an in-memory-relation wrapper); the returned labels
    # are a checkpointed ExistingRDD that hides all of it.
    record_stage_plan("cc_edges", pairs.select("doc_a", "doc_b"))
    pairs = pairs.select("doc_a", "doc_b").persist(StorageLevel.MEMORY_AND_DISK)
    n_edges = pairs.count()
    if stats is not None:
        stats["n_edges"] = n_edges
    if n_edges <= small_graph_edges:
        if stats is not None:
            stats.update(strategy="union_find", rounds=0, loop_parts=1)
        # eager checkpoint: materializes the union-find once so the
        # detector cache can be dropped before returning
        uf = _cc_union_find(pairs)
        record_stage_plan("cc_union_find", uf)
        out = uf.localCheckpoint()
        pairs.unpersist()
        return out
    sess_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    loop_parts = max(1, min(sess_parts, (2 * n_edges) // 1_000_000 + 1))
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .repartition(loop_parts, "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        labels, converged, rounds = _cc_loop(edges, max_iters, loop_parts)
    finally:
        edges.unpersist()
        pairs.unpersist()
    if stats is not None:
        # observability for the iterative path (VERDICT r11 #5): how
        # many min-label rounds the topology actually took (a forest
        # of stars converges in ~2; long chains push toward
        # O(log diameter)) and the loop width the edge count sized.
        stats.update(
            strategy="iterative",
            rounds=rounds,
            loop_parts=loop_parts,
            converged=converged,
        )
    if not converged:
        warnings.warn(
            f"connected_components: not converged after {max_iters} iterations; "
            "cluster ids may split long chains (oracle computes full closure). "
            "Raise max_iters.",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def _cc_union_find(pairs: DataFrame) -> DataFrame:
    """Exact connected components of a small-enough edge list in one
    task: numpy-vectorized min-label propagation with pointer jumping
    (densify ids → per-round ``minimum.at`` scatter over both edge
    directions → ``label = label[label]`` until fixpoint). Every pass
    is C-speed over flat int64 arrays — a 5M-edge random graph
    converges in ~10 s (measured, ~8 rounds; a sort+reduceat variant
    measured slower), with none of the object overhead a dict-based
    union-find would carry. The single task sees every edge via the
    Arrow batch iterator; only (node, min-reachable-id) rows leave it.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    id_type = pairs.schema["doc_a"].dataType
    out_schema = T.StructType(
        [T.StructField("doc_id", id_type), T.StructField("cluster_id", id_type)]
    )

    def run(batches):
        a_parts, b_parts = [], []
        for pdf in batches:
            a_parts.append(pdf["doc_a"].to_numpy(dtype=np.int64))
            b_parts.append(pdf["doc_b"].to_numpy(dtype=np.int64))
        if not a_parts:
            return
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        ids = np.unique(np.concatenate([a, b]))
        ia = np.searchsorted(ids, a)
        ib = np.searchsorted(ids, b)
        label = np.arange(len(ids), dtype=np.int64)
        while True:
            before = label
            m = np.minimum(label[ia], label[ib])
            label = label.copy()
            np.minimum.at(label, ia, m)
            np.minimum.at(label, ib, m)
            label = label[label]  # pointer jump: halve remaining depth
            if np.array_equal(label, before):
                break
        # labels are dense indices; ids[label] is each node's min
        # reachable ORIGINAL id (label propagation preserves min-id
        # ordering because dense ranks are monotone in original ids)
        out = pd.DataFrame({"doc_id": ids, "cluster_id": ids[label]})
        for i in range(0, len(out), 1_000_000):
            yield out.iloc[i : i + 1_000_000]

    return pairs.repartition(1).mapInPandas(run, schema=out_schema)


def _cc_loop(
    edges: DataFrame, max_iters: int, loop_parts: int
) -> tuple[DataFrame, bool, int]:
    """The min-label + pointer-jump rounds; every round's labels are
    materialized (checkpoint + convergence count), so the caller may
    unpersist ``edges`` once this returns. ``shuffle_hash`` hints keep
    AQE from re-planning the kilobyte-scale per-round joins as
    broadcasts (driver round-trips would dominate), and the one
    explicit ``repartition(loop_parts)`` per round keeps the
    aggregation at graph width — both scoped to these DataFrames, no
    session confs touched."""
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint()
    )
    converged = False
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        neighbor_min = (
            edges.join(labels.hint("shuffle_hash"), edges.dst == labels.doc_id)
            .repartition(loop_parts, "src")
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        # the PRE-round label rides along as old_label so convergence
        # is a filter-count on the round's own output — no extra
        # old-vs-new join, and (with the lazy checkpoint below) the
        # whole round is ONE Spark job.
        stepped = labels.select(
            "doc_id", F.col("cluster_id").alias("old_label")
        ).join(
            neighbor_min.hint("shuffle_hash"),
            F.col("doc_id") == F.col("src"),
            "left",
        ).select(
            "doc_id",
            "old_label",
            F.least(
                F.col("old_label"), F.coalesce(F.col("nbr_min"), F.col("old_label"))
            ).alias("cluster_id"),
        )
        # pointer jumping, twice: label ← label-of-label. Each jump is
        # a self-join of the (id, id) label table — cheap at loop
        # width — and doubles how far a label has traveled, so two
        # jumps make the per-round reach ~4× and long chains converge
        # in roughly half the rounds of a single-jump loop (rounds are
        # the expensive unit here: each one is a full job + checkpoint).
        for _jump in range(2):
            parent = stepped.select(
                F.col("doc_id").alias("p_id"), F.col("cluster_id").alias("p_label")
            )
            stepped = stepped.join(
                parent.hint("shuffle_hash"), stepped.cluster_id == parent.p_id, "left"
            ).select(
                "doc_id",
                "old_label",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("p_label"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
        if rounds == 1:
            # one loop round's plan stands for all of them (identical
            # shape per round); captured so the audit sees the loop's
            # join/agg width, not just the detector stage
            record_stage_plan("cc_round", stepped)
        new_labels = stepped.localCheckpoint(eager=False)
        # materializes the checkpoint AND checks convergence in one job
        changed = new_labels.filter(F.col("cluster_id") != F.col("old_label")).count()
        labels = new_labels.select("doc_id", "cluster_id")
        if changed == 0:
            converged = True
            break
    return labels, converged, rounds


def dup_clusters_sql(threshold: float = 0.5, id_strategy: str = "md5") -> str:
    """DuckDB twin: transitive closure by recursive CTE (UNION dedups,
    so it terminates), then min reachable id per node."""
    return f"""WITH RECURSIVE pairs AS (
  {minhash_lsh_pairs_sql(threshold, id_strategy)}
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id,
       LEAST(src, MIN(dst)) AS cluster_id
FROM reach GROUP BY src"""


def minhash_lsh_star_edges_sql(
    threshold: float = 0.5, id_strategy: str = "md5"
) -> str:
    """DuckDB twin of :func:`minhash_lsh_star_edges`: the same band
    scaffold, per-bucket MIN as the hub, hub→member edges, identical
    Jaccard verify."""
    band_exprs = []
    for band in range(LSH_BANDS):
        parts = " || '_' || ".join(
            f"CAST(mh{band * BAND_ROWS + r} AS VARCHAR)" for r in range(BAND_ROWS)
        )
        band_exprs.append(f"SELECT doc_id, {band} AS band_idx, {parts} AS sig FROM sigs")
    bands_union = "\n  UNION ALL\n  ".join(band_exprs)
    return f"""WITH {_minhash_sig_sql(id_strategy)},
bands AS (
  {bands_union}
), hubs AS (
  SELECT band_idx, sig, MIN(doc_id) AS hub FROM bands GROUP BY band_idx, sig
), cand AS (
  SELECT DISTINCT h.hub AS doc_a, b.doc_id AS doc_b
  FROM bands b JOIN hubs h ON b.band_idx = h.band_idx AND b.sig = h.sig
  WHERE b.doc_id <> h.hub
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM doc_sh GROUP BY doc_id
), common AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN doc_sh wa ON wa.doc_id = c.doc_a
  JOIN doc_sh wb ON wb.doc_id = c.doc_b AND wb.shingle = wa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= {threshold}"""


def dup_clusters_star_sql(
    threshold: float = 0.5, id_strategy: str = "md5"
) -> str:
    """DuckDB twin of :func:`dup_clusters_star`: recursive-CTE
    transitive closure over the star-reduced verified edges."""
    return f"""WITH RECURSIVE pairs AS (
  {minhash_lsh_star_edges_sql(threshold, id_strategy)}
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id,
       LEAST(src, MIN(dst)) AS cluster_id
FROM reach GROUP BY src"""


def minhash_lsh_hybrid_edges_sql(
    threshold: float = 0.5,
    id_strategy: str = "md5",
    occ_cap: int = HYBRID_OCC_CAP,
) -> str:
    """DuckDB twin of :func:`minhash_lsh_hybrid_edges`: the same band
    scaffold, one (hub, occupancy) aggregate, clique pairs where
    occ ≤ cap / star edges above, identical Jaccard verify."""
    band_exprs = []
    for band in range(LSH_BANDS):
        parts = " || '_' || ".join(
            f"CAST(mh{band * BAND_ROWS + r} AS VARCHAR)" for r in range(BAND_ROWS)
        )
        band_exprs.append(f"SELECT doc_id, {band} AS band_idx, {parts} AS sig FROM sigs")
    bands_union = "\n  UNION ALL\n  ".join(band_exprs)
    return f"""WITH {_minhash_sig_sql(id_strategy)},
bands AS (
  {bands_union}
), stats AS (
  SELECT band_idx, sig, MIN(doc_id) AS hub, COUNT(*) AS occ
  FROM bands GROUP BY band_idx, sig
), cand AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM bands x
    JOIN bands y ON x.band_idx = y.band_idx AND x.sig = y.sig
               AND x.doc_id < y.doc_id
    JOIN stats s ON s.band_idx = x.band_idx AND s.sig = x.sig
    WHERE s.occ <= {occ_cap}
    UNION ALL
    SELECT s.hub AS doc_a, b.doc_id AS doc_b
    FROM bands b
    JOIN stats s ON s.band_idx = b.band_idx AND s.sig = b.sig
    WHERE s.occ > {occ_cap} AND b.doc_id <> s.hub
  )
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM doc_sh GROUP BY doc_id
), common AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN doc_sh wa ON wa.doc_id = c.doc_a
  JOIN doc_sh wb ON wb.doc_id = c.doc_b AND wb.shingle = wa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= {threshold}"""


def dup_clusters_hybrid_sql(
    threshold: float = 0.5,
    id_strategy: str = "md5",
    occ_cap: int = HYBRID_OCC_CAP,
) -> str:
    """DuckDB twin of :func:`dup_clusters_hybrid`: recursive-CTE
    transitive closure over the hybrid verified edges."""
    return f"""WITH RECURSIVE pairs AS (
  {minhash_lsh_hybrid_edges_sql(threshold, id_strategy, occ_cap)}
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id,
       LEAST(src, MIN(dst)) AS cluster_id
FROM reach GROUP BY src"""


# ---------------------------------------------------------------------------
# span-level exact dedup (C4/RefinedWeb-style line dedup, token-window form)
# ---------------------------------------------------------------------------

#: tokens per span for span-level dedup (the corpus has no newlines or
#: sentence punctuation, so fixed token windows stand in for "lines")
SPAN_TOKENS = 8


def doc_spans(docs: DataFrame, span_tokens: int = SPAN_TOKENS) -> DataFrame:
    """(doc_id, span_pos, span) — consecutive ``span_tokens``-token
    windows of each document, tail partial span included.

    JVM-side only: the token array is materialized first (a lambda
    that inlines split() re-runs it per element), span count is exact
    integer math ``(len + k - 1) DIV k``, and the span text is an
    array_join over a slice. Map-only — no shuffle.
    """
    k = span_tokens
    with_toks = docs.select("doc_id", tokens("text").alias("toks"))
    toks = F.col("toks")
    n_spans = F.expr(f"(size(toks) + {k - 1}) DIV {k}").cast("int")
    spans = F.when(n_spans > 0, F.sequence(F.lit(0), n_spans - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return with_toks.select(
        "doc_id",
        F.posexplode(
            F.transform(spans, lambda i: F.array_join(F.slice(toks, i * k + 1, k), " "))
        ).alias("span_pos", "span"),
    ).select("doc_id", F.col("span_pos").cast("int").alias("span_pos"), "span")


#: occurrence count above which a span takes the aggregate path —
#: bounds every cold-path window partition at this many rows
SPAN_HOT_DF = 256


def span_dedup(
    docs: DataFrame,
    span_tokens: int = SPAN_TOKENS,
    hot_df: int = SPAN_HOT_DF,
) -> DataFrame:
    """Span-level exact dedup: every span of every doc, flagged
    ``keep`` iff it is the corpus-wide first occurrence of that exact
    span text (first = smallest (doc_id, span_pos)).

    This is C4/RefinedWeb line-dedup re-expressed over token windows;
    the downstream "rebuild the cleaned document" step is a
    groupBy(doc_id) over kept spans.

    Skew guard (VERDICT r5 #7): a bare ``Window.partitionBy(span)``
    puts EVERY occurrence of a boilerplate span in one task — real
    corpora have spans in 10% of documents, a multi-TB single
    partition at 100 TB. Two-path split on the span's occurrence
    count (the stop-shingle df-cap discipline, but value-preserving —
    hot spans are still flagged, not dropped):

    - the df count itself is a map-side-combined aggregate (hot keys
      pre-combine per input partition, so no reducer sees more than
      #input-partitions rows per span);
    - COLD spans (df ≤ ``hot_df``) keep the window — every partition
      now provably ≤ ``hot_df`` rows;
    - HOT spans resolve first-occurrence as ``min(struct(doc_id,
      span_pos))`` through the same map-side-combined aggregation
      (never a window), and the per-span minimum — tiny: boilerplate
      spans number far below corpus scale by definition of the cap —
      broadcasts back onto the rows.

    Output identical to the single-window form (struct ordering ==
    the window's (doc_id, span_pos) order); oracle unchanged. The
    span relation feeds three branches, so it is persisted and the
    corpus is tokenized/exploded once.
    """
    spans = doc_spans(docs, span_tokens).persist(StorageLevel.MEMORY_AND_DISK)
    hot_keys = (
        spans.groupBy("span")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > hot_df)
        .select("span")
    )
    cold = spans.join(F.broadcast(hot_keys), "span", "left_anti")
    w = Window.partitionBy("span").orderBy(
        F.col("doc_id").asc(), F.col("span_pos").asc()
    )
    cold_flagged = cold.select(
        "doc_id",
        "span_pos",
        "span",
        (F.row_number().over(w) == 1).alias("keep"),
    )
    hot = spans.join(F.broadcast(hot_keys), "span", "left_semi")
    hot_first = hot.groupBy("span").agg(
        F.min(F.struct(F.col("doc_id"), F.col("span_pos"))).alias("__first")
    )
    hot_flagged = hot.join(F.broadcast(hot_first), "span").select(
        "doc_id",
        "span_pos",
        "span",
        (
            (F.col("doc_id") == F.col("__first.doc_id"))
            & (F.col("span_pos") == F.col("__first.span_pos"))
        ).alias("keep"),
    )
    return cold_flagged.unionByName(hot_flagged)


def span_dedup_sql(span_tokens: int = SPAN_TOKENS) -> str:
    k = span_tokens
    return f"""WITH t AS (
  SELECT doc_id, {tokens_sql("text")} AS toks FROM documents
), spans AS (
  SELECT doc_id,
         CAST(unnest(range(0, (len(toks) + {k - 1}) // {k})) AS INT) AS span_pos,
         toks
  FROM t
)
SELECT doc_id, span_pos,
       array_to_string(list_slice(toks, span_pos * {k} + 1, span_pos * {k} + {k}), ' ') AS span,
       (ROW_NUMBER() OVER (
          PARTITION BY array_to_string(list_slice(toks, span_pos * {k} + 1, span_pos * {k} + {k}), ' ')
          ORDER BY doc_id ASC, span_pos ASC) = 1) AS keep
FROM spans"""


def span_splice(docs: DataFrame, span_tokens: int = SPAN_TOKENS) -> DataFrame:
    """Rebuild each document with its corpus-duplicated spans REMOVED —
    the splice step :func:`span_dedup`'s docstring defers (C4 removes
    the repeated lines, it doesn't just flag them). Output
    (doc_id, n_spans, n_removed, clean_text); a doc whose every span
    was seen earlier rebuilds to the empty string.

    Scale shape: the span-text shuffle from :func:`span_dedup` plus
    ONE doc-keyed agg — collect the kept spans as (pos, text) structs,
    array_sort restores document order (sorting a per-doc array, not
    a window), array_join rebuilds. The per-doc array is bounded by
    the document length, never the corpus.
    """
    flagged = span_dedup(docs, span_tokens)
    kept_struct = F.when(F.col("keep"), F.struct("span_pos", "span"))
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_spans"),
        F.sum(F.when(F.col("keep"), 0).otherwise(1)).cast("int").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda t: t["span"]
            ),
            " ",
        ).alias("clean_text"),
    )


def span_splice_sql(span_tokens: int = SPAN_TOKENS) -> str:
    return f"""SELECT doc_id,
       CAST(COUNT(*) AS INT) AS n_spans,
       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS INT) AS n_removed,
       COALESCE(string_agg(span, ' ' ORDER BY span_pos) FILTER (WHERE keep), '') AS clean_text
FROM ({span_dedup_sql(span_tokens)})
GROUP BY doc_id"""


# ---------------------------------------------------------------------------
# test-set decontamination (train↔test n-gram overlap)
# ---------------------------------------------------------------------------

#: SINGLE SOURCE of the train/val/test split constants (r6 review
#: fix): plans.llm_star imports these (it already imports this
#: module; the reverse would be circular), so the decontamination
#: queries here and t_train_split there can never silently scan
#: different partitions after a retune.
_SPLIT_MULT = 2654435761
_SPLIT_BUCKETS = 1000
_TRAIN_LT, _TEST_GE = 800, 900


def split_bucket(id_expr: str = "doc_id", buckets: int = None):  # noqa: RUF013
    """THE deterministic split/shard bucket — single definition (r7
    review: the pmod-nested expression had ~10 verbatim copies across
    the plan modules; any future change — e.g. the negative-id
    normalization below — must land everywhere at once or splits
    silently desynchronize between queries that must agree).

    bucket(id) = pmod(pmod(id, B) · MULT, B). The inner mod bounds the
    product below B·MULT < 2^63 (the r6 overflow fix, value-preserving
    by congruence). CONTRACT: ids are NON-NEGATIVE — Spark's pmod and
    DuckDB's % agree only there (pmod(-5,1000)=995 vs -5 % 1000 = -5);
    the fixture pin test_split_fixture_ids_nonnegative enforces it for
    every harness table, and a corpus keyed by a signed hash must
    normalize ids first (or swap BOTH emitters for the pmod-equivalent
    ``((id % B + B) % B) * MULT % B`` form in one edit here)."""
    if buckets is None:
        buckets = _SPLIT_BUCKETS
    return F.pmod(
        F.pmod(F.col(id_expr), F.lit(buckets)) * F.lit(_SPLIT_MULT),
        F.lit(buckets),
    )


def split_bucket_sql(id_expr: str = "doc_id", buckets: int = None) -> str:
    """DuckDB twin of :func:`split_bucket` — emits the exact
    historical oracle text (byte-identical, asserted at refactor time
    against all 172 registered oracles)."""
    if buckets is None:
        buckets = _SPLIT_BUCKETS
    return f"(({id_expr} % {buckets}) * {_SPLIT_MULT}) % {buckets}"



def contamination(docs: DataFrame, n: int = 3) -> DataFrame:
    """Test-set decontamination scan: for every *train* document, how
    many of its distinct word ``n``-gram shingles also occur in any
    *test* document (split = the deterministic t_train_split hash).

    Scale shape: the test split is ~10% of the corpus and its distinct
    shingle set is the small side — broadcast it, so the scan over
    train shingles is map-side (no shuffle on the join). The only
    shuffle is the final groupBy(doc_id) partial-agg rollup. At 100 TB
    the broadcast becomes a bucketed/bloom-filter semi-join, same
    plan shape.

    Output: (doc_id, n_shingles, n_contaminated, contamination_ratio)
    for each train doc with at least one shingle (≥ n tokens).
    """
    bucket = split_bucket()
    # two consumer branches (train side, test side) — persist so the
    # corpus is scanned/tokenized/exploded once, the module-wide
    # multi-branch discipline (r7 review: this and the bloom variant
    # were the only detectors still re-deriving the shingle relation)
    sh = (
        doc_shingles(docs, n)
        .withColumn("bucket", bucket)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    train_sh = sh.filter(F.col("bucket") < _TRAIN_LT).drop("bucket")
    test_sh = (
        sh.filter(F.col("bucket") >= _TEST_GE)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        train_sh.join(F.broadcast(test_sh), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.count("hit").cast("bigint").alias("n_contaminated"),
            (F.count("hit").cast("double") / F.count("*")).alias("contamination_ratio"),
        )
    )


def contamination_sql(n: int = 3) -> str:
    return f"""WITH sh AS (
  {_doc_shingles_sql(n)}
), train_sh AS (
  SELECT doc_id, shingle FROM sh
  WHERE {split_bucket_sql()} < {_TRAIN_LT}
), test_sh AS (
  SELECT DISTINCT shingle FROM sh
  WHERE {split_bucket_sql()} >= {_TEST_GE}
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT(x.shingle) AS BIGINT) AS n_contaminated,
       (CAST(COUNT(x.shingle) AS DOUBLE) / COUNT(*)) AS contamination_ratio
FROM train_sh t LEFT JOIN test_sh x ON t.shingle = x.shingle
GROUP BY t.doc_id"""


# ---------------------------------------------------------------------------
# bloom-filter decontamination (the 100 TB shape of the scan above)
# ---------------------------------------------------------------------------

#: bloom geometry: 62-bit words (the widest power-of-two mask both
#: engines build exactly — 2^bit is an exact double up to 2^62 and
#: DuckDB's BIGINT << errors on sign overflow at 63), 256 words ≈ 16 K
#: bits; k=3 positions per shingle via Kirsch–Mitzenmacher double
#: hashing over two disjoint 60-bit md5 segments.
BLOOM_WORD_BITS = 62
BLOOM_WORDS = 256
BLOOM_M_BITS = BLOOM_WORD_BITS * BLOOM_WORDS
BLOOM_K = 3


def contamination_bloom(docs: DataFrame, n: int = 3) -> DataFrame:
    """Test-set decontamination via a REAL bloom filter — the shape
    :func:`contamination`'s docstring defers to at 100 TB, where the
    test split's distinct-shingle set is too large to broadcast as
    rows but its bloom bits (m/62 words, constant size) always fit.

    Build: distinct test shingles → k md5-derived bit positions each
    (h1 + j·h2 mod m, both 60-bit md5 segments — engine-portable, no
    JVM hash) → ``bit_or`` per word. Probe: every train (doc, shingle)
    checks its k bits against the broadcast word table; a shingle is
    flagged iff ALL k bits are set — a superset of true contamination
    (false-positive rate (1-e^{-kn/m})^k, ~5% at test SF), and
    DETERMINISTIC, so the DuckDB twin reproduces the same flags and
    the approximate structure itself is value-checked.

    Output: (doc_id, n_shingles, n_flagged, flagged_ratio) per train
    doc. Scale: the only shuffles are the word-table bit_or (≤256
    rows) and the final doc rollup; the probe join is broadcast,
    m is the knob (size it ~1.44·k·|test shingles| bits for a target
    FP rate).
    """
    md5 = F.md5(F.col("shingle"))
    h1 = F.conv(F.substring(md5, 1, 15), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(md5, 16, 15), 16, 10).cast("bigint")
    j = F.explode(F.array(*[F.lit(i) for i in range(BLOOM_K)])).alias("j")
    pos = (h1 + F.col("j") * h2) % F.lit(BLOOM_M_BITS)
    word_idx = (F.col("pos") / F.lit(BLOOM_WORD_BITS)).cast("int")
    mask = F.pow(F.lit(2.0), F.col("pos") % F.lit(BLOOM_WORD_BITS)).cast("bigint")

    bucket = split_bucket()
    # persisted for the same two-branch reason as contamination (r7)
    sh = (
        doc_shingles(docs, n)
        .withColumn("bucket", bucket)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    test_pos = (
        sh.filter(F.col("bucket") >= _TEST_GE)
        .select("shingle")
        .distinct()
        .select("shingle", j)
        .withColumn("pos", pos)
    )
    bloom = (
        test_pos.select(word_idx.alias("word_idx"), mask.alias("mask"))
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("w"))
    )
    probe = (
        sh.filter(F.col("bucket") < _TRAIN_LT)
        .select("doc_id", "shingle", j)
        .withColumn("pos", pos)
        .select("doc_id", "shingle", word_idx.alias("word_idx"), mask.alias("mask"))
        .join(F.broadcast(bloom), "word_idx", "left")
        .withColumn(
            "bit_set",
            F.when(
                F.col("w").isNotNull()
                & (F.col("w").bitwiseAND(F.col("mask")) == F.col("mask")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .groupBy("doc_id", "shingle")
        .agg(F.min("bit_set").alias("all_set"))
    )
    return probe.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_shingles"),
        F.sum("all_set").cast("bigint").alias("n_flagged"),
        (F.sum("all_set").cast("double") / F.count("*")).alias("flagged_ratio"),
    )


def contamination_bloom_sql(n: int = 3) -> str:
    h1 = "CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT)"
    h2 = "CAST('0x' || substr(md5(shingle), 16, 15) AS BIGINT)"
    pos = f"(({h1} + g.j * {h2}) % {BLOOM_M_BITS})"
    return f"""WITH sh AS (
  {_doc_shingles_sql(n)}
), test_pos AS (
  SELECT CAST({pos} // {BLOOM_WORD_BITS} AS INT) AS word_idx,
         CAST(POWER(2.0, {pos} % {BLOOM_WORD_BITS}) AS BIGINT) AS mask
  FROM (SELECT DISTINCT shingle FROM sh
        WHERE {split_bucket_sql()} >= {_TEST_GE}),
       unnest(range(0, {BLOOM_K})) AS g(j)
), bloom AS (
  SELECT word_idx, BIT_OR(mask) AS w FROM test_pos GROUP BY word_idx
), probe AS (
  SELECT t.doc_id, t.shingle,
         MIN(CASE WHEN b.w IS NOT NULL AND (b.w & m.mask) = m.mask
                  THEN 1 ELSE 0 END) AS all_set
  FROM (SELECT doc_id, shingle FROM sh
        WHERE {split_bucket_sql()} < {_TRAIN_LT}) t,
       LATERAL (SELECT CAST({pos} // {BLOOM_WORD_BITS} AS INT) AS word_idx,
                       CAST(POWER(2.0, {pos} % {BLOOM_WORD_BITS}) AS BIGINT) AS mask
                FROM unnest(range(0, {BLOOM_K})) AS g(j)) m
       LEFT JOIN bloom b ON b.word_idx = m.word_idx
  GROUP BY t.doc_id, t.shingle
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(all_set) AS BIGINT) AS n_flagged,
       (CAST(SUM(all_set) AS DOUBLE) / COUNT(*)) AS flagged_ratio
FROM probe GROUP BY doc_id"""


# ---------------------------------------------------------------------------
# exact substring dedup (rolling k-token windows, Lee et al. 2021-style)
# ---------------------------------------------------------------------------

#: tokens per rolling window. Lee et al. ("Deduplicating Training Data
#: Makes Language Models Better") use 50 BPE tokens; the synthetic docs
#: are ~54 words, so 8 keeps multiple windows per doc at test SF. The
#: operator shape is k-independent.
SUBSTRING_TOKENS = 8


def doc_token_windows(
    docs: DataFrame, k: int = SUBSTRING_TOKENS
) -> DataFrame:
    """(doc_id, win_pos, win_hash) — every OVERLAPPING ``k``-token
    window of each document, hashed.

    Unlike :func:`doc_spans` (disjoint windows — the C4 "line" stand-in)
    this is the rolling-window relation exact-substring dedup needs: a
    duplicated passage is caught at every alignment, not only when it
    lands on a span boundary.

    Scale shape: map-only; the token array is materialized once per
    row (an inlined split() re-runs per window — measured ~10× on the
    shingle path), and only the 8-byte ``xxhash64`` of the window text
    leaves the map stage — the window STRINGS never shuffle. Suffix
    arrays solve this with less duplication of text bytes, but don't
    distribute; rolling hashes are how dedup pipelines shard this at
    corpus scale.
    """
    with_toks = docs.select("doc_id", tokens("text").alias("toks"))
    toks = F.col("toks")
    n_wins = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(0))
    starts = F.when(n_wins > 0, F.sequence(F.lit(1), n_wins)).otherwise(
        F.array().cast("array<int>")
    )
    return with_toks.select(
        "doc_id",
        F.posexplode(
            F.transform(starts, lambda i: F.array_join(F.slice(toks, i, k), " "))
        ).alias("win_pos", "win"),
    ).select(
        "doc_id",
        # posexplode is 0-based; +1 matches the 1-based window start the
        # DuckDB twin emits (range(1, ...)), keeping the window relation
        # itself engine-identical for any row-level consumer.
        (F.col("win_pos") + 1).cast("int").alias("win_pos"),
        F.xxhash64("win").alias("win_hash"),
    )


def substring_dedup_stats(
    docs: DataFrame, k: int = SUBSTRING_TOKENS
) -> DataFrame:
    """Exact-substring duplication profile per document: of the doc's
    overlapping ``k``-token windows, how many also occur (verbatim) in
    at least one OTHER document.

    Output (doc_id, n_windows, n_dup_windows, dup_frac) — the signal a
    training pipeline thresholds to drop boilerplate-heavy docs, or
    feeds to a span-removal pass.

    Two consumers read the window relation (the cross-doc duplicate
    set and the per-doc rollup), so it is persisted — one corpus scan,
    as with the shingle relation in :func:`ngram_jaccard_pairs`. Both
    shuffles key on the 8-byte window hash / doc_id; like
    :func:`exact_dedup`, the Spark plan groups on ``xxhash64`` while
    the oracle groups on window text (identical decisions absent a
    64-bit collision).
    """
    wins = doc_token_windows(docs, k).persist(StorageLevel.MEMORY_AND_DISK)
    dup = (
        wins.groupBy("win_hash")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("win_hash")
        .withColumn("hit", F.lit(1))
    )
    return (
        wins.join(dup, "win_hash", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_windows"),
            F.count("hit").cast("bigint").alias("n_dup_windows"),
            (F.count("hit").cast("double") / F.count("*")).alias("dup_frac"),
        )
    )


def substring_dedup_stats_sql(k: int = SUBSTRING_TOKENS) -> str:
    """DuckDB twin of :func:`substring_dedup_stats` (text-keyed)."""
    return f"""WITH t AS (
  SELECT doc_id, {tokens_sql("text")} AS toks FROM documents
), starts AS (
  SELECT doc_id,
         CAST(unnest(range(1, GREATEST(len(toks) - {k - 1}, 0) + 1)) AS INT) AS win_pos,
         toks
  FROM t
), wins AS (
  SELECT doc_id, win_pos,
         array_to_string(list_slice(toks, win_pos, win_pos + {k - 1}), ' ') AS win
  FROM starts
), dupw AS (
  SELECT win FROM wins GROUP BY win HAVING COUNT(DISTINCT doc_id) >= 2
)
SELECT w.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(COUNT(d.win) AS BIGINT) AS n_dup_windows,
       (CAST(COUNT(d.win) AS DOUBLE) / COUNT(*)) AS dup_frac
FROM wins w LEFT JOIN dupw d ON w.win = d.win
GROUP BY w.doc_id"""


# ---------------------------------------------------------------------------
# prefix-filtered word-token similarity join (PPJoin-lite)
# ---------------------------------------------------------------------------


def prefix_filter_join(
    docs: DataFrame, tau_num: int = 7, tau_den: int = 10
) -> DataFrame:
    """Word-token Jaccard similarity join with PREFIX + LENGTH
    filtering (Chaudhuri/Xiao's PPJoin family, the scale-correct
    alternative to joining on every shared token).

    Prefix-filter theorem: order each doc's distinct tokens by a
    GLOBAL total order (rarest first — ``(df, tok)`` ascending); if
    ``J(A,B) >= τ`` then A and B must share a token within their
    first ``|T| - ceil(τ·|T|) + 1`` tokens. So the candidate join
    touches only those prefix tokens — the RAREST ones, with the
    smallest postings lists — instead of the full inverted index
    (``ngram_jaccard_pairs`` joins all shingles and needs a
    hot-shingle cap; here the prefix choice IS the skew guard).
    Length filter: ``τ·max(|A|,|B|) <= min(|A|,|B|)`` culls
    candidates before verification, integer-exact as
    ``tau_den·min >= tau_num·max``.

    The ordering key is the ``(df, token-string)`` pair itself — no
    global rank numbering (a dense rank would need a single-partition
    window; the per-doc sort only ever compares within one doc's
    tokens). Verification recomputes the EXACT intersection for
    surviving candidates only.

    τ is a rational ``tau_num/tau_den`` so every comparison and the
    reported ``jacc_ppm`` stay in integer arithmetic (engine-exact).
    The oracle twin (`prefix_filter_join_sql`) is the UNFILTERED
    brute-force join with the same final threshold — a value-hash
    match therefore PROVES the prefix+length filters lost no pair
    (filter completeness under the oracle, not just speed).
    """
    # persisted: the token relation feeds four consumers (sizes, df,
    # the prefix self-join's two sides, and verification) — without
    # the cut each re-reads and re-tokenizes the corpus
    t = (
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    record_stage_plan("prefix_join_tokens", t)
    sizes = t.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_tok")
    )
    dfreq = t.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    wdoc = Window.partitionBy("doc_id").orderBy("df", "tok")
    # prefix length: n - ceil(τ n) + 1, ceil via (a + b - 1) DIV b
    pref = (
        t.join(dfreq, "tok")
        .withColumn("rn", F.row_number().over(wdoc))
        .join(sizes, "doc_id")
        .filter(
            F.col("rn")
            <= F.col("n_tok")
            - (
                (F.col("n_tok") * tau_num + tau_den - 1)
                / tau_den
            ).cast("int")
            + 1
        )
        .select("doc_id", "tok", "n_tok")
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_tok").alias("na"),
            F.col("b.n_tok").alias("nb"),
        )
        .distinct()
        .filter(
            F.lit(tau_den) * F.least("na", "nb")
            >= F.lit(tau_num) * F.greatest("na", "nb")
        )
    )
    common = (
        cand.join(t.alias("ta"), F.col("doc_a") == F.col("ta.doc_id"))
        .join(
            t.alias("tb"),
            (F.col("doc_b") == F.col("tb.doc_id"))
            & (F.col("ta.tok") == F.col("tb.tok")),
        )
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    uni = F.col("na") + F.col("nb") - F.col("n_common")
    return (
        common.filter(F.lit(tau_den) * F.col("n_common") >= F.lit(tau_num) * uni)
        .select(
            "doc_a",
            "doc_b",
            "na",
            "nb",
            F.expr(
                "CAST((1000000 * n_common) DIV (na + nb - n_common) AS BIGINT)"
            ).alias("jacc_ppm"),
        )
        .orderBy("doc_a", "doc_b")
    )


def prefix_filter_join_sql(
    tau_num: int = 7, tau_den: int = 10, where: str = ""
) -> str:
    """Brute-force twin: EVERY shared-token pair verified, no prefix
    or length filter — completeness cross-check (see operator doc)."""
    return f"""WITH t AS (
  SELECT DISTINCT doc_id, unnest({tokens_sql("text")}) AS tok
  FROM documents {where}
), sizes AS (
  SELECT doc_id, CAST(COUNT(*) AS INT) AS n FROM t GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, sa.n AS na, sb.n AS nb,
       CAST((1000000 * n_common) // (sa.n + sb.n - n_common) AS BIGINT)
           AS jacc_ppm
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE {tau_den} * n_common >= {tau_num} * (sa.n + sb.n - n_common)
ORDER BY doc_a, doc_b"""
