"""Recency-decay aggregation (scoring_ext.w_decay_popularity).

Staged r15 registration — oracle parity + the arithmetic contract
(shift-as-decay, floor semantics on negatives) pinned here.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from f1_realtime_data_pipeline_spark.plans import scoring_ext as sx


def _events_con(path: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")
    return con


def _compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> None:
    assert sorted(sdf.columns) == sorted(odf.columns)
    cols = sorted(sdf.columns)
    s = sdf.reindex(cols, axis=1).sort_values(by=cols, na_position="last").reset_index(drop=True)
    o = odf.reindex(cols, axis=1).sort_values(by=cols, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(s, o, check_dtype=False)


def test_decay_oracle_parity_sf(spark, sf_dir):
    sdf = sx.w_decay_popularity(spark, sf_dir).toPandas()
    odf = _events_con(f"{sf_dir}/events.parquet").execute(
        sx.ORACLE["w_decay_popularity"]
    ).fetchdf()
    _compare(sdf, odf)
    assert len(sdf) > 0
    assert (sdf["n_events"] > 0).all()


@pytest.fixture()
def decay_edge_events(spark, tmp_path):
    """Hand-computable fixture: anchor day, one/two half-lives back,
    far past (shift cap), NULL ts, NULL value, negative values —
    every branch of the decay arithmetic."""
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (0, "2026-01-29 12:00:00", 1, "a", 1.0, None),      # age 0  → w=1
        (1, "2026-01-22 12:00:00", 1, "a", 1.0, None),      # age 7  → w=1/2
        (2, "2026-01-08 00:00:00", 1, "a", 1.0, None),      # age 21 → w=1/8
        (3, "2000-01-01 00:00:00", 1, "b", 1.0, None),      # cap → ~0
        (4, None, 1, "b", 5.0, None),                        # NULL ts: dropped
        (5, "2026-01-29 00:00:00", 1, "b", None, None),      # NULL value: counted, no mass
        (6, "2026-01-22 00:00:00", 1, "c", -1.0, None),      # negative + shift
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    )
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    path = str(tmp_path / "events.parquet")
    df.toPandas().to_parquet(path, index=False)
    return path


def test_decay_hand_computed(spark, tmp_path, decay_edge_events):
    out = {
        r.event_type: r
        for r in sx.w_decay_popularity(spark, str(tmp_path)).collect()
    }
    M = 1_000_000
    # type a: 1.0 at w=1 + 1.0 at w=1/2 + 1.0 at w=1/8
    assert out["a"].n_events == 3
    assert out["a"].sum_micro == 3 * M
    assert out["a"].decayed_micro == M + M // 2 + M // 8
    # type b: NULL-ts row dropped entirely; NULL-value row counted but
    # contributes no mass; year-2000 row decays to 0 under the cap
    assert out["b"].n_events == 2
    assert out["b"].sum_micro == M
    assert out["b"].decayed_micro == 0
    # type c: floor(-1.0*1e6) = -1000000; arithmetic shift by one
    # half-life floors to -500000
    assert out["c"].n_events == 1
    assert out["c"].decayed_micro == -(M // 2)
    # and the oracle agrees on the same degenerate parquet
    sdf = sx.w_decay_popularity(spark, str(tmp_path)).toPandas()
    odf = _events_con(decay_edge_events).execute(
        sx.ORACLE["w_decay_popularity"]
    ).fetchdf()
    _compare(sdf, odf)
