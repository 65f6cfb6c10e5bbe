"""Literal reference-shaped fixtures (FIXTURES.md §A) for unit tests.

Deterministic tiny datasets that exercise every §3.4 hazard:

- duplicate (session_key, driver_number) pairs (at-least-once sink),
- NULL positions (race in progress) and positions > 10 (0 points),
- fact driver_numbers absent from the drivers dim (left-join survival),
- a driver with zero wins (coalesce(wins, 0)),
- points ties (explicit tie-break ordering),
- malformed JSON payloads (PERMISSIVE parse).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from f1_realtime_data_pipeline_spark.schemas import DRIVERS, RACE_RESULTS

# (gp, date, driver, position, laps, dnf, gap, meeting, session, points)
_RESULTS_ROWS = [
    # GP1: driver 1 wins, 44 second, 99 (not in dim) third, 16 P11 → 0 pts
    ("Bahrain", "2023-03-05T15:00:00", "1", 1, 57, False, None, "m1", "s1", 25),
    ("Bahrain", "2023-03-05T15:00:00", "44", 2, 57, False, "+5.123", "m1", "s1", 18),
    ("Bahrain", "2023-03-05T15:00:00", "99", 3, 57, False, "+7.000", "m1", "s1", 15),
    ("Bahrain", "2023-03-05T15:00:00", "16", 11, 56, False, "+1 lap", "m1", "s1", 0),
    # GP2: driver 44 wins; duplicate row for driver 1 (replayed batch)
    ("Jeddah", "2023-03-19T17:00:00", "44", 1, 50, False, None, "m2", "s2", 25),
    ("Jeddah", "2023-03-19T17:00:00", "1", 2, 50, False, "+2.2", "m2", "s2", 18),
    ("Jeddah", "2023-03-19T17:00:00", "1", 2, 50, False, "+2.2", "m2", "s2", 18),
    # GP2: driver 16 DNF with null gap
    ("Jeddah", "2023-03-19T17:00:00", "16", 18, 12, True, None, "m2", "s2", 0),
    # GP3: tie setup — drivers 1 and 44 both P2/P1 swap; 63 scores,
    # never wins (zero-wins coalesce path)
    ("Monza", "2023-09-03T14:00:00", "1", 1, 53, False, None, "m3", "s3", 25),
    ("Monza", "2023-09-03T14:00:00", "44", 2, 53, False, "+1.0", "m3", "s3", 18),
    ("Monza", "2023-09-03T14:00:00", "63", 3, 53, False, "+9.9", "m3", "s3", 15),
]

_DRIVERS_ROWS = [
    ("1", "Max Verstappen", "http://example/1.png"),
    ("44", "Lewis Hamilton", None),  # nullable headshot (streamlit-app.py:91)
    ("16", "Charles Leclerc", "http://example/16.png"),
    ("63", "George Russell", "http://example/63.png"),
    # NOTE: "99" deliberately absent → left-join null name
]


def race_results(spark: SparkSession) -> DataFrame:
    """Post-transform fact table (schema A2) incl. a duplicate row.

    Timestamps are built TZ-AWARE UTC (r6 review fix): a naive
    datetime goes through the driver's SYSTEM timezone in the
    non-Arrow createDataFrame path, so on a non-UTC host the fixture
    instants would drift by the UTC offset from what
    transform_stream's to_timestamp (session-tz UTC) parses from the
    identical ISO strings."""
    from datetime import datetime, timezone

    rows = [
        (
            gp,
            datetime.fromisoformat(dt).replace(tzinfo=timezone.utc),
            d, pos, laps, dnf, gap, mk, sk, pts,
        )
        for (gp, dt, d, pos, laps, dnf, gap, mk, sk, pts) in _RESULTS_ROWS
    ]
    return spark.createDataFrame(rows, RACE_RESULTS)


def drivers(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_DRIVERS_ROWS, DRIVERS)


def raw_messages(spark: SparkSession) -> DataFrame:
    """Kafka-like raw payloads (schema A1 as JSON strings in ``value``):
    the Q0 input, including an in-progress race (null position) and two
    malformed payloads for the PERMISSIVE path."""
    msgs = []
    for gp, dt, d, pos, laps, dnf, gap, mk, sk, _pts in _RESULTS_ROWS:
        msgs.append(
            json.dumps(
                {
                    "grand_prix": gp,
                    "date": dt,
                    "driver_number": d,
                    "position": pos,
                    "laps_completed": laps,
                    "dnf": dnf,
                    "gap_to_leader": gap,
                    "meeting_key": mk,
                    "session_key": sk,
                }
            )
        )
    # race in progress: position null (README.md:62)
    msgs.append(
        json.dumps(
            {
                "grand_prix": "Suzuka",
                "date": "2023-09-24T05:00:00",
                "driver_number": "1",
                "position": None,
                "laps_completed": 30,
                "dnf": False,
                "gap_to_leader": None,
                "meeting_key": "m4",
                "session_key": "s4",
            }
        )
    )
    msgs.append("{not valid json at all")
    msgs.append('["wrong", "shape"]')
    return spark.createDataFrame([(m,) for m in msgs], "value string")
