"""Composed query plans.

- ``contract_star``  — the reference's contract queries Q0-Q4 (SURVEY.md
  §2.9) re-expressed over the driver's star schema so the DuckDB oracle
  can check them (FIXTURES.md "Reference-query ↔ star-schema mapping").
- ``contract_f1``    — the same queries over reference-shaped
  race_results/drivers frames (exact reference semantics, unit-tested).
- ``tpch``           — TPC-H-style headline queries used by bench.py.

Every oracle-checked module exposes ``QUERIES: dict[name, fn]`` and
``ORACLE: dict[name, sql]`` which ``__spark_entry__`` aggregates.
"""
