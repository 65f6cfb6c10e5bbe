"""Structured Streaming wiring (SURVEY.md §2.8 + §7 phase 3).

The batch plans in ``plans.contract_f1`` ARE the streaming transforms —
Structured Streaming's incrementalization means the same DataFrame
expressions run per micro-batch. This package adds what's
streaming-specific: sources (``sources.kafka`` / ``sources.replay``),
the idempotent sink (T5 upgraded from at-least-once to
effectively-exactly-once), watermarked windows (T6/T7), and custom
stateful operators (T8).
"""
