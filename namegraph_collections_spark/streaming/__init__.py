"""Structured Streaming surface of the engine.

The reference has no record-level streaming (SURVEY §2.10) — its
incrementality is 4-weekly DAG re-runs plus the snapshot diff of §2.8.
This package provides the honest Spark restatements: the CDC diff as
an incremental `Trigger.AvailableNow` pipeline, plus the streaming
operators a training-data pipeline needs over the `events` table
(watermarked windowed rollups, streaming dedup, sessionization).
"""
