"""Structured Streaming surface of the engine.

The reference has no record-level streaming (SURVEY §2.10) — its
incrementality is 4-weekly DAG re-runs plus the snapshot diff of §2.8.
This package provides the honest Spark restatements: the CDC diff as
an incremental `Trigger.AvailableNow` pipeline, plus the streaming
operators a training-data pipeline needs over the `events` table
(watermarked windowed rollups, streaming dedup, sessionization).

Two recurring shapes, both parity-pinned against their batch twins:

- **Stateless ingest transforms** (filter_stream, nbq_stream, the
  DSIR scorer): the identical column program runs on `readStream`
  sources in append mode — per-micro-batch cost proportional to new
  files, zero state.
- **foreachBatch additive-state maintainers** (gate_maintain_stream,
  dsir_stream, cms_maintain_stream): each micro-batch merges into a
  persisted keyed state via the BATCH maintenance function verbatim
  on the shared `operators/additive_state.py` contract (stamp-keyed
  replay idempotence, crash-window safety, ordering guard).
"""
