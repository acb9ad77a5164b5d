"""Streaming incremental dedup: a document stream probes a STATIC
MinHash band index (the stream-static join pattern).

Batch twin: queries/dedup.py::incremental_minhash_dedup — same index,
same banding arithmetic, same candidates. The streaming form is what
the daily job becomes when "daily" shrinks to "continuously": the
corpus index is a static (periodically refreshed) table, new
documents land as files, and every micro-batch joins its banded docs
against the index — Structured Streaming executes a stream-static
equi-join statelessly, re-reading only the static side's matching
partitions.

Two deliberate design points:

- **Stateless banding.** The batch index builder computes per-doc
  minhashes with explode → groupBy (map-side partial aggregation —
  right at corpus scale). A streaming groupBy would be a STATEFUL
  aggregation (watermarks, update mode); instead the per-doc
  signature is computed per ROW with array expressions —
  ``array_min(transform(...))`` over the doc's own shingle array —
  which is byte-identical to the groupBy result (min over the same
  values) and keeps the stream append-mode, zero-state. md5 runs once
  per shingle (hashes materialize as a struct array first), matching
  the batch cost shape.
- **At-least-once candidates.** A candidate pair surfaces once per
  matching band; the batch query DISTINCTs them, but distinct on a
  stream is stateful, so the stream emits raw (band-multiplied)
  candidates and downstream dedups — the standard
  at-least-once-then-dedup contract. The parity test compares sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from namegraph_collections_spark.queries.dedup import (
    BAND_SIZE,
    MINHASH_PRIME,
    NUM_MINHASHES,
)


def stateless_minhash_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band, band_sig) computed entirely per-row — no
    explode, no groupBy — byte-identical to the batch
    ``_minhash_bands`` index (pinned by the streaming parity test).
    Works on static AND streaming DataFrames.
    """
    toks = F.split(F.lower(F.col("text")), " ")
    grams = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda t, i: F.concat_ws(
            " ", t, F.element_at(toks, i + 2), F.element_at(toks, i + 3)
        ),
    )
    sh = F.array_distinct(grams)
    hs = F.transform(
        sh,
        lambda x: F.struct(
            F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(F.md5(x), 9, 8), 16, 10).cast("long").alias("h2"),
        ),
    )
    def mh_col(s: int):
        # seed bound via def-scope closure, NOT a lambda default:
        # F.transform treats a two-argument lambda as (element, index)
        # and would silently overwrite the default with the array index
        return F.array_min(
            F.transform(hs, lambda h: (h["h1"] + F.lit(s + 1) * h["h2"]) % MINHASH_PRIME)
        ).alias(f"mh{s}")

    with_mh = docs.select("doc_id", *[mh_col(s) for s in range(NUM_MINHASHES)])
    n_bands = NUM_MINHASHES // BAND_SIZE
    band_sigs = [
        F.md5(
            F.concat_ws(
                ",",
                *[
                    F.col(f"mh{s}").cast("string")
                    for s in range(b * BAND_SIZE, (b + 1) * BAND_SIZE)
                ],
            )
        ).alias(f"b{b}")
        for b in range(n_bands)
    ]
    stack_args = ", ".join(f"{b}, b{b}" for b in range(n_bands))
    return with_mh.select("doc_id", *band_sigs).selectExpr(
        "doc_id", f"stack({n_bands}, {stack_args}) AS (band, band_sig)"
    )


def streaming_index_dedup(doc_stream: DataFrame, index_bands: DataFrame) -> DataFrame:
    """Band the streaming documents statelessly and probe the static
    corpus index: returns an append-mode stream of
    (new_doc, old_doc, band) candidate hits (at-least-once per pair —
    one row per matching band; dedup downstream).

    ``index_bands`` is the batch-built (doc_id, band, band_sig) table
    — at scale a bucketed lake table refreshed by the nightly index
    job while the stream keeps probing it.
    """
    new_bands = stateless_minhash_bands(doc_stream).select(
        F.col("doc_id").alias("new_doc"), "band", "band_sig"
    )
    old = index_bands.select(
        F.col("doc_id").alias("old_doc"), "band", "band_sig"
    )
    return new_bands.join(old, ["band", "band_sig"]).select(
        "new_doc", "old_doc", "band"
    )
