"""Streaming ingest filters: quality signals + PII scan at the point
of arrival.

A production corpus build runs its per-row filter family (Gopher
quality signals, PII redaction) as documents LAND, not as a nightly
batch — and because both operators are pure scan+project column
programs (no shuffle, no state), Spark's unified API runs the
IDENTICAL transformation on a streaming source: `quality_signals_of`
and `pii_scan_of` are the same functions the batch queries
`doc_quality_signals` / `pii_scan_redact` call, applied to a
`readStream` DataFrame. Append mode, zero state, per-microbatch cost
proportional to the new files only — the cheapest possible streaming
shape, and batch/stream parity holds by construction (pinned by
tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from namegraph_collections_spark.queries.c4_clean import c4_clean_of
from namegraph_collections_spark.queries.pii import pii_scan_of
from namegraph_collections_spark.queries.quality_signals import quality_signals_of
from namegraph_collections_spark.queries.text_analysis import language_id_of
from namegraph_collections_spark.queries.url_ops import url_canonicalize_of

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

CUSTOMER_SCHEMA = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]
)


def read_documents_stream(spark: SparkSession, docs_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )


def read_customer_stream(spark: SparkSession, cust_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(CUSTOMER_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(cust_dir)
    )


def quality_filter_stream(docs_stream: DataFrame) -> DataFrame:
    """Per-document quality signals + keep flag on a streaming source —
    the batch operator verbatim (queries/quality_signals.py)."""
    return quality_signals_of(docs_stream)


def pii_scan_stream(cust_stream: DataFrame) -> DataFrame:
    """PII detection/redaction/masking on a streaming source — the
    batch operator verbatim (queries/pii.py)."""
    return pii_scan_of(cust_stream)


def language_id_stream(docs_stream: DataFrame) -> DataFrame:
    """Per-document language identification on a streaming source —
    the batch operator verbatim (queries/text_analysis.py). Like the
    other two, a pure scan+project column program: zero state, append
    mode, per-microbatch cost proportional to the new files."""
    return language_id_of(docs_stream)


def c4_clean_stream(docs_stream: DataFrame) -> DataFrame:
    """C4 line-level cleaning on a streaming source — the batch
    operator verbatim (queries/c4_clean.py): bucket counts, cleaned
    md5 + char count, page gate, all per arriving document."""
    return c4_clean_of(docs_stream)


def url_canonicalize_stream(docs_stream: DataFrame) -> DataFrame:
    """URL canonicalization on a streaming source — the batch
    operator's canonicalization half verbatim (queries/url_ops.py).
    The first-wins dedup window is inherently stateful and stays
    batch-side (or probes the standing dedup index)."""
    return url_canonicalize_of(docs_stream)


def domain_gate_stream(docs_stream: DataFrame, gate: DataFrame) -> DataFrame:
    """Apply a batch-computed domain gate to documents AS THEY LAND —
    the stream-static join pattern: ``gate`` is the (domain,
    domain_keep) table host_quality_rollup produced over the existing
    corpus (re-read per microbatch — it is a handful of rows), and
    each arriving document broadcast-joins it after computing its own
    domain and quality keep flag with the batch fused per-doc program
    VERBATIM (web_rollup.per_doc_web_frame_of — one composition site,
    no drift). Emits the stateless verdict subset (domain ∧ quality);
    the first-copy-per-URL flag is inherently stateful and stays
    batch/index-side, like the URL dedup note above.

    A document from a domain the gate has never seen (the normal case
    for a live ingest stream — the rollup ran before the domain
    existed) must NOT silently vanish: the join is LEFT, its
    ``domain_keep`` comes through as NULL ("no verdict yet"), and
    ``ingest_keep`` fails OPEN to the per-doc quality flag alone —
    the gate can only have an opinion about domains it has evidence
    for; unknown-domain docs flow on to the next filter stage.

    Scale shape: scan+project plus a broadcast hash join against a
    tiny static side — still zero shuffles of the stream, still
    append mode, per-microbatch cost proportional to the new files.
    """
    from pyspark.sql import functions as F

    from namegraph_collections_spark.queries.web_rollup import per_doc_web_frame_of

    sig = per_doc_web_frame_of(docs_stream)
    return (
        sig.select("doc_id", "domain", F.col("keep").alias("doc_keep"))
        .join(F.broadcast(gate.select("domain", "domain_keep")), "domain", "left")
        .select(
            "doc_id",
            "domain",
            "domain_keep",
            "doc_keep",
            F.expr("coalesce(domain_keep, true) AND doc_keep").alias(
                "ingest_keep"
            ),
        )
    )
