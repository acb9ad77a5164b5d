"""PII scan + redaction — the privacy-filter stage of a training-data
pipeline (the public precedent: BigScience ROOTS / BigCode PII
pipelines redact emails, phone numbers, and IP addresses with regex +
tag replacement before pretraining; no counterpart in the reference,
which stores no free-form PII).

The slim synthetic `customer` table carries no contact strings, so —
the ``quality_signals`` synthetic-tail precedent — both engines build
the SAME deterministic contact text per customer from its keys (name,
a derived email, a format-realistic phone for 2 of 3 customers, a
derived IPv4), then the operators under test run against that text:

- detection: ``regexp_extract_all`` counts per PII class;
- redaction: class tag replacement (``[EMAIL]``/``[PHONE]``/``[IP]``);
- masking: format-preserving digit masking of the phone field.

Regexes stay in the POSIX-class subset that Java (Spark) and RE2
(DuckDB) match identically — no lookaround, no backslash classes.

Scale shape: one scan, zero shuffles, zero joins, no Python — every
expression is JVM-side regexp/codegen; at 100 TB this runs at scan
bandwidth next to the other per-row filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.queries.registry import register, tbl

EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z][a-z]+"
PHONE_RE = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
IP_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

#: Deterministic contact text: email always present; phone for
#: c_custkey % 3 != 0 (so counts vary); IP always. Pure integer
#: arithmetic + string ops, mirrored exactly in both dialects (only
#: the integer-division operator differs: `//` vs `div`).
def _phone_sql(st: str) -> str:
    return (
        f"lpad(CAST(10 + c_custkey % 90 AS {st}), 2, '0') || '-' || "
        f"lpad(CAST(c_custkey % 1000 AS {st}), 3, '0') || '-' || "
        f"lpad(CAST(c_nationkey % 1000 AS {st}), 3, '0') || '-' || "
        f"lpad(CAST(c_custkey % 10000 AS {st}), 4, '0')"
    )


def _contact_sql(idiv: str, st: str) -> str:
    return (
        "c_name || ' <' || lower(replace(c_name, '#', '.')) || '@example.com>"
        " works in ' || c_mktsegment || "
        f"CASE WHEN c_custkey % 3 <> 0 THEN ' call ' || {_phone_sql(st)}"
        " ELSE '' END"
        f" || ' last seen from ' || CAST(1 + c_nationkey AS {st}) || '.' ||"
        f" CAST(c_custkey % 256 AS {st}) || '.' ||"
        f" CAST((c_custkey {idiv} 256) % 256 AS {st}) || '.' ||"
        f" CAST(1 + c_custkey % 254 AS {st})"
    )


@register(
    "pii_scan_redact",
    oracle=f"""
    WITH contact AS (
      SELECT c_custkey, {_contact_sql("//", "VARCHAR")} AS txt FROM customer
    ),
    scanned AS (
      SELECT c_custkey, txt,
             CAST(len(regexp_extract_all(txt, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(txt, '{PHONE_RE}')) AS BIGINT) AS n_phones,
             CAST(len(regexp_extract_all(txt, '{IP_RE}')) AS BIGINT) AS n_ips
      FROM contact
    )
    SELECT c_custkey, n_emails, n_phones, n_ips,
           n_emails + n_phones + n_ips AS pii_total,
           (n_emails + n_phones + n_ips) > 0 AS has_pii,
           regexp_replace(regexp_replace(regexp_replace(txt,
             '{EMAIL_RE}', '[EMAIL]', 'g'),
             '{PHONE_RE}', '[PHONE]', 'g'),
             '{IP_RE}', '[IP]', 'g') AS redacted,
           regexp_replace(regexp_extract(txt, '{PHONE_RE}'), '[0-9]', 'X', 'g')
             AS masked_phone
    FROM scanned
    """,
)
def pii_scan_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer PII scan (class counts), tag redaction, and
    format-preserving phone masking (module docstring) — one
    codegen-friendly scan, no shuffle.
    """
    return pii_scan_of(tbl(spark, sf_dir, "customer"))


def pii_scan_of(customers: DataFrame) -> DataFrame:
    """The scan/redact/mask program as a pure DataFrame transformation
    — batch/stream-agnostic (no shuffle), so the SAME regex program
    runs at ingest on a streaming source (streaming/filter_stream.py)
    and in the batch query above."""
    contact = customers.select(
        "c_custkey", F.expr(_contact_sql("div", "STRING")).alias("txt")
    )
    scanned = contact.select(
        "c_custkey",
        "txt",
        F.size(F.regexp_extract_all("txt", F.lit(EMAIL_RE), F.lit(0))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all("txt", F.lit(PHONE_RE), F.lit(0))).cast("long").alias("n_phones"),
        F.size(F.regexp_extract_all("txt", F.lit(IP_RE), F.lit(0))).cast("long").alias("n_ips"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("txt"), EMAIL_RE, "[EMAIL]"),
            PHONE_RE,
            "[PHONE]",
        ),
        IP_RE,
        "[IP]",
    )
    return scanned.select(
        "c_custkey",
        "n_emails",
        "n_phones",
        "n_ips",
        (F.col("n_emails") + F.col("n_phones") + F.col("n_ips")).alias("pii_total"),
        ((F.col("n_emails") + F.col("n_phones") + F.col("n_ips")) > 0).alias("has_pii"),
        redacted.alias("redacted"),
        F.regexp_replace(
            F.regexp_extract(F.col("txt"), PHONE_RE, 0), "[0-9]", "X"
        ).alias("masked_phone"),
    )
