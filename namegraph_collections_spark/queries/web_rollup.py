"""Per-domain quality rollup + domain gate — the RefinedWeb-style
"filter at the domain level" stage (Penedo et al. 2023 §3.1: URL/domain
filtering happens BEFORE per-document content filtering; C4 likewise
drops whole hosts). A large-scale web pipeline decides to keep or drop
entire domains from aggregate evidence: per-document quality keep
rates, URL-duplication rates, and volume floors.

This operator fuses the engine's two per-document web signals — URL
canonicalization (queries/url_ops.py) and the Gopher/C4 quality keep
flag (queries/quality_signals.py) — into ONE scan via their ``carry``
seams (no second read of the table, no doc_id self-join), then rolls
up per registrable domain:

- ``n_docs``: documents seen on the domain;
- ``n_pages``: distinct canonical URLs (what URL-dedup would keep);
- ``n_keep``: documents passing the per-doc quality gate;
- ``sum_words``: domain word volume;
- ``keep_rate_micro`` / ``dup_rate_micro``: exact integer micro-unit
  ratios (round-8 rule: integers on the wire, decimals internal);
- ``domain_keep``: the gate — keep rate ≥ 25% AND a minimum-evidence
  doc count (a domain with 3 docs has no reliable rate).

Reference parity note: the reference has no web-domain stage (its
corpus is Wikidata); this is a training-data-pipeline extension per
the brief, built from the public RefinedWeb/C4 method descriptions.

Scale shape: one documents scan (the fused per-doc project is
shuffle-free), then ONE partial-aggregated groupBy on ``domain`` —
domains are low-cardinality relative to pages, so the shuffle moves
per-partition partials, not rows. ``COUNT(DISTINCT norm_url)`` adds
the standard two-phase distinct expansion keyed by (domain, norm_url)
— still one exchange of slim keys. At 100 TB this is the cheapest
rollup shape available; the output table (one row per domain) then
broadcast-joins back onto the corpus as the actual drop filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.queries.quality_signals import (
    _micro_sql,
    _micro_spark,
    quality_signals_of,
)
from namegraph_collections_spark.queries.registry import REGISTRY, register, tbl
from namegraph_collections_spark.queries.url_ops import url_canonicalize_of

#: Domain gate: ≥25% of the domain's documents must pass the per-doc
#: quality filter (at sf0.01 the observed domain keep rates span
#: 0–48% with a natural gap at 24/28% — the gate rejects a real
#: subset at every scale), and the rate needs a minimum-evidence
#: volume behind it.
DOMAIN_MIN_KEEP_MICRO = 250_000
DOMAIN_MIN_DOCS = 10

_GATE_SQL = (
    f"keep_rate_micro >= {DOMAIN_MIN_KEEP_MICRO} AND n_docs >= {DOMAIN_MIN_DOCS}"
)


def _component_oracle(name: str) -> str:
    # Import-time embed of the component oracles verbatim (battery
    # construction rule; this module imports after quality_signals
    # and url_ops — pinned in queries/__init__.py).
    return REGISTRY[name].oracle  # type: ignore[return-value]


@register(
    "host_quality_rollup",
    oracle=f"""
    WITH q AS ({_component_oracle("doc_quality_signals")}),
    u AS ({_component_oracle("url_canonical_dedup")}),
    j AS (
      SELECT u.domain, u.norm_url, q.keep, q.n_words
      FROM q JOIN u USING (doc_id)
    ),
    agg AS (
      SELECT domain,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT norm_url) AS BIGINT) AS n_pages,
             CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
             CAST(SUM(n_words) AS BIGINT) AS sum_words
      FROM j GROUP BY domain
    ),
    m AS (
      SELECT domain, n_docs, n_pages, n_keep, sum_words,
             CAST({_micro_sql("n_keep", "n_docs")} AS BIGINT) AS keep_rate_micro,
             CAST({_micro_sql("n_docs - n_pages", "n_docs")} AS BIGINT)
               AS dup_rate_micro
      FROM agg
    )
    SELECT domain, n_docs, n_pages, n_keep, sum_words,
           keep_rate_micro, dup_rate_micro, {_GATE_SQL} AS domain_keep
    FROM m
    """,
)
def host_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quality/duplication rollup + domain keep gate
    (module docstring). One scan: the URL columns and the quality
    signals are fused via the components' ``carry`` seams, then one
    domain-keyed aggregation. The oracle embeds both component
    oracles verbatim (battery construction rule) and joins them on
    doc_id — oracle-side clarity over oracle-side economy.
    """
    return host_quality_rollup_from(per_doc_web_frame(spark, sf_dir))


def per_doc_web_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE fused documents scan carrying both web-signal families per
    doc — (doc_id, norm_url, domain, quality signal columns, keep) —
    the shared input of the rollup, the gate-application stage, and
    the battery legs."""
    return per_doc_web_frame_of(
        tbl(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )


def per_doc_web_frame_of(docs: DataFrame) -> DataFrame:
    """The fused per-doc program over any (doc_id, source, text) frame
    — split out so the incremental gate maintenance
    (operators/gate_maintain.py) runs the IDENTICAL arithmetic on a
    batch as the full-corpus rollup runs on the table."""
    url = url_canonicalize_of(docs, carry=("text",))
    return quality_signals_of(url, carry=("norm_url", "domain"))


def host_quality_rollup_from(per_doc: DataFrame) -> DataFrame:
    """The rollup over an ALREADY-BUILT fused per-doc frame — the
    sharing seam string_ops_battery and domain_gated_corpus use so
    one scan feeds every consumer."""
    agg = per_doc.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("norm_url").cast("long").alias("n_pages"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.sum("n_words").cast("long").alias("sum_words"),
    )
    return finish_rollup(agg)


def finish_rollup(agg: DataFrame) -> DataFrame:
    """Micro-unit rates + the gate over a (domain, n_docs, n_pages,
    n_keep, sum_words) aggregate — shared by the one-shot rollup and
    the incremental state's re-aggregation, so both emit the
    identical gate table."""
    m = agg.select(
        "domain",
        "n_docs",
        "n_pages",
        "n_keep",
        "sum_words",
        F.expr(f"CAST({_micro_spark('n_keep', 'n_docs')} AS BIGINT)").alias(
            "keep_rate_micro"
        ),
        F.expr(
            f"CAST({_micro_spark('n_docs - n_pages', 'n_docs')} AS BIGINT)"
        ).alias("dup_rate_micro"),
    )
    return m.select("*", F.expr(_GATE_SQL).alias("domain_keep"))


@register(
    "domain_gated_corpus",
    oracle=f"""
    WITH u AS ({_component_oracle("url_canonical_dedup")}),
    q AS ({_component_oracle("doc_quality_signals")}),
    g AS ({_component_oracle("host_quality_rollup")})
    SELECT u.doc_id, u.domain,
           g.domain_keep, q.keep AS doc_keep, u.url_keep,
           (g.domain_keep AND q.keep AND u.url_keep) AS final_keep
    FROM u JOIN q USING (doc_id) JOIN g USING (domain)
    """,
)
def domain_gated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the domain gate back onto the corpus — the stage after
    the rollup: every document gets its three web keep verdicts
    (domain gate, per-doc quality, first-copy-per-canonical-URL) and
    the AND of them, the actual row filter a web pipeline ships.

    Scale shape: the aggregate-then-apply pattern is inherently two
    passes — one scan aggregates the per-domain gate (tiny output),
    the second scan applies it via a BROADCAST join on the
    low-cardinality domain key (no shuffle of the corpus side; the
    `url_keep` window is the same norm_url-keyed exchange
    url_canonical_dedup already pays). The oracle embeds all three
    component oracles verbatim.
    """
    return domain_gated_corpus_from(per_doc_web_frame(spark, sf_dir))


def domain_gated_corpus_from(
    per_doc: DataFrame, gate: DataFrame | None = None
) -> DataFrame:
    """Gate application over an ALREADY-BUILT fused per-doc frame —
    the sharing seam string_ops_battery uses to feed its rollup and
    gated legs from one scan. Pass ``gate`` (a (domain, domain_keep)
    frame) when the caller already built the rollup, so the battery
    does not aggregate the same frame twice."""
    if gate is None:
        gate = host_quality_rollup_from(per_doc)
    gate = gate.select("domain", "domain_keep")
    with_url_keep = per_doc.select(
        "doc_id",
        "domain",
        F.col("keep").alias("doc_keep"),
        F.expr("doc_id = MIN(doc_id) OVER (PARTITION BY norm_url)").alias(
            "url_keep"
        ),
    )
    return (
        with_url_keep.join(F.broadcast(gate), "domain")
        .select(
            "doc_id",
            "domain",
            "domain_keep",
            "doc_keep",
            "url_keep",
            F.expr("domain_keep AND doc_keep AND url_keep").alias("final_keep"),
        )
    )
