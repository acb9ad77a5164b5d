"""Oracle-checked end-to-end slice of the reference pipeline
(SURVEY §3.1; readme.md:22-31 — raw dumps → enriched collection docs).

The plans (`plans/collections_core.py` → `enrich_merge.py` →
`letter_merge.py` → `doc_factory.py`) mirror
create_collections.py:41-702 and create_merged.py:383-989. Pytest
covers them with hand fixtures; these three queries put the SAME plan
code under the driver's hard DuckDB-value-hash gate by synthesizing a
deterministic wiki universe from the star-schema tables inside the
query — identically on both engines — and running the real pipeline
over it.

Fixture design (every rule is arithmetic on c_custkey/n_nationkey so
DuckDB can re-derive it):

- members = customers: qid Q(100000+k), page id 10000+k, title
  'Customer k' ('Πελάτης k' when k%13==0 → title curation fails →
  J8 label fallback to 'Kunde k'); qid mapping via `about` triples
  (k%3==0), wikimapper (else), or neither (k%89==0 → dropped, J4);
  alias entities with same_as and no types when k%11==0 (ParentFinder
  fallback, create_collections.py:566-575) whose canonical carries a
  DIFFERENT segment type so the fallback is value-visible.
- type hierarchy: 5 segment leaves → 2 mids → 2 roots (subclass_of
  chains exercised through the J14 closure).
- collections: per nation TWO categories split ',_A–M'/',_N–Z'
  (letter-range merge, create_merged.py:745-804), 5 region lists
  (category→list merge, :614-706, via all three candidate
  priorities), plus specials for F7 (Q13406463-only types), F8
  (blocklisted type), F9 ('Wikipedia:' name), F10 (' by <lower>'),
  and an exact-name duplicate (remove_duplicates, :992-1017).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.plans.collections_core import (
    build_allowlists,
    extract_collections,
    group_members,
    link_members,
    subclass_reachability,
    validate_members,
)
from namegraph_collections_spark.queries.registry import register, tbl
from namegraph_collections_spark.sources.ntriples import assemble_entities

_SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def _seg_col():
    expr = F.lit(4)
    for i, s in enumerate(_SEGS[:4]):
        expr = F.when(F.col("c_mktsegment") == s, F.lit(i)).otherwise(expr)
    return expr


def _q(base: int, off):
    return F.concat(F.lit("Q"), (F.lit(base) + off).cast("string"))


def _customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")
    n = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    k = F.col("k")
    df = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("c_custkey").alias("k"),
            F.col("c_nationkey").alias("n"),
            F.col("n_regionkey").alias("r"),
            _seg_col().alias("seg"),
        )
        .withColumn("qid", _q(100000, k))
        .withColumn("page_id", k + 10000)
        .withColumn(
            "title",
            F.when(k % 13 == 0, F.concat(F.lit("Πελάτης "), k.cast("string"))).otherwise(
                F.concat(F.lit("Customer "), k.cast("string"))
            ),
        )
        .withColumn(
            "curated",
            F.when(k % 13 == 0, F.concat(F.lit("kunde"), k.cast("string"))).otherwise(
                F.concat(F.lit("customer"), k.cast("string"))
            ),
        )
        .withColumn("eff_seg", F.when(k % 11 == 0, (F.col("seg") + 1) % 5).otherwise(F.col("seg")))
        .withColumn("no_map", k % 89 == 0)
        .withColumn("about_route", (k % 3 == 0) & ~F.col("no_map"))
    )
    return df


def _nation_cats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two category collections per nation: item Q(300000+2n+v),
    article 'Category:Customers_of_<n_name>,_A–M|N–Z' (v=0|1)."""
    n = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    cats = n.withColumn("v", F.explode(F.array(F.lit(0), F.lit(1))))
    return cats.select(
        F.col("n_nationkey").alias("n"),
        "n_name",
        F.col("n_regionkey").alias("r"),
        "v",
        _q(300000, 2 * F.col("n_nationkey") + F.col("v")).alias("item"),
        F.concat(
            F.lit("Category:Customers_of_"),
            F.col("n_name"),
            F.when(F.col("v") == 0, F.lit(",_A–M")).otherwise(F.lit(",_N–Z")),
        ).alias("article"),
    )


# Specials: (item, article, type_qid). Member rules live in _catlinks.
_SPECIALS = [
    ("Q370000", "Category:Customers_in_REGION_0", "Q400000"),  # name-match merge (c)
    ("Q370001", "Category:Wikipedia:Customer_cleanup", "Q400000"),  # F9
    ("Q370002", "Category:Customers_by_country", "Q400000"),  # F10
    ("Q370003", "Category:Customers_of_NATION_3", "Q400001"),  # exact-name dup (A8)
]

# Type hierarchy: leaves Q50000s → mids Q45000(s%2) → roots Q40000m.
_TYPE_TRIPLES = (
    [(f"Q{500000 + s}", "subclass_of", f"Q{450000 + s % 2}") for s in range(5)]
    + [(f"Q{500000 + s}", "label", f"Segment {s}") for s in range(5)]
    + [(f"Q{450000 + m}", "subclass_of", f"Q{400000 + m}") for m in range(2)]
    + [(f"Q{450000 + m}", "label", f"Mid {m}") for m in range(2)]
    + [(f"Q{400000 + m}", "label", f"Root {m}") for m in range(2)]
    + [
        ("Q4167836", "label", "Wikimedia category"),
        ("Q13406463", "label", "Wikimedia list article"),
    ]
)


def _lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = tbl(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return r.select(
        F.col("r_regionkey").alias("r"),
        "r_name",
        _q(600000, F.col("r_regionkey")).alias("item"),
        F.concat(F.lit("List_of_customers_in_"), F.col("r_name")).alias("article"),
    )


def _fixture(spark: SparkSession, sf_dir: str):
    """Build (triples, wikimapper, categorylinks, pagelinks, qrank,
    domains, scores) — the synthetic wiki universe, all derived from
    the star tables."""
    cust = _customers(spark, sf_dir)
    cats = _nation_cats(spark, sf_dir)
    lists = _lists(spark, sf_dir)
    k = F.col("k")
    n = F.col("n")
    lit = F.lit

    def t(df, subj, pred, obj):
        return df.select(subj.alias("subject"), lit(pred).alias("predicate"), obj.alias("object"))

    leaf = lambda c: _q(500000, c)  # noqa: E731
    root_of_n = _q(400000, n % 2)

    triples = [
        # member entities
        t(cust, F.col("qid"), "label", F.concat(lit("Kunde "), k.cast("string"))),
        t(cust.filter(k % 11 != 0), F.col("qid"), "instance_of", leaf(F.col("seg"))),
        t(cust.filter(k % 11 == 0), F.col("qid"), "same_as", _q(700000, k)),
        t(cust.filter(k % 11 == 0), _q(700000, k), "instance_of", leaf(F.col("eff_seg"))),
        t(cust.filter("about_route"), F.col("title"), "about", F.col("qid")),
        # nation categories: types
        t(cats.filter(n == 23), F.col("item"), "category_contains", lit("Q13406463")),
        t(cats.filter(n != 23), F.col("item"), "category_contains", root_of_n),
        t(cats.filter(n == 22), F.col("item"), "category_contains", lit("Q4167836")),
        t(cats.filter(n % 7 == 0), F.col("item"), "category_contains", _q(500000, n % 5)),
        # nation categories: aux description / image / banner
        t(cats.filter(n % 5 == 0), F.col("item"), "description", lit("Wikimedia list article")),
        t(
            cats.filter(n % 5 == 1),
            F.col("item"),
            "description",
            lit("Wikimedia customer collection"),
        ),
        t(
            cats.filter(n % 5 == 2),
            F.col("item"),
            "description",
            F.concat(lit("Customers from "), F.col("n_name")),
        ),
        t(cats.filter(n % 2 == 0), F.col("item"), "image", F.concat(lit("Img%20"), n.cast("string"))),
        t(
            cats.filter(n % 3 == 0),
            F.col("item"),
            "page_banner",
            F.concat(lit("Banner_"), n.cast("string")),
        ),
        # merge edge (b): nation r+5's N–Z category → region list r
        t(
            cats.filter((n >= 5) & (n <= 9) & (F.col("v") == 1)),
            F.col("item"),
            "list_related_to_category",
            _q(600000, n - 5),
        ),
        # region lists
        t(lists, F.col("item"), "is_a_list_of", _q(400000, F.col("r") % 2)),
        # merge edge (a): list r names nation r's A–M category
        t(lists, F.col("item"), "category_related_to_list", _q(300000, 2 * F.col("r"))),
        t(
            lists.filter(F.col("r") % 2 == 0),
            F.col("item"),
            "description",
            F.concat(lit("Great customers of "), F.col("r_name")),
        ),
    ]
    static = spark.createDataFrame(
        _TYPE_TRIPLES + [(it, "category_contains", tq) for it, _, tq in _SPECIALS],
        "subject string, predicate string, object string",
    )
    all_triples = static
    for frag in triples:
        all_triples = all_triples.unionByName(frag)

    wm_schema = [
        F.col("wikipedia_title"),
        F.col("wikipedia_id").cast("bigint").alias("wikipedia_id"),
        F.col("wikidata_id"),
        F.col("redirect"),
        F.col("primary_mapping"),
    ]

    def wm(df, title, page_id, qid, redirect=False, primary=True):
        return df.select(
            title.alias("wikipedia_title"),
            page_id.alias("wikipedia_id"),
            qid.alias("wikidata_id"),
            lit(redirect).alias("redirect"),
            lit(primary).alias("primary_mapping"),
        ).select(*wm_schema)

    wikimapper = (
        wm(
            cust,
            F.col("title"),
            F.col("page_id"),
            F.when(~F.col("about_route") & ~F.col("no_map"), F.col("qid")),
        )
        .unionByName(wm(cats, F.col("article"), 30000 + 2 * n + F.col("v"), F.col("item")))
        .unionByName(
            wm(
                cats.filter(F.col("v") == 0),
                F.concat(lit("Customers_of_"), F.col("n_name"), lit("_redirect")),
                90000 + 2 * n,
                F.col("item"),
                redirect=True,
                primary=False,
            )
        )
        .unionByName(
            wm(
                spark.createDataFrame(
                    [(it, art, 39000 + i) for i, (it, art, _) in enumerate(_SPECIALS)],
                    "item string, article string, pid long",
                ),
                F.col("article"),
                F.col("pid"),
                F.col("item"),
            )
        )
        .unionByName(wm(lists, F.col("article"), 60000 + F.col("r"), F.col("item")))
    )

    cat_key = F.concat(
        lit("Customers_of_"),
        F.col("n_name"),
        F.when(k % 2 == 0, lit(",_A–M")).otherwise(lit(",_N–Z")),
    )
    cust_nat = cust.join(
        F.broadcast(tbl(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("n"), "n_name")),
        "n",
    )
    cl = cust_nat.select(F.col("page_id").alias("cl_from"), cat_key.alias("cl_to"))
    spec_links = [
        (0, 7, "Customers_in_REGION_0"),
        (1, 9, "Wikipedia:Customer_cleanup"),
        (2, 9, "Customers_by_country"),
        (3, 5, "Customers_of_NATION_3"),
    ]
    for nat, mod, key in spec_links:
        cl = cl.unionByName(
            cust.filter((n == nat) & (k % mod == 0)).select(
                F.col("page_id").alias("cl_from"), lit(key).alias("cl_to")
            )
        )
    categorylinks = cl

    pagelinks = cust.filter(k % 10 < 3).select(
        (60000 + F.col("r")).alias("pl_from"), F.col("title").alias("pl_title")
    )

    qrank = (
        cust.filter(k % 17 != 0)
        .select(F.col("qid").alias("id"), (1 + (k * 37) % 997).cast("long").alias("rank"))
        .unionByName(
            cats.filter(n % 19 != 0).select(
                F.col("item").alias("id"),
                (40 + 2 * n + F.col("v")).cast("long").alias("rank"),
            )
        )
        .unionByName(
            lists.select(F.col("item").alias("id"), (500 + F.col("r")).cast("long").alias("rank"))
        )
    )

    status = (
        F.when(k % 20 == 3, lit("recently_released"))
        .when(k % 4 == 0, lit("available"))
        .when(k % 4 == 1, lit("taken"))
        .when(k % 4 == 2, lit("on_sale"))
    )
    domains = cust.select(F.col("curated").alias("name"), status.alias("status")).filter(
        F.col("status").isNotNull()
    )
    scores = cust.filter(k % 6 == 0).select(
        F.col("curated").alias("label"),
        (0.25 * ((k % 8) + 1)).cast("double").alias("interesting_score"),
    )
    return all_triples, wikimapper, categorylinks, pagelinks, qrank, domains, scores


def _validated(spark: SparkSession, sf_dir: str):
    triples, wikimapper, categorylinks, pagelinks, qrank, domains, scores = _fixture(
        spark, sf_dir
    )
    entities = assemble_entities(triples)
    cats = extract_collections(entities, wikimapper, "category")
    lsts = extract_collections(entities, wikimapper, "list")
    mem_c = link_members(
        categorylinks, None, build_allowlists(cats, wikimapper, "category"), wikimapper, "category"
    )
    mem_l = link_members(
        None, pagelinks, build_allowlists(lsts, wikimapper, "list"), wikimapper, "list"
    )
    grouped = group_members(mem_c, cats, "category").unionByName(
        group_members(mem_l, lsts, "list")
    )
    reachable = subclass_reachability(entities)
    validated = validate_members(grouped, entities, wikimapper, reachable)
    return validated, entities, wikimapper, qrank, domains, scores


# ---------------------------------------------------------------------------
# Shared oracle CTE prefix: the same fixture + validation, in DuckDB SQL.
# ---------------------------------------------------------------------------

_ORACLE_VALIDATED = """
WITH cust AS (
  SELECT c_custkey AS k, c_nationkey AS n, n_name, n_regionkey AS r,
    CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 0 WHEN 'BUILDING' THEN 1
      WHEN 'FURNITURE' THEN 2 WHEN 'HOUSEHOLD' THEN 3 ELSE 4 END AS seg
  FROM customer JOIN nation ON c_nationkey = n_nationkey
),
c2 AS (
  SELECT *,
    'Q' || CAST(100000 + k AS VARCHAR) AS qid,
    CASE WHEN k % 13 = 0 THEN 'Πελάτης ' || k ELSE 'Customer ' || k END AS title,
    CASE WHEN k % 13 = 0 THEN 'kunde' || k ELSE 'customer' || k END AS curated,
    CASE WHEN k % 11 = 0 THEN (seg + 1) % 5 ELSE seg END AS eff_seg,
    (k % 89 = 0) AS no_map
  FROM cust
),
colls AS (
  SELECT 'Q' || CAST(300000 + 2*n_nationkey + v AS VARCHAR) AS item,
         'Category:Customers_of_' || n_name
           || CASE WHEN v = 0 THEN ',_A–M' ELSE ',_N–Z' END AS article,
         'category' AS kind, n_nationkey AS n, NULL AS r, v
  FROM nation CROSS JOIN (VALUES (0), (1)) AS sides(v)
  UNION ALL
  SELECT s.item, s.article, 'category', NULL, NULL, NULL
  FROM (VALUES
    ('Q370000', 'Category:Customers_in_REGION_0'),
    ('Q370001', 'Category:Wikipedia:Customer_cleanup'),
    ('Q370002', 'Category:Customers_by_country'),
    ('Q370003', 'Category:Customers_of_NATION_3')) AS s(item, article)
  UNION ALL
  SELECT 'Q' || CAST(600000 + r_regionkey AS VARCHAR),
         'List_of_customers_in_' || r_name, 'list', NULL, r_regionkey, NULL
  FROM region
),
coll_types AS (
  SELECT item, 'Q13406463' AS tqid FROM colls WHERE n = 23
  UNION ALL
  SELECT item, 'Q' || CAST(400000 + n % 2 AS VARCHAR) FROM colls WHERE n IS NOT NULL AND n <> 23
  UNION ALL
  SELECT item, 'Q4167836' FROM colls WHERE n = 22
  UNION ALL
  SELECT item, 'Q' || CAST(500000 + n % 5 AS VARCHAR) FROM colls WHERE n % 7 = 0
  UNION ALL
  SELECT item, CASE WHEN item = 'Q370003' THEN 'Q400001' ELSE 'Q400000' END
  FROM colls WHERE item LIKE 'Q3700%'
  UNION ALL
  SELECT item, 'Q' || CAST(400000 + r % 2 AS VARCHAR) FROM colls WHERE kind = 'list'
),
coll_types_clean AS (SELECT * FROM coll_types WHERE tqid <> 'Q13406463'),
colls_kept AS (
  SELECT c.* FROM colls c WHERE EXISTS (
    SELECT 1 FROM coll_types_clean t WHERE t.item = c.item)
),
membership AS (
  SELECT c.item, m.k FROM colls c JOIN c2 m ON c.n = m.n AND m.k % 2 = c.v
  UNION ALL
  SELECT 'Q370000', k FROM c2 WHERE n = 0 AND k % 7 = 0
  UNION ALL
  SELECT 'Q370001', k FROM c2 WHERE n = 1 AND k % 9 = 0
  UNION ALL
  SELECT 'Q370002', k FROM c2 WHERE n = 2 AND k % 9 = 0
  UNION ALL
  SELECT 'Q370003', k FROM c2 WHERE n = 3 AND k % 5 = 0
  UNION ALL
  SELECT c.item, m.k FROM colls c JOIN c2 m ON c.kind = 'list' AND c.r = m.r AND m.k % 10 < 3
),
type_edges(src, dst) AS (
  SELECT 'Q' || CAST(500000 + s AS VARCHAR), 'Q' || CAST(450000 + s % 2 AS VARCHAR)
  FROM (VALUES (0),(1),(2),(3),(4)) AS leaves(s)
  UNION ALL
  SELECT 'Q' || CAST(450000 + m AS VARCHAR), 'Q' || CAST(400000 + m AS VARCHAR)
  FROM (VALUES (0),(1)) AS mids(m)
),
closure AS (
  WITH RECURSIVE reach(src, dst) AS (
    SELECT src, dst FROM type_edges
    UNION
    SELECT r.src, e.dst FROM reach r JOIN type_edges e ON r.dst = e.src)
  SELECT * FROM reach
),
valid_m AS (
  SELECT ms.item, m.k, m.qid, m.title, m.curated, m.eff_seg
  FROM membership ms JOIN c2 m USING (k)
  WHERE NOT m.no_map AND EXISTS (
    SELECT 1 FROM coll_types_clean t
    WHERE t.item = ms.item
      AND (t.tqid = 'Q' || CAST(500000 + m.eff_seg AS VARCHAR)
           OR t.tqid IN (SELECT dst FROM closure
                         WHERE src = 'Q' || CAST(500000 + m.eff_seg AS VARCHAR))))
),
validated AS (
  SELECT c.item, c.article, c.kind,
    (SELECT array_to_string(list(tqid ORDER BY tqid), ',')
       FROM coll_types_clean t WHERE t.item = c.item) AS type_csv,
    (SELECT list(tqid ORDER BY tqid)
       FROM coll_types_clean t WHERE t.item = c.item) AS type_ids,
    COALESCE(v.valid_count, 0) AS valid_members_count,
    g.total - COALESCE(v.valid_count, 0) AS invalid_members_count,
    COALESCE(v.members_csv, '') AS members_csv
  FROM colls_kept c
  JOIN (SELECT item, COUNT(*) AS total FROM membership GROUP BY item) g USING (item)
  LEFT JOIN (
    SELECT item, COUNT(*) AS valid_count,
      array_to_string(list(qid || ':' || title ORDER BY title), ',') AS members_csv
    FROM valid_m GROUP BY item) v USING (item)
)
"""


@register(
    "wiki_validate_members",
    oracle=_ORACLE_VALIDATED
    + """
    SELECT item, article, kind, type_csv, valid_members_count,
           invalid_members_count, members_csv
    FROM validated
    """,
)
def wiki_validate_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline slice stage 1: dumps → extracted/linked/type-validated
    collections (create_collections.py:41-702 semantics, the real
    plans/collections_core.py code path end to end)."""
    validated, *_ = _validated(spark, sf_dir)
    return validated.select(
        "item",
        "article",
        "kind",
        F.array_join("type", ",").alias("type_csv"),
        "valid_members_count",
        "invalid_members_count",
        F.array_join(
            F.transform("members", lambda m: F.concat(m["qid"], F.lit(":"), m["title"])), ","
        ).alias("members_csv"),
    )
