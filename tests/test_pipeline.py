"""Vertical-slice test of the namegraph pipeline (SURVEY §7 step 3):
a miniature "Pink Floyd albums" universe (readme.md:22-31) traced from
raw N-Triples to the final nested document.

Fixture design follows FIXTURES.md: multi-valued predicates, a
subclass DAG with depth ≥2 and a cycle, a same_as redirect, an
unmappable member, a 'Category:' member (F6), an invalid-typed member,
and a list/category pair related in both db4 directions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from namegraph_collections_spark.functions.seeded import seeded_banner
from namegraph_collections_spark.plans.collections_core import (
    build_allowlists,
    extract_collections,
    group_members,
    link_members,
    subclass_reachability,
    validate_members,
)
from namegraph_collections_spark.plans.doc_factory import build_documents
from namegraph_collections_spark.plans.enrich_merge import (
    enrich_all_info,
    merge_lists_and_categories,
)
from namegraph_collections_spark.sources.ntriples import (
    assemble_entities,
    filtered_triples,
    parse_ntriples,
)

# --- cleaned triple fixture -------------------------------------------------
TRIPLES = [
    # list: Q100 'List_of_Pink_Floyd_albums', is_a_list_of album(Q482994),
    # related to category Q123 (P1754 direction)
    ("Q100", "is_a_list_of", "Q482994"),
    ("Q100", "category_related_to_list", "Q123"),
    ("Q100", "label", "list of Pink Floyd albums"),
    ("Q100", "description", "Wikimedia list article"),
    # category: Q123 'Category:Pink_Floyd_albums', category_contains album,
    # related back to the list (P1753 direction)
    ("Q123", "category_contains", "Q482994"),
    ("Q123", "list_related_to_category", "Q100"),
    ("Q123", "label", "Pink Floyd albums"),
    ("Q123", "description", "Wikimedia category"),
    # type hierarchy: studio album (Q999) ⊂ album (Q482994); concept
    # album (Q998) ⊂ studio album; cycle back studio ⊂ concept; Q777
    # same_as studio album
    ("Q999", "subclass_of", "Q482994"),
    ("Q998", "subclass_of", "Q999"),
    ("Q999", "subclass_of", "Q998"),
    ("Q777", "same_as", "Q999"),
    ("Q482994", "label", "album"),
    # members
    ("Q163821", "instance_of", "Q482994"),  # Dark Side — direct type hit
    ("Q163821", "label", "The Dark Side of the Moon"),
    ("Q146494", "instance_of", "Q999"),  # The Wall — one hop
    ("Q693407", "instance_of", "Q998"),  # Animals — two hops
    ("Q693407", "image", "Animals_cover%27s.jpg"),
    ("Q2306", "instance_of", "Q215380"),  # Pink Floyd the band — invalid type
    ("Q11111", "instance_of", "Q777"),  # Obscured — type via same_as redirect
    ("Q11111", "label", "Obscured by Clouds"),
    # title→qid 'about' edges (db1 primary path, J4)
    ("The_Dark_Side_of_the_Moon", "about", "Q163821"),
    ("The_Wall", "about", "Q146494"),
    ("Animals_(album)", "about", "Q693407"),
    ("Pink_Floyd", "about", "Q2306"),
    # Obscured_by_Clouds intentionally has NO about edge → wikimapper fallback
]

WIKIMAPPER = [
    # (wikipedia_title, wikipedia_id, wikidata_id, redirect, primary_mapping)
    ("List_of_Pink_Floyd_albums", 800, "Q100", False, True),
    ("Category:Pink_Floyd_albums", 900, "Q123", False, True),
    ("The_Dark_Side_of_the_Moon", 11, "Q163821", False, True),
    ("The_Wall", 12, "Q146494", False, True),
    ("Animals_(album)", 13, "Q693407", False, True),
    ("Pink_Floyd", 14, "Q2306", False, True),
    ("Obscured_by_Clouds", 15, "Q11111", False, True),  # J4 fallback target
    ("Pink_Floyd_discography", 800, "Q100", True, False),  # redirect → keyword
    ("Category:Subcategory_of_albums", 16, None, False, True),
]

CATEGORYLINKS = [  # (cl_from page id, cl_to title sans prefix)
    (11, "Pink_Floyd_albums"),
    (12, "Pink_Floyd_albums"),
    (13, "Pink_Floyd_albums"),
    (14, "Pink_Floyd_albums"),  # the band — invalid member
    (16, "Pink_Floyd_albums"),  # 'Category:*' member — dropped (F6)
    (999, "Pink_Floyd_albums"),  # unmappable page id — skipped (J2)
    (11, "Some_other_category"),  # not allowed — semi-join drops
]

PAGELINKS = [  # (pl_from list page id, pl_title)
    (800, "The_Dark_Side_of_the_Moon"),
    (800, "The_Wall"),
    (800, "Obscured_by_Clouds"),
    (800, "Category:Pink_Floyd_albums"),  # F6 drop
    (801, "The_Wall"),  # not an allowed list page
]

QRANK = [("Q163821", 500), ("Q146494", 900), ("Q693407", 300), ("Q100", 77), ("Q123", 55)]
DOMAINS = [("thewall", "taken"), ("animals", "available")]
SCORES = [
    ("thedarksideofthemoon", 0.9),
    ("thewall", 0.8),
    ("animals", 0.7),
    ("obscuredbyclouds", 0.6),
]


@pytest.fixture(scope="module")
def universe(spark):
    triples = spark.createDataFrame(TRIPLES, ["subject", "predicate", "object"])
    entities = assemble_entities(triples).cache()
    wikimapper = spark.createDataFrame(
        WIKIMAPPER, ["wikipedia_title", "wikipedia_id", "wikidata_id", "redirect", "primary_mapping"]
    )
    return {
        "entities": entities,
        "wikimapper": wikimapper,
        "categorylinks": spark.createDataFrame(CATEGORYLINKS, ["cl_from", "cl_to"]),
        "pagelinks": spark.createDataFrame(PAGELINKS, ["pl_from", "pl_title"]),
        "qrank": spark.createDataFrame(QRANK, ["id", "rank"]),
        "domains": spark.createDataFrame(DOMAINS, ["name", "status"]),
        "scores": spark.createDataFrame(SCORES, ["label", "interesting_score"]),
    }


@pytest.fixture(scope="module")
def validated(spark, universe):
    ent, wm = universe["entities"], universe["wikimapper"]
    cats = extract_collections(ent, wm, "category")
    lists = extract_collections(ent, wm, "list")
    cat_allowed = build_allowlists(cats, wm, "category")
    list_allowed = build_allowlists(lists, wm, "list")
    cat_members = link_members(universe["categorylinks"], None, cat_allowed, wm, "category")
    list_members = link_members(None, universe["pagelinks"], list_allowed, wm, "list")
    cat_grouped = group_members(cat_members, cats, "category")
    list_grouped = group_members(list_members, lists, "list")
    reachable = subclass_reachability(ent)
    v_cats = validate_members(cat_grouped, ent, wm, reachable)
    v_lists = validate_members(list_grouped, ent, wm, reachable)
    return v_cats.unionByName(v_lists).cache()


def test_ntriples_parsing(spark, tmp_path):
    raw = "\n".join(
        [
            "<http://www.wikidata.org/entity/Q163821> <http://www.wikidata.org/prop/direct/P31> <http://www.wikidata.org/entity/Q482994> .",
            '<http://www.wikidata.org/entity/Q163821> <http://www.w3.org/2000/01/rdf-schema#label> "The Dark Side of the Moon"@en .',
            "<https://en.wikipedia.org/wiki/The_Wall> <http://schema.org/about> <http://www.wikidata.org/entity/Q146494> .",
            # F1 drop: unmapped predicate
            "<http://www.wikidata.org/entity/Q1> <http://www.wikidata.org/prop/direct/P999> <http://www.wikidata.org/entity/Q2> .",
            # F2 drop: blocklisted instance_of object
            "<http://www.wikidata.org/entity/Q5> <http://www.wikidata.org/prop/direct/P31> <http://www.wikidata.org/entity/Q4167410> .",
            # F3 drop: name triple with enwiki subject
            '<https://en.wikipedia.org/wiki/The_Wall> <http://schema.org/name> "The Wall"@en .',
            # S3 skip: non-@en literal
            '<http://www.wikidata.org/entity/Q9> <http://www.w3.org/2000/01/rdf-schema#label> "Mur"@fr .',
        ]
    )
    p = tmp_path / "dump.nt"
    p.write_text(raw)
    parsed = filtered_triples(parse_ntriples(spark, str(p)))
    rows = {(r.subject, r.predicate, r.object) for r in parsed.collect()}
    assert rows == {
        ("Q163821", "instance_of", "Q482994"),
        ("Q163821", "label", "The Dark Side of the Moon"),
        ("The_Wall", "about", "Q146494"),
    }


def test_entity_assembly(universe):
    ent = {r["subject"]: r.asDict() for r in universe["entities"].collect()}
    assert ent["Q100"]["is_a_list_of"] == ["Q482994"]
    assert ent["Q100"]["label"] == "list of Pink Floyd albums"
    assert ent["Q999"]["subclass_of"] == ["Q482994", "Q998"]  # multi-valued, sorted
    assert ent["Q777"]["same_as"] == "Q999"


def test_extract_and_validate(validated):
    v = {r["item"]: r.asDict() for r in validated.collect()}
    assert set(v) == {"Q123", "Q100"}
    cat, lst = v["Q123"], v["Q100"]
    # category: members 11,12,13 valid; band invalid; Category: member
    # and unmappable page dropped before counting valid
    # members arrive in byte-sort order (W1 — the LC_ALL=C sort the
    # shuffle replaces)
    cat_titles = [m["title"] for m in cat["members"]]
    assert cat_titles == ["Animals_(album)", "The_Dark_Side_of_the_Moon", "The_Wall"]
    assert cat["valid_members_count"] == 3
    assert cat["invalid_members_count"] == 1  # the band (Q2306)
    # list: includes the same_as-redirect-typed member via wikimapper fallback
    lst_titles = {m["title"] for m in lst["members"]}
    assert lst_titles == {"The_Dark_Side_of_the_Moon", "The_Wall", "Obscured_by_Clouds"}
    assert lst["type"] == ["Q482994"]


def test_same_as_member_fallback(spark):
    """A member whose OWN entity has no instance_of/subclass_of (empty
    list, not NULL — assemble_entities never yields NULL arrays) but
    carries a same_as redirect must validate via the canonical
    entity's types (ParentFinder fallback,
    create_collections.py:566-575)."""
    triples = spark.createDataFrame(
        [
            ("Q1", "category_contains", "Q100"),
            ("Q5", "same_as", "Q6"),  # alias member: no types of its own
            ("Q5", "label", "Echoes"),
            ("Q6", "instance_of", "Q100"),  # canonical carries the type
            ("Echoes_(song)", "about", "Q5"),
        ],
        ["subject", "predicate", "object"],
    )
    entities = assemble_entities(triples)
    grouped = spark.createDataFrame(
        [("Q1", ["Q100"], "Category:Things", "category", ["Echoes_(song)"])],
        "item string, type array<string>, article string, kind string, members array<string>",
    )
    wikimapper = spark.createDataFrame(
        [],
        "wikipedia_title string, wikipedia_id bigint, wikidata_id string,"
        " redirect boolean, primary_mapping boolean",
    )
    reachable = subclass_reachability(entities)
    out = validate_members(grouped, entities, wikimapper, reachable).collect()
    assert len(out) == 1
    assert out[0]["valid_members_count"] == 1
    assert out[0]["members"][0]["qid"] == "Q5"


@pytest.fixture(scope="module")
def merged(spark, universe, validated):
    all_info = enrich_all_info(
        validated,
        universe["entities"],
        universe["wikimapper"],
        universe["qrank"],
        universe["domains"],
        universe["scores"],
    ).cache()
    return all_info, merge_lists_and_categories(all_info, universe["entities"]).cache()


def test_enrichment(merged):
    all_info, _ = merged
    rows = {r["item"]: r.asDict() for r in all_info.collect()}
    cat = rows["Q123"]
    assert cat["name"] == "Pink Floyd albums"  # C3: Category: stripped
    assert cat["rank"] == 55  # J9
    assert cat["description"] is None  # J6: 'Wikimedia category' dropped
    # members ordered by W2 key desc: thewall(rank 900) first
    curated = [m["curated"] for m in cat["members"]]
    assert curated[0] == "thewall"
    wall = next(m for m in cat["members"] if m["curated"] == "thewall")
    assert wall["status"] == "taken" and wall["rank"] == 900 and wall["interesting_score"] == 0.8
    lst = rows["Q100"]
    assert lst["name"] == "Pink Floyd albums"  # 'List of ' stripped
    assert "Pink Floyd discography" in lst["keywords"]  # J7 redirect keyword


def test_merge(merged):
    _, out = merged
    rows = out.collect()
    assert len(rows) == 1  # category merged into the list
    r = rows[0].asDict()
    assert r["is_merged"] is True
    assert r["item"] == "Q100"  # min numeric qid wins
    assert r["kind"] == "list"
    assert r["valid_members_count"] == 6  # 3 + 3
    curated = [m["curated"] for m in r["members"]]
    # union of both member sets, rank-desc, deduped (A9/A4/W3)
    assert curated == ["thewall", "thedarksideofthemoon", "animals", "obscuredbyclouds"]
    assert r["rank"] == 77  # max of 77, 55


def _mini_collection(item, name, rank=0, members=(), is_merged=False):
    """Collection-row dict in the post-merge schema (letter/dup tests)."""
    return {
        "item": item,
        "types": [{"qid": "Q1", "label": "thing"}],
        "article": name.replace(" ", "_"),
        "kind": "list",
        "name": name,
        "members": [
            {"curated": c, "tokenized": [c], "interesting_score": 0.5, "rank": r, "status": None}
            for c, r in members
        ],
        "valid_members_count": len(members),
        "invalid_members_count": 0,
        "keywords": [],
        "description": None,
        "images": [],
        "page_banners": [],
        "rank": rank,
        "is_merged": is_merged,
    }


_MINI_SCHEMA = (
    "item string, types array<struct<qid:string,label:string>>, article string,"
    " kind string, name string,"
    " members array<struct<curated:string,tokenized:array<string>,"
    "interesting_score:double,rank:bigint,status:string>>,"
    " valid_members_count bigint, invalid_members_count bigint,"
    " keywords array<string>, description string, images array<string>,"
    " page_banners array<string>, rank bigint, is_merged boolean"
)


def test_letter_range_normalize(spark):
    from namegraph_collections_spark.plans.letter_merge import letter_range_normalize

    coll = spark.createDataFrame(
        [
            # m1 pair → merge under 'Novels' (min qid Q10 wins, rank max)
            _mini_collection("Q10", "Novels: A–C", rank=5, members=[("dune", 9)]),
            _mini_collection("Q11", "Novels: D", rank=9, members=[("dune", 3), ("emma", 7)]),
            # m2 singleton → renamed
            _mini_collection("Q20", "Mountains (list)", rank=1),
            # m1 singleton, stripped ', B' is an alphabet range → renamed
            _mini_collection("Q30", "Towers, B", rank=2),
            # m1 singleton, stripped ': 1999 to 2001' not a letter range → kept
            _mini_collection("Q40", "Award: 1999 to 2001", rank=3),
            # m3a singleton → renamed
            _mini_collection("Q50", "Complete lists of Kings", rank=4),
            # no match → untouched
            _mini_collection("Q60", "Pink Floyd albums", rank=6),
        ],
        _MINI_SCHEMA,
    )
    out = {r["name"]: r.asDict(recursive=True) for r in letter_range_normalize(coll).collect()}
    assert set(out) == {
        "Novels", "Mountains", "Towers", "Award: 1999 to 2001", "Kings", "Pink Floyd albums",
    }
    merged = out["Novels"]
    assert merged["item"] == "Q10" and merged["rank"] == 9 and merged["is_merged"] is True
    # members: rank desc, dedup keep-first per curated (dune rank 9 kept)
    assert [(m["curated"], m["rank"]) for m in merged["members"]] == [("dune", 9), ("emma", 7)]
    assert merged["valid_members_count"] == 3  # summed
    assert out["Towers"]["is_merged"] is False


def test_remove_duplicate_names(spark):
    from namegraph_collections_spark.plans.letter_merge import remove_duplicate_names

    coll = spark.createDataFrame(
        [
            _mini_collection("Q7", "Rivers", rank=1, members=[("nile", 5)]),
            _mini_collection("Q3", "Rivers", rank=8, members=[("amazon", 6)]),
            _mini_collection("Q9", "Lakes", rank=2, members=[("garda", 1)]),
        ],
        _MINI_SCHEMA,
    )
    out = {r["item"]: r.asDict(recursive=True) for r in remove_duplicate_names(coll).collect()}
    assert set(out) == {"Q3", "Q9"}
    r = out["Q3"]  # min numeric qid of the 'Rivers' pair
    assert r["rank"] == 8 and r["is_merged"] is True
    assert [m["curated"] for m in r["members"]] == ["amazon", "nile"]
    assert out["Q9"]["is_merged"] is False  # singleton untouched


def test_full_pipeline_single_plan(spark, universe):
    """The whole reference pipeline as one lazy plan (SURVEY §3.1)."""
    from namegraph_collections_spark.plans import run_wikipedia_pipeline

    docs = run_wikipedia_pipeline(
        universe["entities"],
        universe["wikimapper"],
        universe["categorylinks"],
        universe["pagelinks"],
        universe["qrank"],
        universe["domains"],
        universe["scores"],
        current_time_ms=7.0,
    )
    rows = {r["metadata"]["id"]: r.asDict(recursive=True) for r in docs.collect()}
    assert set(rows) == {"Q100"}
    d = rows["Q100"]
    assert d["data"]["collection_name"] == "Pink Floyd albums"
    assert d["metadata"]["members_count"] == 4
    assert d["template"]["is_merged"] is True


def test_doc_factory(spark, merged):
    _, out = merged
    docs = build_documents(
        out,
        avatar_emojis={"album": ["🎵", "🎸"]},
        avatar_counts={"album": 3},
        other_emojis=["❓"],
        unigram_probs=spark.createDataFrame(
            [("pink", -1.0), ("floyd", -2.0), ("albums", -0.5)], ["token", "log_prob"]
        ),
        current_time_ms=1234.0,
    )
    d = docs.collect()[0].asDict(recursive=True)
    assert d["data"]["collection_name"] == "Pink Floyd albums"
    assert d["metadata"]["id"] == "Q100"
    assert d["metadata"]["members_count"] == 4
    assert d["metadata"]["collection_name_log_probability"] == -3.5
    t = d["template"]
    assert t["collection_rank"] == 77
    # W2 re-sort at doc time (create_merged.py:884-886): key =
    # log2(rank+1)/max(len,10) → thewall .98, animals .82,
    # thedarksideofthemoon .45, obscuredbyclouds 0
    assert [n["normalized_name"] for n in t["top10_names"]] == [
        "thewall", "animals", "thedarksideofthemoon", "obscuredbyclouds",
    ]
    assert t["taken_count"] == 1 and t["available_count"] == 1 and t["never_registered_count"] == 2
    assert t["nonavailable_members_count"] == 1
    assert t["is_merged"] is True
    # C7: namehash is deterministic and well-formed
    nh = t["names"][0]["namehash"]
    assert nh.startswith("0x") and len(nh) == 66
    # C10: banner reproduces the reference's seeded randint
    assert d["data"]["banner_image"] == seeded_banner("Q100")
    # C11: emoji comes from the matching type's list
    assert d["data"]["avatar_emoji"] in ["🎵", "🎸"]
