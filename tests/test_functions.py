"""UDF-layer unit tests — the reference's golden assertions ported
(SURVEY §5: tests/test_wiki_api.py:135-148, collections-preprocessing/
app/src/test_main.py:42-55) plus published Keccak/EIP-137 vectors for
the from-spec crypto."""

from __future__ import annotations

import hashlib
import json
import random

import pytest

from namegraph_collections_spark.functions.curation import curate_member
from namegraph_collections_spark.functions.hashing import canonical_document_hash
from namegraph_collections_spark.functions.namehash import ens_namehash, keccak256
from namegraph_collections_spark.functions.normalize import (
    DisallowedLabel,
    force_normalize,
    try_force_normalize,
)
from namegraph_collections_spark.functions.seeded import seeded_banner
from namegraph_collections_spark.functions.tokenize import emoji_split, tokenize_name
from namegraph_collections_spark.sources.sqldump import split_insert_tuples


# --- Keccak-256: published test vectors ------------------------------------
def test_keccak256_vectors():
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # exercise multi-block absorption (len > 136-byte rate)
    assert keccak256(b"x" * 200) == keccak256(b"x" * 200)
    assert len(keccak256(b"x" * 200)) == 32


# --- EIP-137 namehash: published vectors (C7 ★) ----------------------------
def test_ens_namehash_vectors():
    assert ens_namehash("") == "0x" + "00" * 32
    assert ens_namehash("eth") == (
        "0x93cdeb708b7545dc668eb9280176169d1c33cfd8ed6f04690a0bcc88a93fc4ae"
    )
    assert ens_namehash("foo.eth") == (
        "0xde9b09fd7c5f901e23a3f19fecc54828e9c848539801e86591bd9801b019f84f"
    )


# --- force_normalize (C4 ★) -------------------------------------------------
def test_force_normalize_goldens():
    assert force_normalize("Betty Williams") == "bettywilliams"
    # round 12: the stand-in now carries the reference recipe's
    # Latin-script ASCII fold (create_merged.py:174-175), so accented
    # Latin names fold exactly as unidecode folds them — the
    # reference's own test_wiki_api golden ('adolfopérezesquivel')
    # predates that block of its code and no longer matches it
    assert force_normalize("Adolfo Pérez Esquivel") == "adolfoperezesquivel"
    with pytest.raises(DisallowedLabel):
        force_normalize("ιοσρβυνγ")  # non-Latin (test_wiki_api.py:147)
    with pytest.raises(DisallowedLabel):
        force_normalize("---")  # empty after stripping
    assert try_force_normalize("ιοσρβυνγ") is None
    assert force_normalize("O'Brien-Smith") == "obriensmith"
    # the vendored Latin-1/Extended-A fold: decomposable accents strip,
    # non-decomposable letters map through the embedded table — all
    # byte-for-byte what unidecode emits for this range
    assert force_normalize("Łukasz Gbur") == "lukaszgbur"
    assert force_normalize("Søren Ñandú") == "sorennandu"
    assert force_normalize("Þórður Æðal") == "thorduraedal"
    assert force_normalize("Müller-Œuvre") == "mulleroeuvre"
    # Greek stays unfolded (the reference folds ONLY Latin script)
    with pytest.raises(DisallowedLabel):
        force_normalize("café ιοσ")


# --- curate_member (C5 ★; goldens test_wiki_api.py:143-148) -----------------
def test_curate_member_goldens():
    assert curate_member("Betty Williams (peace activist)") == (
        "bettywilliams",
        ["betty", "williams"],
    )
    # underscore form stays one token (test_wiki_api.py:146-148)
    assert curate_member("Adolfo_Pérez_Esquivel") == (
        "adolfoperezesquivel",
        ["adolfoperezesquivel"],
    )
    assert curate_member("ιοσρβυνγ") is None
    assert curate_member("ab") is None  # F11 min length 3
    # a token failing alone (empty after strip) drops from tokenized
    # only; the whole string still curates
    curated, tokenized = curate_member("Betty - Williams")
    assert curated == "bettywilliams" and tokenized == ["betty", "williams"]


# --- tokenize_name (C14 ★; goldens test_main.py:42-55) ----------------------
def test_tokenize_name_goldens():
    assert tokenize_name("captainamerica") == ["captain", "america"]
    assert tokenize_name("presidentofamerica") == ["president", "of", "america"]
    assert tokenize_name("🔥fire") == ["🔥", "fire"]
    # unknown chunk passes through unsplit
    assert tokenize_name("zzqqy") == ["zzqqy"]


def test_emoji_split():
    assert emoji_split("ab🔥🔥cd") == [("ab", False), ("🔥🔥", True), ("cd", False)]
    assert emoji_split("🔥") == [("🔥", True)]
    assert emoji_split("abc") == [("abc", False)]


# --- seeded banner (C10 ★) — bit-parity with random.seed --------------------
def test_seeded_banner_parity():
    rnd = random.Random()
    rnd.seed("Q100")
    assert seeded_banner("Q100") == f"tc-{rnd.randint(0, 19):02d}.png"
    assert seeded_banner("Q100") == seeded_banner("Q100")  # stable


# --- canonical JSON hash (C8 ★) ---------------------------------------------
def test_canonical_document_hash():
    fields = [json.dumps({"b": 1, "a": [2, 3]}), None, json.dumps("x")]
    h = hashlib.sha256()
    h.update(json.dumps({"b": 1, "a": [2, 3]}, sort_keys=True).encode())
    h.update(json.dumps(None, sort_keys=True).encode())
    h.update(json.dumps("x", sort_keys=True).encode())
    assert canonical_document_hash(fields) == h.hexdigest()
    # key order in the input JSON must not matter
    assert canonical_document_hash([json.dumps({"a": [2, 3], "b": 1}), None, json.dumps("x")]) == (
        h.hexdigest()
    )


# --- SQL-dump tuple splitter (S4) -------------------------------------------
def test_split_insert_tuples():
    line = (
        "INSERT INTO `categorylinks` VALUES "
        "(11,'Pink_Floyd_albums','x'),(12,'O\\'Brien, (b)','y');"
    )
    tups = list(split_insert_tuples(line))
    assert tups == [
        ["11", "Pink_Floyd_albums", "x"],
        ["12", "O'Brien, (b)", "y"],
    ]
    assert list(split_insert_tuples("CREATE TABLE foo;")) == []


def test_read_sqldump_columns(spark, tmp_path):
    from namegraph_collections_spark.sources.sqldump import read_sqldump_columns

    p = tmp_path / "dump.sql"
    p.write_text(
        "-- comment\n"
        "INSERT INTO `t` VALUES (1,'a','x'),(2,'b','y');\n"
        "INSERT INTO `t` VALUES (3,'c','z');\n"
    )
    df = read_sqldump_columns(spark, str(p), [0, 1], ["id", "title"])
    rows = sorted((r["id"], r["title"]) for r in df.collect())
    assert rows == [("1", "a"), ("2", "b"), ("3", "c")]


# --- Porter stemmer (§2.9 analyzer) -----------------------------------------
def test_porter_stem_goldens():
    from namegraph_collections_spark.functions.stemmer import porter_stem

    # end-to-end outputs (Porter 1980 examples run through ALL steps)
    cases = {
        "caresses": "caress", "ponies": "poni", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "sized": "size", "hopping": "hop", "falling": "fall",
        "filing": "file", "happy": "happi", "sky": "sky",
        "relational": "relat", "digitizer": "digit", "operator": "oper",
        "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electrical": "electr", "hopeful": "hope", "goodness": "good",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
        "dependent": "depend", "adoption": "adopt", "communism": "commun",
        "activate": "activ", "effective": "effect", "probate": "probat",
        "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
    }
    got = {w: porter_stem(w) for w in cases}
    assert got == cases


def test_ens_namehash_empty_labels_hash_not_raise():
    # reference behavior: empty labels hash keccak(b'') instead of erroring
    assert ens_namehash("a..b").startswith("0x")
    assert ens_namehash("trailing.") != ens_namehash("trailing")


def test_curate_name_goldens(spark):
    """Reference goldens (tests/test_wiki_api.py:135-141): strip the
    Category:/List_of prefixes, underscores to spaces, first char
    uppercased."""
    from namegraph_collections_spark.functions.curation import curate_name_col
    from pyspark.sql import functions as F

    cases = [
        ("Adolfo_Pérez_Esquivel", "Adolfo Pérez Esquivel"),
        ("Category:Nobel_Peace_Prize_laureates", "Nobel Peace Prize laureates"),
        ("List_of_sovereign_states", "Sovereign states"),
    ]
    df = spark.createDataFrame([(a,) for a, _ in cases], "article string")
    got = {r["article"]: r["name"] for r in df.select(
        "article", curate_name_col(F.col("article")).alias("name")).collect()}
    for a, want in cases:
        assert got[a] == want, (a, got[a], want)
