"""Property tests for the round-7 operators.

Winnowing (queries/dedup.py::winnowing_fingerprints): the paper's
coverage guarantee — any shared word run of length >= W + K - 1
contains at least one full shared hash window, and identical hash
windows select the same MINIMUM HASH VALUE (the packed key is
hash-major, so the position tiebreak can't change which hash wins) —
therefore the two documents must share a fingerprint hash. Plus the
self-consistency invariant: every selected (doc, fp, fp_pos) must
equal the hash of the k-gram actually at fp_pos.

BPE encode (queries/bpe.py::bpe_encode_tokens): conservation — the
encoded vocabulary's character mass equals the corpus dictionary's
character mass exactly (merges rearrange symbol boundaries, never
characters) — and closure: every multi-character token must be the
`merged` output of some learned merge round.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from namegraph_collections_spark.queries.dedup import (
    WINNOW_K,
    WINNOW_W,
    _winnow,
)

GUARANTEE_LEN = WINNOW_W + WINNOW_K - 1  # any shared run this long must match


def _fp_sets(spark, docs_rows):
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    out = _winnow(docs).collect()
    by_doc: dict[int, set[int]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    return by_doc


def test_shared_run_guarantees_shared_fingerprint(spark):
    # a 12-word shared run (> W + K - 1 = 6) at DIFFERENT offsets in
    # otherwise-disjoint documents
    shared = "one two three four five six seven eight nine ten eleven twelve"
    a = f"alpha bravo charlie {shared} delta echo"
    b = f"{shared} foxtrot golf hotel india juliet kilo lima mike november"
    fps = _fp_sets(spark, [(1, a), (2, b)])
    assert fps[1] & fps[2], "shared run produced no shared fingerprint"


def test_disjoint_docs_share_no_fingerprint(spark):
    a = " ".join(f"left{i}" for i in range(40))
    b = " ".join(f"right{i}" for i in range(40))
    fps = _fp_sets(spark, [(1, a), (2, b)])
    assert not (fps[1] & fps[2])


def test_short_doc_keeps_whole_doc_minimum(spark):
    # fewer k-grams than one window -> exactly the whole-doc minimum
    fps = _fp_sets(spark, [(1, "just four little words")])  # 2 trigrams < W
    assert len(fps[1]) == 1


def test_selected_fingerprint_matches_gram_at_its_position(spark, sf_dir):
    """Every (doc_id, fp, fp_pos) row must satisfy: fp == the 32-bit
    md5-prefix hash of the k-gram at position fp_pos of that document
    — the decode of the packed key is exact, not approximate."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sel = _winnow(docs.select("doc_id", "text"))
    toked = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("toks")
    )
    toks = F.col("toks")
    grams = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - (WINNOW_K - 1), F.lit(0))),
        lambda t, i: F.concat_ws(
            " ", t, F.element_at(toks, i + 2), F.element_at(toks, i + 3)
        ),
    )
    ref = toked.select("doc_id", F.posexplode(grams).alias("pos0", "gram")).select(
        "doc_id",
        (F.col("pos0") + 1).alias("fp_pos"),
        F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long").alias("h"),
    )
    joined = sel.join(ref, ["doc_id", "fp_pos"], "left")
    assert joined.filter(F.col("h").isNull() | (F.col("h") != F.col("fp"))).count() == 0


def test_bpe_encode_conserves_character_mass_and_token_closure(spark, sf_dir):
    from namegraph_collections_spark.queries import REGISTRY

    enc = REGISTRY["bpe_encode_tokens"].fn(spark, sf_dir).cache()
    try:
        # conservation: sum(total_count * token_len) == corpus character
        # mass of the [a-z0-9]+ word dictionary the loop trains on
        enc_mass = enc.select(
            F.sum(F.col("total_count") * F.col("token_len")).alias("m")
        ).collect()[0]["m"]
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        word_mass = (
            docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
            .filter(F.col("w").rlike("^[a-z0-9]+$"))
            .select(F.sum(F.length("w")).alias("m"))
            .collect()[0]["m"]
        )
        assert enc_mass == word_mass
        # closure: every multi-char token is a learned merge's output
        merges = {
            r["merged"]
            for r in REGISTRY["bpe_merge_table"].fn(spark, sf_dir).collect()
        }
        multi = [
            r["token"]
            for r in enc.filter(F.col("token_len") > 1).collect()
        ]
        assert multi, "expected at least one merged token after 8 rounds"
        assert set(multi) <= merges
    finally:
        enc.unpersist()
