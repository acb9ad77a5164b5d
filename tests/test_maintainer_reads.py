"""Contract tests for the maintainer read-path battery's state
fixture (queries/maintainer_reads.py): the in-plan 3-batch fold must
equal BOTH the one-shot ``*_state_for`` over the full input (the
monoid identity the DuckDB oracles rely on) AND the filesystem
maintainer's merged snapshot over the same batches (so the battery's
fixture is the maintainers' actual merge semantics, not a lookalike).
Value-exactness of the read paths is the oracle sweep's job."""

from __future__ import annotations

from pyspark.sql import functions as F

from namegraph_collections_spark.operators.additive_state import (
    latest_snapshot,
)
from namegraph_collections_spark.operators.ivf_maintain import (
    ivf_state_for,
    maintain_ivf_state,
)
from namegraph_collections_spark.operators.vocab_maintain import (
    vocab_head_from_state,
    vocab_state_for,
)
from namegraph_collections_spark.queries.maintainer_reads import (
    FOLD_BATCHES,
    folded_state,
)
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_folded_state_equals_one_shot_and_filesystem_merge(spark, tmp_path):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    fold = folded_state(
        emb, "vec_id", ivf_state_for, ["cluster", "dim"],
        {"s": "sum", "n": "sum"},
    )
    # monoid identity: fold-of-3 == one-shot over the union
    assert _rows(fold) == _rows(ivf_state_for(emb))
    # and == the filesystem maintainer folding the same batches
    base = str(tmp_path / "ivf_state")
    for i in range(FOLD_BATCHES):
        maintain_ivf_state(
            spark, base,
            emb.filter(F.col("vec_id") % FOLD_BATCHES == i), f"t{i}",
        )
    assert _rows(fold) == _rows(latest_snapshot(spark, base))


def test_single_pass_fold_matches_legacy_filter_fold(spark):
    """The optimization-round-12 single-pass fixture (one tagged scan,
    ``extra``-grouped state programs) must produce EXACTLY the legacy
    3-filter fold's per-batch contribution rows — not merely the same
    merged state: per tag t, ``contrib(tagged, extra)`` restricted to
    t equals ``contrib(src.filter(key % B == t))``."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from namegraph_collections_spark.operators.cms_maintain import (
        cms_state_for,
    )

    for src, key, contrib in [
        (emb, "vec_id", ivf_state_for),
        (docs, "doc_id", vocab_state_for),
        (docs, "doc_id", cms_state_for),
    ]:
        tagged = src.withColumn(
            "_fold_b", (F.col(key) % FOLD_BATCHES).cast("int")
        )
        one_pass = contrib(tagged, extra="_fold_b")
        for i in range(FOLD_BATCHES):
            legacy_i = contrib(src.filter(F.col(key) % FOLD_BATCHES == i))
            got = _rows(one_pass.filter(F.col("_fold_b") == i).drop("_fold_b"))
            assert got == _rows(legacy_i), (contrib.__name__, i)


def test_vocab_fold_respects_the_min_monoid(spark):
    """first_doc merges by MIN — a sum-style merge would double-count;
    pin the fold's per-column monoid dispatch and the head read."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fold = folded_state(
        docs, "doc_id", vocab_state_for, ["tok"],
        {"first_doc": "min", "occ": "sum"},
    )
    assert _rows(fold) == _rows(vocab_state_for(docs))
    head = vocab_head_from_state(fold, 10).collect()
    assert len(head) == 10
    by_rnk = sorted(head, key=lambda r: r.rnk)
    for a, b in zip(by_rnk, by_rnk[1:]):
        assert (a.occ, b.tok) >= (b.occ, a.tok) or a.occ > b.occ
        assert a.occ >= b.occ
    want = {r.tok: r.first_doc for r in fold.collect()}
    for r in head:
        assert r.first_doc == want[r.tok]
