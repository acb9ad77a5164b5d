"""Scale-hardening tests for the near-dup family: the hot-shingle cap
must keep candidate generation sub-quadratic on a skewed corpus, and
the banded SimHash must find near pairs without doc×doc work."""

from __future__ import annotations

from pyspark.sql import functions as F

from namegraph_collections_spark.queries.dedup import (
    HOT_SHINGLE_DF_CAP,
    _jaccard_pairs,
    _shingles,
)

N_DOCS = 120  # > HOT_SHINGLE_DF_CAP so the stop phrase trips the cap


def _skewed_docs(spark):
    """Every doc shares one long stop-phrase prefix (a hot shingle per
    trigram window); tails are unique except docs 0/1, which are true
    near-duplicates of each other."""
    stop = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    for i in range(N_DOCS):
        if i == 1:
            tail = "alpha0 beta0 gamma0 delta0 epsilon0 zeta0 eta0 CHANGED"
        else:
            tail = f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i} eta{i} theta{i}"
        rows.append((i, f"{stop} {tail}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_shingle_cap_keeps_candidates_subquadratic(spark):
    docs = _skewed_docs(spark)
    # the stop-phrase trigrams really are hot (df = N_DOCS > cap)
    df_counts = (
        _shingles(docs).groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    )
    assert df_counts.filter(F.col("df") > HOT_SHINGLE_DF_CAP).count() > 0

    pairs = _jaccard_pairs(docs, threshold=0.1).collect()
    # without the cap every doc pair shares the stop shingles:
    # ≥ N·(N−1)/2 = 7140 candidate pairs. With it, only genuinely
    # similar tails meet — orders of magnitude below quadratic.
    quadratic = N_DOCS * (N_DOCS - 1) // 2
    assert len(pairs) < quadratic / 100
    # ...and the one true near-dup pair survives the cap
    assert any(p["doc_a"] == 0 and p["doc_b"] == 1 for p in pairs)


def test_simhash_banding_finds_identical_docs(spark, sf_dir):
    from namegraph_collections_spark.queries import REGISTRY

    fp = REGISTRY["simhash_fingerprints"].fn(spark, sf_dir)
    dup_groups = fp.filter(F.col("n_docs") > 1).count()
    cands = REGISTRY["simhash_hamming_candidates"].fn(spark, sf_dir)
    # every multi-doc fingerprint group implies ≥1 hamming-0 pair the
    # banded join must surface
    zero = cands.filter(F.col("hamming") == 0).count()
    assert (dup_groups == 0) or (zero > 0)
    # banding is a candidate filter, not all-pairs: the pair set stays
    # far below quadratic in corpus size
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert cands.count() < n_docs * (n_docs - 1) / 4
