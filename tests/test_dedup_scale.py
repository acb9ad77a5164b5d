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

    cands = REGISTRY["simhash_neardup_candidates"].fn(spark, sf_dir).cache()
    try:
        # identical-fingerprint pairs must surface with hamming 0 (the
        # output carries both docs' fingerprint halves, so this checks
        # the fingerprint computation and the banding in one pass)
        ident = cands.filter(
            (F.col("a_hi") == F.col("b_hi")) & (F.col("a_lo") == F.col("b_lo"))
        )
        assert ident.count() == ident.filter(F.col("hamming") == 0).count()
        # banding is a candidate filter, not all-pairs: the pair set
        # stays far below quadratic in corpus size
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        assert cands.count() < n_docs * (n_docs - 1) / 4
    finally:
        cands.unpersist()


def test_hot_type_cap_bounds_related_collections(spark, monkeypatch, tmp_path):
    """A mega-type shared by every collection must be dropped by the
    df-cap before the type self-join — otherwise related-collections
    goes N² on one hot key (the 'human'-type scenario)."""
    import namegraph_collections_spark.queries.collections_ops as co

    n = 60
    rows = [
        # every part shares brand MEGA and size 1 → one hot composite
        # type of df=n; p_type gives each a small distinct type shared
        # with exactly one neighbour
        (i, f"t{i // 2}", 1, "MEGA") for i in range(n)
    ]
    spark.createDataFrame(
        rows, "p_partkey long, p_type string, p_size int, p_brand string"
    ).write.parquet(str(tmp_path / "part.parquet"))
    monkeypatch.setattr(co, "HOT_TYPE_DF_CAP", 10)
    out = co.related_collections_precompute(spark, str(tmp_path)).collect()
    # hot type contributes nothing: only the n/2 neighbour pairs remain
    # (each produces two directed rows), far below quadratic
    assert len(out) == n
    assert all(r["n_shared"] == 1 for r in out)
    assert all(r["primary_type"].startswith("t") for r in out)


def test_simhash_bucket_cap_bounds_degenerate_bands(spark, monkeypatch):
    """A corpus of near-empty docs collapses every fingerprint to the
    same few band values; the per-(band, band_val) cap must keep the
    band self-join sub-quadratic instead of letting one degenerate
    bucket go N²."""
    import namegraph_collections_spark.queries.dedup as dd

    n = 80
    # one shared token → every doc has the identical fingerprint, the
    # worst case for banding (all 4 bands collide for all docs)
    docs = spark.createDataFrame(
        [(i, "sametoken") for i in range(n)], "doc_id long, text string"
    )
    monkeypatch.setattr(dd, "SIMHASH_BUCKET_CAP", 10)

    fp_bits = dd._simhash_bit_sums(docs)
    # run the registered plan on a temp view-backed dir is overkill;
    # exercise the capped join shape directly through the query fn by
    # pointing it at a parquet dir
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.withColumn("lang", F.lit("en")).withColumn(
            "source", F.lit("s")
        ).withColumn("n_chars", F.length("text")).write.parquet(f"{d}/documents.parquet")
        pairs = dd.simhash_neardup_candidates(spark, d)
        # cap=10 → at most C(10,2)=45 pairs per (band, band_val) bucket;
        # 4 bands of the same 10 capped docs dedup to ≤45 total, far
        # below the uncapped C(80,2)=3160
        assert pairs.count() <= 45
    assert fp_bits.count() == n


def test_long_chain_component_rounds_stay_logarithmic(spark):
    """A path graph of diameter 400 (mirror-of-a-mirror chains) must
    close in O(log² n) star rounds, not O(diameter): this is the
    property that justifies large-star/small-star over plain min-label
    propagation at 100 TB. Bound used: ceil(log2(n))² / 2 + 4 — loose
    enough to be stable, far below the 400 rounds propagation needs."""
    import math

    from namegraph_collections_spark.operators.components import connected_components

    n = 400
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], "src long, dst long")
    stats: dict = {}
    comp = connected_components(edges, max_iterations=50, stats=stats)
    rows = comp.collect()
    assert len(rows) == n + 1
    assert {r["component"] for r in rows} == {0}
    bound = math.ceil(math.log2(n + 1)) ** 2 // 2 + 4
    assert stats["rounds"] <= bound, f"{stats['rounds']} rounds > bound {bound}"


def test_transitive_closure_depth_cap_is_graceful(spark):
    """On a chain deeper than max_iterations the closure returns the
    partial result (all pairs within reach) without error — the
    behavior a 100 TB run needs when a pathological hierarchy exceeds
    the provisioned depth."""
    from namegraph_collections_spark.operators.closure import transitive_closure

    n = 12
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], "src long, dst long")
    capped = transitive_closure(edges, max_iterations=3)
    got = {(r["src"], r["dst"]) for r in capped.collect()}
    # semi-naive: after k iterations all pairs of distance <= k+1 exist
    want = {(i, j) for i in range(n + 1) for j in range(i + 1, min(i + 5, n + 1))}
    assert got == want
    # uncapped closes the chain fully
    full = transitive_closure(edges, max_iterations=n)
    assert full.count() == (n + 1) * n // 2
