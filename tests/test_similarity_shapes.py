"""Round-13 similarity/PQ shape equivalences.

The Lloyd-round assignments were rewritten from crossJoin +
row_number-window rn=1 to a map-only broadcast packed-array
argmax/argmin (queries/similarity.py::kmeans_assign_to,
queries/similarity_pq.py assign_to). These tests pin row-equality of
the new shapes against the legacy window shapes, including the
tie-break direction (max-dot → MIN cluster id; min-L2 → MIN code id),
and the bench's per-query medians contract.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from namegraph_collections_spark.queries.registry import spread, tbl
from namegraph_collections_spark.queries.similarity import (
    KMEANS_K,
    KMEANS_ROUNDS,
    _dot,
    kmeans_assign_to,
    kmeans_centroids_of,
)
from namegraph_collections_spark.functions.det_round import round6_det


def _legacy_assign_to(emb, cents):
    """The r12 crossJoin + rn=1 window assignment, verbatim."""
    scored_rows = (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "embedding", "cluster",
            round6_det(_dot(F.col("embedding"), F.col("centroid"))).alias("d"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("d").desc(), F.col("cluster").asc())
    return (
        scored_rows.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cluster")
    )


def test_argmax_assign_matches_legacy_window_assign(spark, sf_dir):
    """Every Lloyd round's map-only argmax assignment equals the
    legacy window assignment row-for-row — same clusters, same
    tie-breaks — through a full KMEANS_ROUNDS chain."""
    emb = spread(tbl(spark, sf_dir, "embeddings"), "vec_id")
    assigned_new = emb.select(
        "vec_id", "embedding", (F.col("vec_id") % KMEANS_K).cast("int").alias("cluster")
    )
    assigned_old = assigned_new
    for _ in range(KMEANS_ROUNDS):
        cents_new = kmeans_centroids_of(assigned_new).localCheckpoint(eager=True)
        cents_old = kmeans_centroids_of(assigned_old).localCheckpoint(eager=True)
        assigned_new = kmeans_assign_to(emb, cents_new)
        assigned_old = _legacy_assign_to(emb, cents_old)
        new_rows = sorted(
            (r.vec_id, r.cluster) for r in assigned_new.select("vec_id", "cluster").collect()
        )
        old_rows = sorted(
            (r.vec_id, r.cluster) for r in assigned_old.select("vec_id", "cluster").collect()
        )
        assert new_rows == old_rows


def test_argmax_tiebreak_prefers_smaller_cluster(spark):
    """Two identical centroids: the argmax must pick the SMALLER
    cluster id (the window's d DESC, cluster ASC contract)."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [(7, [1.0, 0.0]), (3, [1.0, 0.0]), (5, [0.0, 1.0])],
        "cluster int, centroid array<double>",
    )
    out = kmeans_assign_to(emb, cents).collect()
    assert len(out) == 1 and out[0].cluster == 3


def test_bench_emits_tail_safe_per_query_median_lines(spark, sf_dir, monkeypatch, capsys):
    """bench.py must emit short medians-only JSON lines (each complete
    JSON, ≤ the driver's ~2000-byte stdout tail) between the long audit
    line and the byte-compatible final summary line, sorted so the most
    expensive queries are nearest the tail."""
    import bench

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", sf_dir)
    monkeypatch.setenv("SPARK_GRAFT_ONLY", "pricing_summary,regional_revenue,bm25_search")
    monkeypatch.setattr(bench, "RUNS_PER_QUERY", 1)
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    final = json.loads(lines[-1])
    assert final["metric"] == "headline_queries_total_wall"
    assert set(final) == {"metric", "value", "unit", "sf", "n_queries", "n_failed"}
    med_lines = [json.loads(l) for l in lines[1:-1]]
    assert med_lines, "no medians lines emitted"
    seen = {}
    prev_max = None
    for m in med_lines:
        assert m["metric"] == "headline_query_medians"
        assert len(json.dumps(m, separators=(",", ":"))) < 1900
        vals = list(m["queries"].values())
        if prev_max is not None:
            assert min(vals) >= prev_max  # cheapest-first chunking
        prev_max = max(vals)
        seen.update(m["queries"])
    audit = json.loads(lines[0])
    assert seen == {k: v for k, v in audit["queries"].items() if v is not None}
