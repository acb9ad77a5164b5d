#!/usr/bin/env python3
"""Paired interleaved A/B: legacy kmeans/PQ shapes (explode + two-step
centroid aggregation; crossJoin + rn=1 window assignment) vs the round-13
map-only shapes (single-aggregation centroids; broadcast packed-array
argmax assignment).

Mode A = legacy (function copies below, byte-equivalent to the r12
code). Mode B = the committed round-13 module code. One process,
clearCache() before every timed run, alternating order per rep.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from namegraph_collections_spark.queries import REGISTRY
from namegraph_collections_spark.queries import similarity as S
from namegraph_collections_spark.queries import similarity_pq as P
from namegraph_collections_spark.session import get_spark


# ---- legacy copies (r12 code, verbatim semantics) ----
def legacy_centroids_of(assigned):
    dims = assigned.select(
        "cluster", F.posexplode("embedding").alias("pos0", "v")
    ).select(
        "cluster", "pos0",
        F.floor(F.col("v").cast("double") * F.lit(float(S.QUANT))).alias("val"),
    )
    return (
        dims.groupBy("cluster", "pos0")
        .agg((F.sum("val").cast("double") / (F.count(F.lit(1)) * F.lit(S.QUANT))).alias("m"))
        .groupBy("cluster")
        .agg(F.transform(F.array_sort(F.collect_list(F.struct("pos0", "m"))), lambda s: s["m"]).alias("centroid"))
    )


def legacy_assign_to(emb, cents):
    from namegraph_collections_spark.functions.det_round import round6_det
    scored_rows = (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "embedding", "cluster",
            round6_det(S._dot(F.col("embedding"), F.col("centroid"))).alias("d"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("d").desc(), F.col("cluster").asc())
    return (
        scored_rows.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cluster")
    )


def legacy_ivf_topk_from(emb, assigned, cents):
    from namegraph_collections_spark.functions.det_round import round6_det
    final_cents = cents.persist()
    lists = assigned
    q = emb.filter(F.col("vec_id") < S.N_QUERY_VECS).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    w_probe = Window.partitionBy("q_id").orderBy(
        round6_det(S._dot(F.col("q_emb"), F.col("centroid"))).desc(), F.col("cluster").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(final_cents))
        .withColumn("prnk", F.row_number().over(w_probe))
        .filter(F.col("prnk") <= S.N_PROBE)
        .select("q_id", "q_emb", "cluster")
    )
    cand = lists.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb"), "cluster"
    )
    cos = S._dot(F.col("q_emb"), F.col("c_emb")) / (
        F.sqrt(S._dot(F.col("q_emb"), F.col("q_emb"))) * F.sqrt(S._dot(F.col("c_emb"), F.col("c_emb")))
    )
    scored = (
        cand.join(F.broadcast(probes), "cluster")
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            "q_id", "c_id", F.col("cluster").alias("c_cluster"),
            round6_det(cos).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= S.TOP_K)
        .select("q_id", "c_id", "c_cluster", "cosine", "rnk")
    )


def legacy_adc_scored(spark, sf_dir):
    from namegraph_collections_spark.queries.registry import spread, tbl
    emb = spread(tbl(spark, sf_dir, "embeddings"), "vec_id")
    normed = emb.select(
        "vec_id", F.col("embedding").alias("e"),
        F.sqrt(S._dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    ).select(
        "vec_id",
        F.transform(F.col("e"), lambda x: x.cast("double") / F.col("nrm")).alias("nemb"),
    )
    sub = normed.select(
        "vec_id", "nemb",
        F.explode(F.array(*[F.lit(m) for m in range(P.PQ_M)])).alias("m"),
    ).select(
        "vec_id", F.col("m").cast("int").alias("m"),
        F.expr(f"slice(nemb, m * {P.PQ_SUBDIM} + 1, {P.PQ_SUBDIM})").alias("subvec"),
    )

    def centroids_of(assigned):
        dims = assigned.select(
            "m", "code", F.posexplode("subvec").alias("pos0", "v")
        ).select(
            "m", "code", "pos0",
            F.floor(F.col("v").cast("double") * F.lit(float(S.QUANT))).alias("val"),
        )
        return (
            dims.groupBy("m", "code", "pos0")
            .agg((F.sum("val").cast("double") / (F.count(F.lit(1)) * F.lit(S.QUANT))).alias("mean"))
            .groupBy("m", "code")
            .agg(F.transform(F.array_sort(F.collect_list(F.struct("pos0", "mean"))), lambda s: s["mean"]).alias("centroid"))
        )

    def assign_to(cents):
        scored_rows = sub.join(F.broadcast(cents), "m").select(
            "vec_id", "m", "subvec", "code",
            P._sub_l2_int(F.col("subvec"), F.col("centroid")).alias("d_int"),
        )
        w = Window.partitionBy("vec_id", "m").orderBy(F.col("d_int").asc(), F.col("code").asc())
        return (
            scored_rows.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "m", "subvec", "code")
        )

    assigned = sub.withColumn("code", (F.col("vec_id") % P.PQ_K).cast("int"))
    cents = None
    for _ in range(P.PQ_ROUNDS):
        cents = centroids_of(assigned)
        assigned = assign_to(cents)
    final_cents = cents.persist()
    codes = assigned.select("vec_id", "m", "code")
    qsub = sub.filter(F.col("vec_id") < P.N_QUERY_VECS).select(
        F.col("vec_id").alias("q_id"), "m", "subvec"
    )
    dtab = qsub.join(F.broadcast(final_cents), "m").select(
        "q_id", "m", "code",
        P._sub_l2_int(F.col("subvec"), F.col("centroid")).alias("d_int"),
    )
    return (
        codes.join(F.broadcast(dtab), ["m", "code"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", F.col("vec_id").alias("c_id"))
        .agg(F.sum("d_int").cast("long").alias("dist_int"))
    )


NEW = (S.kmeans_centroids_of, S.kmeans_assign_to, S.ivf_topk_from, P._adc_scored)
OLD = (legacy_centroids_of, legacy_assign_to, legacy_ivf_topk_from, legacy_adc_scored)


def set_mode(m: str) -> None:
    src = OLD if m == "A" else NEW
    S.kmeans_centroids_of, S.kmeans_assign_to, S.ivf_topk_from = src[0], src[1], src[2]
    P._adc_scored = src[3]
    # batteries.py imported ivf_topk_from by name at module load
    import namegraph_collections_spark.queries.batteries as B
    B.ivf_topk_from = src[2]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf = "/root/testdata/sf0.1"
    qs = [
        "ivf_topk", "pq_adc_topk", "pq_rerank_topk",
        "ann_recall_eval", "similarity_battery", "semdedup_keep_list",
    ]
    spark = get_spark("ab-kmeans-shape")
    spark.read.parquet(f"{sf}/embeddings.parquet").count()

    for name in qs:
        rows = {}
        for m in ("A", "B"):
            set_mode(m)
            spark.catalog.clearCache()
            rows[m] = sorted(tuple(map(repr, r)) for r in REGISTRY[name].fn(spark, sf).collect())
        print(f"verify {name}: {'BIT-IDENTICAL' if rows['A'] == rows['B'] else 'MISMATCH'}"
              f" ({len(rows['A'])} rows)", flush=True)
        if rows["A"] != rows["B"]:
            sys.exit(1)

    t = {q: {"A": [], "B": []} for q in qs}
    for rep in range(reps):
        order = ("A", "B") if rep % 2 == 0 else ("B", "A")
        for name in qs:
            for m in order:
                set_mode(m)
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"{name}[{m}] rep{rep}")
                t0 = time.time()
                REGISTRY[name].fn(spark, sf).write.format("noop").mode("overwrite").save()
                t[name][m].append(time.time() - t0)
    set_mode("B")
    print(f"\n== paired A/B, {reps} reps, sf0.1 (A=legacy window shapes, B=map-only) ==")
    for name in qs:
        a, b = sorted(t[name]["A"]), sorted(t[name]["B"])
        wins = sum(1 for x, y in zip(t[name]["A"], t[name]["B"]) if y < x)
        print(f"{name:24s} A={a[len(a)//2]:6.2f}s B={b[len(b)//2]:6.2f}s "
              f"speedup={a[len(a)//2]/b[len(b)//2]:4.2f}x wins={wins}/{reps} "
              f"rawA={[round(x,2) for x in t[name]['A']]} rawB={[round(x,2) for x in t[name]['B']]}")


if __name__ == "__main__":
    main()
