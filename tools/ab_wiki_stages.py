#!/usr/bin/env python3
"""Paired A/B of wiki mid-stage materialization strategies (VERDICT
r12 item 5): the two multiply-referenced mid-stages (entities,
validated) as lazy localCheckpoint (current) vs persist(MEMORY_ONLY)
vs eager localCheckpoint, with the fixture checkpoints (cust/triples/
wikimapper) kept in every variant (the r12 full-persist-swap guard).

Times wiki_all_info end-to-end (noop). Verifies identical rows first.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame
from pyspark import StorageLevel

from namegraph_collections_spark.queries import REGISTRY
from namegraph_collections_spark.queries import wiki_slice as W
from namegraph_collections_spark.plans.collections_core import (
    build_allowlists,
    extract_collections,
    group_members,
    link_members,
    subclass_reachability,
    validate_members,
)
from namegraph_collections_spark.plans.enrich_merge import (
    enrich_all_info,
    merge_lists_and_categories,
)
from namegraph_collections_spark.sources.ntriples import assemble_entities
from namegraph_collections_spark.session import get_spark


def make_variant(ent_how: str, val_how: str):
    def mat(df: DataFrame, how: str) -> DataFrame:
        if how == "lc":
            return df.localCheckpoint(eager=False)
        if how == "lce":
            return df.localCheckpoint(eager=True)
        if how == "persist":
            return df.persist(StorageLevel.MEMORY_ONLY)
        if how == "plain":
            return df
        raise ValueError(how)

    def validated_variant(spark, sf_dir):
        triples, wikimapper, categorylinks, pagelinks, qrank, domains, scores = W._fixture(
            spark, sf_dir
        )
        entities = mat(assemble_entities(triples), ent_how)
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
        validated = mat(
            validate_members(grouped, entities, wikimapper, reachable), val_how
        )
        return validated, entities, wikimapper, qrank, domains, scores

    def all_info(spark, sf_dir):
        validated, entities, wikimapper, qrank, domains, scores = validated_variant(spark, sf_dir)
        ai = enrich_all_info(validated, entities, wikimapper, qrank, domains, scores)
        return merge_lists_and_categories(ai, entities)

    return all_info


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf = "/root/testdata/sf0.1"
    spark = get_spark("ab-wiki")
    spark.read.parquet(f"{sf}/customer.parquet").count()

    variants = {
        "cur(lc,lc)": make_variant("lc", "lc"),
        "persist,lc": make_variant("persist", "lc"),
        "lc,persist": make_variant("lc", "persist"),
        "persist2x": make_variant("persist", "persist"),
        "plain,lc": make_variant("plain", "lc"),
    }

    base = None
    for name, fn in variants.items():
        spark.catalog.clearCache()
        rows = sorted(tuple(map(repr, r)) for r in fn(spark, sf).collect())
        if base is None:
            base = rows
        print(f"verify {name}: {'IDENTICAL' if rows == base else 'MISMATCH'} ({len(rows)})", flush=True)
        if rows != base:
            sys.exit(1)

    t = {m: [] for m in variants}
    order = list(variants)
    for rep in range(reps):
        seq = order if rep % 2 == 0 else order[::-1]
        for m in seq:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"wiki[{m}] rep{rep}")
            t0 = time.time()
            variants[m](spark, sf).write.format("noop").mode("overwrite").save()
            t[m].append(time.time() - t0)
    for m in order:
        ts = sorted(t[m])
        print(f"{m:12s} med={ts[len(ts)//2]:6.2f} raw={[round(x,2) for x in t[m]]}")


if __name__ == "__main__":
    main()
