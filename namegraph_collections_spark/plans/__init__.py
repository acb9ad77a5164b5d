from pyspark.sql import DataFrame

from namegraph_collections_spark.plans.collections_core import (  # noqa: F401
    build_allowlists,
    extract_collections,
    group_members,
    link_members,
    subclass_reachability,
    validate_members,
)
from namegraph_collections_spark.plans.custom_collections import (  # noqa: F401
    custom_update_operations,
    process_custom_collections,
)
from namegraph_collections_spark.plans.doc_factory import build_documents  # noqa: F401
from namegraph_collections_spark.plans.enrich_merge import (  # noqa: F401
    enrich_all_info,
    merge_lists_and_categories,
)
from namegraph_collections_spark.plans.letter_merge import (  # noqa: F401
    letter_range_normalize,
    remove_duplicate_names,
)


def run_wikipedia_pipeline(
    entities: DataFrame,
    wikimapper: DataFrame,
    categorylinks: DataFrame,
    pagelinks: DataFrame,
    qrank: DataFrame,
    domains: DataFrame,
    scores: DataFrame,
    **doc_kwargs,
) -> DataFrame:
    """The whole reference pipeline as ONE lazy Spark plan (SURVEY
    §3.1): entities → collections → validated members → all-info →
    merge → letter-range merge → name dedup → final documents.

    Each stage is a pure DataFrame→DataFrame function. The chain
    checkpoints at the reference's own S3-backup points (validated /
    all-info / merged — create_collections.py:762-778,
    create_merged.py:1054-1070): stages reference their input several
    times (member explode + collection joins + 3-way merge branches),
    so an unbroken lineage multiplies the plan tree combinatorially —
    truncating it at the four natural materialization points keeps
    Catalyst planning linear while production runs would write the
    same four datasets as Parquet anyway.
    """

    def ckpt(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=False)
    cats = extract_collections(entities, wikimapper, "category")
    lists = extract_collections(entities, wikimapper, "list")
    cat_members = link_members(
        categorylinks, None, build_allowlists(cats, wikimapper, "category"), wikimapper, "category"
    )
    list_members = link_members(
        None, pagelinks, build_allowlists(lists, wikimapper, "list"), wikimapper, "list"
    )
    reachable = subclass_reachability(entities)
    validated = ckpt(
        validate_members(
            group_members(cat_members, cats, "category"), entities, wikimapper, reachable
        ).unionByName(
            validate_members(
                group_members(list_members, lists, "list"), entities, wikimapper, reachable
            )
        )
    )
    all_info = ckpt(enrich_all_info(validated, entities, wikimapper, qrank, domains, scores))
    merged = ckpt(merge_lists_and_categories(all_info, entities))
    deduped = ckpt(remove_duplicate_names(letter_range_normalize(merged)))
    return build_documents(deduped, **doc_kwargs)
