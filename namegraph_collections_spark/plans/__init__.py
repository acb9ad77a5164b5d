from namegraph_collections_spark.plans.collections_core import (  # noqa: F401
    build_allowlists,
    extract_collections,
    group_members,
    link_members,
    validate_members,
)
from namegraph_collections_spark.plans.enrich_merge import (  # noqa: F401
    enrich_all_info,
    merge_lists_and_categories,
)
from namegraph_collections_spark.plans.doc_factory import build_documents  # noqa: F401
