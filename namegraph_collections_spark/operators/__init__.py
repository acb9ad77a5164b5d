from namegraph_collections_spark.operators.closure import transitive_closure  # noqa: F401
from namegraph_collections_spark.operators.cdc import snapshot_diff  # noqa: F401
