from namegraph_collections_spark.functions.curation import (  # noqa: F401
    curate_member,
    curate_name_col,
    strip_eth_col,
)
from namegraph_collections_spark.functions.namehash import ens_namehash  # noqa: F401
from namegraph_collections_spark.functions.normalize import DisallowedLabel, force_normalize  # noqa: F401
