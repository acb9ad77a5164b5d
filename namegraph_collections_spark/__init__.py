"""namegraph_collections_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference system ``namehash/namegraph-collections``
(see SURVEY.md): N-Triples/SQL-dump ingestion, entity assembly,
collection extraction/validation/enrichment/merging, CDC snapshot
diffing, and batch search scoring — plus the large-scale training-data
operators (dedup, similarity search, text analysis, multimodal
plumbing) a 100 TB pipeline needs.

Design stance (SURVEY.md §7): composable DataFrame→DataFrame operators
over explicit schemas; Catalyst does the optimizing; pandas UDFs only
where a real library/algorithm lives (normalization, keccak, tokenizer
models); one authored iterative algorithm (transitive closure).
"""

__version__ = "0.1.0"

from namegraph_collections_spark.session import get_spark  # noqa: F401
