"""dynamo2es_lambda_spark — PySpark-native full-text index + BM25 engine.

A from-scratch re-expression of AntonBazhal/dynamo2es-lambda's capabilities
(document field-mapping / id / routing / versioning pipeline feeding a search
index) as an idiomatic Spark engine: the pipeline is a DataFrame transform
stage, the search index is a distributed inverted index (delta+varbyte block
postings, block-max metadata) persisted as partitioned parquet tables, and
queries run top-k BM25 with block-max WAND pruning.

See SURVEY.md for the operator-by-operator mapping to the reference.
"""

from .config import IndexerConfig
from .errors import FieldNotFoundError, UnknownEventNameError, ValidationError

__all__ = [
    "IndexerConfig",
    "ValidationError",
    "FieldNotFoundError",
    "UnknownEventNameError",
]
